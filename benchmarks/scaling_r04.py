"""SCALING_r04: refresh the scaling-efficiency story on the post-fix
production renderer (VERDICT r3 item 8).

Two measurements, assembled into SCALING_r04.json:

  * real chip (1 TPU via the axon tunnel): dependent-chain slope of the
    jnp renderer AND the shard_map'd Pallas fast path (the production
    path the round-4 quadrow atlas fix restored), via
    benchmarks.scaling.run.
  * virtual 8-device CPU mesh: mesh mechanics at n = 1, 2, 4, 8 for both
    renderers (wall-clock efficiency on shared host cores is meaningless
    — recorded for the machinery, as in SCALING_r02).

The virtual-mesh pass runs in a subprocess because the axon plugin
ignores JAX_PLATFORMS=cpu (the config knob must be set before backend
init, so it cannot share this process with the TPU pass).
"""
import json
import os
import subprocess
import sys
import time

import jax


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from schwarzschild_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from benchmarks.scaling import run

    dev = jax.devices()[0]
    assert dev.platform != "cpu", jax.devices()
    out = {"round": 4, "harness": "benchmarks/scaling.py "
                                  "(dependent-chain slope)",
           "real_chip": {"device": str(dev),
                         "workload": "256x256, max_steps=20, HollowDisk "
                                     "scene",
                         "note": "only ONE real chip exists in this "
                                 "environment; multi-chip efficiency is "
                                 "validated mechanically on the virtual "
                                 "mesh below and by dryrun_multichip "
                                 "(MULTICHIP_r04). 85%-at-4-hosts needs a "
                                 "real pod slice.",
                         "results": {}}}

    for renderer in ("jnp", "fast"):
        t0 = time.time()
        res = run([1], image_size=256, renderer=renderer)
        out["real_chip"]["results"][renderer] = {
            str(k): v for k, v in res.items()}
        log(f"real-chip {renderer}: {res[1]['rays_per_s']:.3g} rays/s "
            f"({time.time() - t0:.0f}s)")

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    virt = {"devices": "8 x xla_force_host_platform_device_count CPU fakes "
                       "(shared host cores -> wall-clock efficiency is "
                       "meaningless; recorded for mechanics only)",
            "workload": "128x128, max_steps=20", "results": {}}
    for renderer, extra in (("jnp", []), ("fast", ["--interpret"])):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-m", "benchmarks.scaling", "--cpu",
             "--sizes", "1,2,4,8", "--image-size", "128",
             "--renderer", renderer] + extra,
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=1800)
        assert p.returncode == 0, p.stderr[-2000:]
        # stdout is one multi-line JSON document (warnings go to stderr).
        virt["results"][renderer] = json.loads(
            p.stdout[p.stdout.index("{"):])
        log(f"virtual mesh {renderer} done ({time.time() - t0:.0f}s)")
    out["virtual_cpu_mesh"] = virt

    with open("/root/repo/SCALING_r04.json", "w") as f:
        json.dump(out, f, indent=2)
    log("wrote SCALING_r04.json")


if __name__ == "__main__":
    main()

"""Rays/s scaling-efficiency harness (BASELINE.md: >=85% at 1 chip, 1 host,
4 hosts) — pod-ready (VERDICT r4 item 7).

Measures per-frame device time of the sharded renderer on meshes of
increasing size and reports efficiency = (throughput_n / n) / throughput_1.
On the single-chip CI machine this runs on the virtual CPU mesh, which shares
one set of host cores — wall-clock efficiency there is meaningless, so the
harness reports it but the CI test only checks mechanics (and the
CORRECTNESS assertion below, which is meaningful everywhere).

Correctness is asserted inside the harness itself: for every mesh size
timed, one frame rendered on the n-device mesh must allclose the 1-device
render of the same workload (atol 1e-5 — the fast path's per-shard slot
compaction regroups f32 adds by ~1 ulp; the jnp path is bit-equal).

Workloads:
  * default ("toy"): hollow disk + solid background, max_steps=20 — fast
    mechanics check;
  * --production: the DEMO scene with real textures + 2k background through
    the fast path's quadrow atlas at 512x512, max_steps=100 — the shape the
    BASELINE efficiency row is about.  Also exercises pad-and-crop: 512 rows
    over a 3-row mesh does not divide evenly.

Pod usage (the one-command invocation README documents): run the SAME file
once per host with the coordinator flags —

  python benchmarks/scaling.py --production --sizes 4,16 \
      --coordinator host0:8476 --num-processes 4 --process-id $ID

jax.distributed.initialize runs first, meshes span the global device list,
and only process 0 prints.  Timing uses the dependent-chain-slope
methodology from bench.py (the tunnel's async queue makes naive timing
unreliable).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _workload(production: bool, size: int, max_steps: int):
    import schwarzschild_tpu as st
    from schwarzschild_tpu import configs

    cfg = st.RenderConfig(width=size, height=size, percent_black=-1.0,
                          checkpoint_every=0, max_steps=max_steps)
    if production:
        return dict(cfg=cfg, sc=configs.demo_scene(),
                    cam=configs.demo_camera(),
                    bg=configs.background_texture(),
                    tex=configs.demo_texture_stack())
    sc = st.build_scene([st.HollowDisk()], [st.Light(intensity=8.0)])
    return dict(cfg=cfg, sc=sc, cam=configs.demo_camera(),
                bg=st.solid_color_texture((0.2, 0.2, 0.4, 1.0)), tex=None)


def _sharded_renderer(n_devices, wl, renderer, interpret):
    from schwarzschild_tpu.render import render
    from schwarzschild_tpu.sharding import (image_sharding, make_mesh,
                                            make_sharded_render)

    mesh = make_mesh(jax.devices()[:n_devices], shape=(n_devices, 1))
    out_sh = image_sharding(mesh)
    if renderer == "fast":
        fn = make_sharded_render(mesh, wl["cfg"], renderer="fast",
                                 interpret=interpret)

        def render_any(r):
            return fn(wl["sc"], wl["cam"], wl["bg"], wl["tex"], r)
    else:
        def render_any(r):
            return render(wl["sc"], wl["cam"], wl["cfg"], wl["bg"],
                          wl["tex"], r)

    return render_any, out_sh


def measure_mesh(n_devices: int, size: int = 256, chains=(4, 12),
                 renderer: str = "jnp", interpret: bool = False,
                 production: bool = False, max_steps: int = None,
                 reference_frame=None) -> dict:
    """Seconds per frame on an n-device mesh (slope of dependent chains),
    plus the correctness check: one frame must allclose ``reference_frame``
    (the 1-device render) when given.

    ``renderer="fast"`` measures the shard_map'd Pallas path (the production
    fast path); ``interpret=True`` for CPU fakes."""
    if max_steps is None:
        max_steps = 100 if production else 20
    wl = _workload(production, size, max_steps)
    render_any, out_sh = _sharded_renderer(n_devices, wl, renderer,
                                           interpret)

    frame = np.asarray(jax.device_get(render_any(jnp.float32(1.0))))
    assert np.isfinite(frame).all(), f"non-finite pixels on {n_devices}-mesh"
    max_diff = None
    if reference_frame is not None:
        # Per-shard slot compaction regroups f32 adds (~1 ulp); jnp path is
        # bit-equal (tests/test_sharding.py pins that separately).
        max_diff = float(np.abs(frame - reference_frame).max())
        np.testing.assert_allclose(frame, reference_frame, atol=1e-5,
                                   err_msg=f"{n_devices}-mesh != 1-mesh")

    def mk(chain):
        @jax.jit
        def chained(r0):
            def body(r, _):
                img = jax.lax.with_sharding_constraint(render_any(r), out_sh)
                return r + 1e-7 * jnp.mean(img), None

            r, _ = jax.lax.scan(body, r0, None, length=chain)
            return r

        return chained

    fns = [mk(chain) for chain in chains]
    for f in fns:
        float(f(jnp.float32(1.0)))  # compile

    def time_chains(repeats):
        totals = []
        for f in fns:
            best = float("inf")
            for i in range(repeats):
                t0 = time.perf_counter()
                float(f(jnp.float32(1.0 + 1e-5 * i)))
                best = min(best, time.perf_counter() - t0)
            totals.append(best)
        return totals

    # The slope subtracts two noisy minima; on a loaded host (CI, shared
    # cores) the short chain's best can exceed the long chain's and the
    # slope goes negative.  Retry with more repeats, then fall back to the
    # long chain's absolute per-frame time (always positive, slightly
    # pessimistic: it includes one dispatch latency amortized over chain).
    s_per_frame = None
    for repeats in (3, 8):
        totals = time_chains(repeats)
        slope = (totals[1] - totals[0]) / (chains[1] - chains[0])
        if slope > 0:
            s_per_frame = slope
            break
    if s_per_frame is None:
        s_per_frame = totals[1] / chains[1]
    return dict(s_per_frame=s_per_frame, frame=frame, max_diff_vs_1=max_diff)


def run(sizes, image_size=256, renderer="jnp", interpret=False,
        production=False, max_steps=None):
    results = {}
    t1 = None
    ref = None
    for n in sizes:
        if n > len(jax.devices()):
            break
        m = measure_mesh(n, image_size, renderer=renderer,
                         interpret=interpret, production=production,
                         max_steps=max_steps, reference_frame=ref)
        t = m["s_per_frame"]
        if t1 is None:
            t1 = t
            ref = m["frame"]
        throughput = image_size * image_size / t
        eff = (throughput / n) / (image_size * image_size / t1)
        results[n] = {"s_per_frame": t, "rays_per_s": throughput,
                      "efficiency_vs_1": eff,
                      "max_diff_vs_1": m["max_diff_vs_1"]}
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--renderer", default="jnp", choices=["jnp", "fast"])
    ap.add_argument("--production", action="store_true",
                    help="demo scene + real textures + atlas at the "
                         "BASELINE shape (forces --renderer fast)")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpreter mode (CPU fakes)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                         "JAX_PLATFORMS=cpu; combine with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (multi-host pod slice)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--out", default=None,
                    help="also write the result JSON to this path "
                         "(e.g. /root/repo/SCALING_r05.json)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.num_processes and args.num_processes > 1:
        from schwarzschild_tpu.sharding import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    if args.production:
        args.renderer = "fast"
        if args.image_size == 256:
            args.image_size = 512
    sizes = [int(s) for s in args.sizes.split(",")]
    res = run(sizes, args.image_size, args.renderer, args.interpret,
              args.production, args.max_steps)
    if jax.process_index() == 0:
        print(json.dumps(res, indent=2))
        if args.out:
            meta = dict(results={str(k): v for k, v in res.items()},
                        image_size=args.image_size,
                        renderer=args.renderer,
                        production=args.production,
                        device=str(jax.devices()[0]),
                        n_processes=jax.process_count())
            with open(args.out, "w") as f:
                json.dump(meta, f, indent=2)

"""Rays/s scaling-efficiency harness (BASELINE.md: >=85% at 1 chip, 1 host,
4 hosts).

Measures per-frame device time of the sharded renderer on meshes of
increasing size and reports efficiency = (throughput_n / n) / throughput_1.
On the single-chip CI machine this runs on the virtual CPU mesh, which shares
one set of host cores — wall-clock efficiency there is meaningless, so the
harness reports it but the CI test only checks mechanics; on a real pod slice
run:  python -m benchmarks.scaling --sizes 1,2,4,8

Timing uses the dependent-chain-slope methodology from bench.py (the tunnel's
async queue makes naive timing unreliable).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def measure_mesh(n_devices: int, size: int = 256, chains=(4, 12),
                 renderer: str = "jnp", interpret: bool = False) -> float:
    """Seconds per frame on an n-device mesh (slope of dependent chains).

    ``renderer="fast"`` measures the shard_map'd Pallas path (the production
    fast path); ``interpret=True`` for CPU fakes."""
    import schwarzschild_tpu as st
    from schwarzschild_tpu import configs
    from schwarzschild_tpu.render import render
    from schwarzschild_tpu.sharding import image_sharding, make_mesh, replicated
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = st.RenderConfig(width=size, height=size, percent_black=-1.0,
                          checkpoint_every=0, max_steps=20)
    sc = st.build_scene([st.HollowDisk()], [st.Light(intensity=8.0)])
    cam = configs.demo_camera()
    bg = st.solid_color_texture((0.2, 0.2, 0.4, 1.0))

    mesh = make_mesh(jax.devices()[:n_devices], shape=(n_devices, 1))
    out_sh = image_sharding(mesh)
    rep = replicated(mesh)

    if renderer == "fast":
        # The production tile-local path: the WHOLE fast pipeline (kernel
        # launch + compacted slot passes + background) rides ONE shard_map
        # per device (sharding.make_sharded_render).
        from schwarzschild_tpu.sharding import make_sharded_render

        sharded_fast = make_sharded_render(mesh, cfg, renderer="fast",
                                           interpret=interpret)

        def render_any(r):
            return sharded_fast(sc, cam, bg, None, r)
    else:
        def render_any(r):
            return render(sc, cam, cfg, bg, None, r)

    def mk(chain):
        @jax.jit
        def chained(r0):
            def body(r, _):
                img = jax.lax.with_sharding_constraint(render_any(r), out_sh)
                return r + 1e-7 * jnp.mean(img), None

            r, _ = jax.lax.scan(body, r0, None, length=chain)
            return r

        return chained

    totals = []
    for chain in chains:
        f = mk(chain)
        float(f(jnp.float32(1.0)))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-5 * i)))
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    return (totals[1] - totals[0]) / (chains[1] - chains[0])


def run(sizes, image_size=256, renderer="jnp", interpret=False):
    results = {}
    t1 = None
    for n in sizes:
        if n > len(jax.devices()):
            break
        t = measure_mesh(n, image_size, renderer=renderer, interpret=interpret)
        if t1 is None:
            t1 = t
        throughput = image_size * image_size / t
        eff = (throughput / n) / (image_size * image_size / t1)
        results[n] = {"s_per_frame": t, "rays_per_s": throughput,
                      "efficiency_vs_1": eff}
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--renderer", default="jnp", choices=["jnp", "fast"])
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpreter mode (CPU fakes)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                         "JAX_PLATFORMS=cpu; combine with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    sizes = [int(s) for s in args.sizes.split(",")]
    print(json.dumps(run(sizes, args.image_size, args.renderer,
                         args.interpret), indent=2))

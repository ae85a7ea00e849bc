"""Benchmark: geodesic RK4 step throughput per chip (BASELINE.md).

Workload: BASELINE config 2 — 512x512 curved Schwarzschild march (horizon +
sky, fixed camera, every lane marching the full 100 steps) on the Pallas
ray-march kernel.

Methodology: the host<->TPU tunnel in this environment has ~40 ms round-trip
latency and an async dispatch queue whose block_until_ready can return early,
so naive per-call timing is meaningless.  We time two jitted scans of
data-dependent marches (chain lengths 10 and 40 — each iteration's r_s
depends on the previous march's reduced output, so nothing can be elided or
overlapped) with a host scalar fetch as the barrier, and report the SLOPE:
(T40 - T10) / 30 = pure device time per march.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 1e9 (the >=1e9 steps/s/chip target).
"""

import json
import time

import jax
import jax.numpy as jnp


def _make_chain(march_bh, cfg, chain, block_h, block_w):
    @jax.jit
    def chained(origin, direction, active, r0):
        def body(r, _):
            d, s = march_bh(origin, direction, active, r, cfg,
                            block_h=block_h, block_w=block_w)
            return r + 1e-6 * jnp.mean(s) + 1e-9 * jnp.mean(d[..., 0]), None

        r, _ = jax.lax.scan(body, r0, None, length=chain)
        return r

    return chained


def main():
    import schwarzschild_tpu as st
    from schwarzschild_tpu import camera as cm
    from schwarzschild_tpu import configs, geometry as geo, physics
    from schwarzschild_tpu.kernel import march_bh

    dev = jax.devices()[0]
    size = 512
    cfg = st.RenderConfig(width=size, height=size, percent_black=-1.0,
                          checkpoint_every=0)
    cam = configs.demo_camera()

    u_ndc, v_ndc = cm.pixel_grid(size, size)
    origin, direction = cm.generate_rays(cam, u_ndc, v_ndc, size, size)
    active = ~physics.is_radial(direction, geo.safe_normalize(origin))

    totals = {}
    for chain in (10, 40):
        fn = _make_chain(march_bh, cfg, chain, 16, 256)
        float(fn(origin, direction, active, jnp.float32(1.0)))  # compile
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(fn(origin, direction, active, jnp.float32(1.0 + 1e-5 * i)))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best

    per_march = (totals[40] - totals[10]) / 30.0
    steps_per_frame = size * size * cfg.max_steps
    steps_per_s = steps_per_frame / per_march

    print(json.dumps({
        "metric": "geodesic_rk4_steps_per_s_per_chip",
        "value": steps_per_s,
        "unit": "steps/s/chip",
        "vs_baseline": steps_per_s / 1e9,
        "march_ms_per_frame": per_march * 1e3,
        "rays_per_s": size * size / per_march,
        "chain_totals_ms": {str(k): v * 1e3 for k, v in totals.items()},
        "config": f"{size}x{size} curved horizon+sky, max_steps=100, "
                  "all lanes, pallas kernel, dependent-chain slope",
        "device": str(dev),
        "n_chips": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()

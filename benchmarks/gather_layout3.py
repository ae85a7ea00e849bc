"""Round-4 gather-layout microbench: find a bilinear-fetch form that is BOTH
fast and tile-padding-free (VERDICT r3 item 1).

Context: the r02 pair8 form — operand (L, Hp+1, Wp, 8), slice (1, 2, 1, 8) —
measured 3.97 ms at 262k indices but its trailing dim of 8 is lane-padded to
128 by the TPU (8, 128) tiling: 16x HBM blowup (225 MB atlas -> 3.52 GB ->
chip OOM).  The r03 snapshot flattened the pair into the minor axis —
(L, Hp+1, Wp*8), slice (1, 2, 8) at dynamic minor start x0*8 — which dodged
the padding but was never microbenchmarked; the driver's BENCH_r03 recorded
the frame at 837 ms (was 40), implicating exactly this form.

Candidates (all fetch a full 2x2x4 bilinear footprint per index, 262k
indices, 2048x1024x4 f32 source = 32 MB raw):

  r03_flat8   (L, H+1, W*8)      slice (1,2,8) @ minor x0*8   [mem 2x raw]
  pair8       (L, H+1, W, 8)     slice (1,2,1,8)              [mem 32x raw!]
  quadrow     (G, 128)           slice (1,128), g=y*gpr+(x>>3),
                                 one-hot(8) quad select       [mem 4x raw]
  quadrow3    (1, G, 128)        slice (1,1,128) — layered-form hedge
  colmajor    (G, 128)           slice (2,128), g=(x>>4)*(H+1)+y,
                                 one-hot(16) pair select      [mem 2x raw]
  layeredy    (GX, H+1, 128)     slice (1,2,128), one-hot(16) [mem 2x raw,
                                 middle dim pads to max layer H]
  quadrow_bf16 / colmajor_bf16   dtype ablation of the winners

Each form's math is validated against a plain jnp bilinear reference before
timing (a fast-but-wrong layout is worthless).
"""

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


H, W = 1024, 2048
N = 512 * 512


def fetch_coords(s, n=N):
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


def lerp(c00, c10, c01, c11, fx, fy):
    top = c00 + fx * (c10 - c00)
    bot = c01 + fx * (c11 - c01)
    return top + fy * (bot - top)


def make_forms(data_np):
    """Build every candidate operand + fetch fn. data_np: (H, W, 4) f32."""
    data = jnp.asarray(data_np)
    xp_np = np.roll(data_np, -1, axis=1)
    yp_np = np.roll(data_np, -1, axis=0)
    xyp_np = np.roll(xp_np, -1, axis=0)
    forms = {}

    # --- reference (four dynamic_index gathers via plain indexing) ---
    def ref_fetch(x0i, y0i, fx, fy):
        x1i = jnp.mod(x0i + 1, W)
        y1i = jnp.mod(y0i + 1, H)
        return lerp(data[y0i, x0i], data[y0i, x1i],
                    data[y1i, x0i], data[y1i, x1i], fx, fy)

    forms["ref4"] = ref_fetch

    # --- r03_flat8: (1, H+1, W*8), minor-start gather ---
    pair_np = np.concatenate([data_np, xp_np], axis=-1).reshape(H, W * 8)
    flat8 = jnp.asarray(np.concatenate([pair_np, pair_np[:1]], 0)[None])

    def flat8_fetch(x0i, y0i, fx, fy):
        idx = jnp.stack([jnp.zeros_like(y0i), y0i, x0i * 8], -1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        c = jax.lax.gather(
            flat8, idx, dn, slice_sizes=(1, 2, 8),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
        ).reshape(-1, 2, 2, 4)
        return lerp(c[:, 0, 0], c[:, 0, 1], c[:, 1, 0], c[:, 1, 1], fx, fy)

    forms["r03_flat8"] = flat8_fetch

    # --- pair8 (r02 fast, 16x padded) ---
    p8_np = np.concatenate([data_np, xp_np], axis=-1)
    pair8 = jnp.asarray(np.concatenate([p8_np, p8_np[:1]], 0)[None])

    def pair8_fetch(x0i, y0i, fx, fy):
        idx = jnp.stack([jnp.zeros_like(y0i), y0i, x0i], -1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        c = jax.lax.gather(
            pair8, idx, dn, slice_sizes=(1, 2, 1, 8),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
        ).reshape(-1, 2, 2, 4)
        return lerp(c[:, 0, 0], c[:, 0, 1], c[:, 1, 0], c[:, 1, 1], fx, fy)

    forms["pair8"] = pair8_fetch

    # --- quadrow: (G, 128) of 8 quads [c00 c10 c01 c11] ---
    # quad(y, x) = 16 floats; gpr = W/8 groups per row; g = y*gpr + (x>>3).
    quads_np = np.concatenate([data_np, xp_np, yp_np, xyp_np], axis=-1)
    gpr = W // 8
    quad_sheet_np = quads_np.reshape(H * gpr, 128)

    def make_quad_fetch(sheet, rank3=False, odt=jnp.float32):
        sheet = sheet.astype(odt)
        if rank3:
            sheet = sheet[None]

        def fetch(x0i, y0i, fx, fy):
            g = y0i * gpr + (x0i >> 3)
            q = x0i & 7
            if rank3:
                idx = jnp.stack([jnp.zeros_like(g), g], -1)
                dn = jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0, 1),
                    start_index_map=(0, 1))
                rows = jax.lax.gather(
                    sheet, idx, dn, slice_sizes=(1, 1, 128),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            else:
                dn = jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,))
                rows = jax.lax.gather(
                    sheet, g[:, None], dn, slice_sizes=(1, 128),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            rows = rows.astype(jnp.float32).reshape(-1, 8, 16)
            onehot = (q[:, None] == jnp.arange(8, dtype=jnp.int32)[None]
                      ).astype(jnp.float32)
            quad = jnp.einsum("nqf,nq->nf", rows, onehot).reshape(-1, 4, 4)
            return lerp(quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3],
                        fx, fy)

        return fetch

    forms["quadrow"] = make_quad_fetch(jnp.asarray(quad_sheet_np))
    forms["quadrow3"] = make_quad_fetch(jnp.asarray(quad_sheet_np),
                                        rank3=True)
    forms["quadrow_bf16"] = make_quad_fetch(jnp.asarray(quad_sheet_np),
                                            odt=jnp.bfloat16)

    # --- colmajor: (G, 128) of 16 x-pairs, column-major strips ---
    # strip xg holds rows 0..H (incl. wrap row) of pairs x in [16xg, 16xg+16);
    # g = xg*(H+1) + y; fetch slice (2, 128) covers rows y, y+1.
    pairs_np = np.concatenate([data_np, xp_np], axis=-1)  # (H, W, 8)
    pairs_np = np.concatenate([pairs_np, pairs_np[:1]], 0)  # (H+1, W, 8)
    xg_n = W // 16
    # (H+1, xg, 16, 8) -> (xg, H+1, 128)
    cm_np = pairs_np.reshape(H + 1, xg_n, 16 * 8).transpose(1, 0, 2)
    cm_sheet_np = cm_np.reshape(xg_n * (H + 1), 128)

    def make_cm_fetch(sheet, odt=jnp.float32):
        sheet = sheet.astype(odt)

        def fetch(x0i, y0i, fx, fy):
            g = (x0i >> 4) * (H + 1) + y0i
            q = x0i & 15
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,))
            rows = jax.lax.gather(
                sheet, g[:, None], dn, slice_sizes=(2, 128),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            rows = rows.astype(jnp.float32).reshape(-1, 2, 16, 8)
            onehot = (q[:, None] == jnp.arange(16, dtype=jnp.int32)[None]
                      ).astype(jnp.float32)
            pair = jnp.einsum("nyqf,nq->nyf", rows, onehot)
            return lerp(pair[:, 0, :4], pair[:, 0, 4:],
                        pair[:, 1, :4], pair[:, 1, 4:], fx, fy)

        return fetch

    forms["colmajor"] = make_cm_fetch(jnp.asarray(cm_sheet_np))
    forms["colmajor_bf16"] = make_cm_fetch(jnp.asarray(cm_sheet_np),
                                           odt=jnp.bfloat16)

    # --- layeredy: (GX, H+1, 128), slice (1, 2, 128) — 3d layered form ---
    ly = jnp.asarray(cm_np)  # (xg, H+1, 128)

    def ly_fetch(x0i, y0i, fx, fy):
        q = x0i & 15
        idx = jnp.stack([x0i >> 4, y0i], -1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        rows = jax.lax.gather(
            ly, idx, dn, slice_sizes=(1, 2, 128),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        rows = rows.reshape(-1, 2, 16, 8)
        onehot = (q[:, None] == jnp.arange(16, dtype=jnp.int32)[None]
                  ).astype(jnp.float32)
        pair = jnp.einsum("nyqf,nq->nyf", rows, onehot)
        return lerp(pair[:, 0, :4], pair[:, 0, 4:],
                    pair[:, 1, :4], pair[:, 1, 4:], fx, fy)

    forms["layeredy"] = ly_fetch
    return forms


def main():
    assert jax.devices()[0].platform != "cpu"
    rng = np.random.default_rng(0)
    data_np = rng.random((H, W, 4), np.float32)
    forms = make_forms(data_np)

    # Correctness gate: every form must match ref4 on 4096 samples.
    # Compiled per-form (one jit over all 10 operands blew the remote-compile
    # request-size limit in this environment).
    def eval_one(f):
        @jax.jit
        def g(s):
            return f(*fetch_coords(s, 4096))

        return np.asarray(g(jnp.float32(0.37)))

    ref = eval_one(forms["ref4"])
    for k, f in forms.items():
        v = eval_one(f)
        err = float(np.max(np.abs(v - ref)))
        tol = 2e-2 if "bf16" in k else 1e-5
        assert err < tol, f"{k} WRONG: max err {err}"
        print(f"{k}: max_err={err:.2e} ok", flush=True)

    res = {}
    for k, f in forms.items():
        if k == "ref4":
            continue

        def body(s, f=f):
            return 1e-6 * jnp.mean(f(*fetch_coords(s)))

        res[f"{k}_ms"] = time_chain(body)
        print(k, res[f"{k}_ms"], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""Microbench: bilinear texture-fetch layouts on the real chip.

The end-to-end frame is gather-bound (docs/tpu_cost_model.md section 1):
a 512^2 bilinear pass = 262k per-index fetches at ~25 ns each.  Round 3
restructures the shading pipeline around whichever fetch form is fastest,
so measure the candidates head-to-head (dependent-chain slope, bench.py
methodology):

  * patch_f32    — the round-2 production form: layered (1, 2, 2, 4) slice
                   per index from the wrap-padded (1, H+1, W+1, 4) texture.
  * row16_f32    — PRE-PATCHIZED rows: a (H, W, 16) buffer whose row (y, x)
                   holds the whole 2x2x4 footprint contiguously, fetched as
                   ONE (1, 1, 16) slice per index.  Costs 4x texel memory,
                   HBM has plenty.
  * row16_bf16   — same, bf16 texels (half the bytes per row).
  * patch_bf16   — layered patch form with bf16 texels.
  * corner4_f32  — plain (1, 1, 4) slice per index (a nearest fetch), the
                   per-index floor: 4 of these = the naive bilinear.

All forms compute the same bilinear lerp afterwards so the arithmetic is
held constant; only the fetch changes.  Prints one JSON dict of ms per
262k-lane pass.
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


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    H, W = 1024, 2048  # the 2k background shape
    N = 512 * 512
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.random((H, W, 4), np.float32))

    # Wrap-padded layered form (textures._wrap_pad equivalent).
    padded = jnp.concatenate([data, data[:1]], axis=0)
    padded = jnp.concatenate([padded, padded[:, :1]], axis=1)[None]

    # Pre-patchized rows: row (y, x) = [c00, c10, c01, c11] flattened.
    xp = jnp.roll(data, -1, axis=1)
    yp = jnp.roll(data, -1, axis=0)
    xyp = jnp.roll(xp, -1, axis=0)
    row16 = jnp.concatenate([data, xp, yp, xyp], axis=-1)[None]  # (1,H,W,16)

    def fetch_indices(s):
        # Data-dependent (so nothing hoists), uniform-ish coverage.
        i = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
        u = (i.astype(jnp.float32) * 0.61803398875 + s) % 1.0
        v = (i.astype(jnp.float32) * 0.7548776662 + 2.0 * s) % 1.0
        x = u * W - 0.5
        y = v * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        x0i = jnp.mod(x0.astype(jnp.int32), W)
        y0i = jnp.mod(y0.astype(jnp.int32), H)
        return x0i, y0i, fx, fy

    def lerp(c00, c10, c01, c11, fx, fy):
        top = c00 + fx * (c10 - c00)
        bot = c01 + fx * (c11 - c01)
        return top + fy * (bot - top)

    def patch_form(operand):
        def body(s):
            x0i, y0i, fx, fy = fetch_indices(s)
            idx = jnp.stack([jnp.zeros_like(y0i), y0i, x0i], -1)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2))
            c = jax.lax.gather(
                operand, idx, dnums, slice_sizes=(1, 2, 2, 4),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
            ).astype(jnp.float32)
            out = lerp(c[:, 0, 0], c[:, 0, 1], c[:, 1, 0], c[:, 1, 1], fx, fy)
            return 1e-6 * jnp.mean(out)

        return body

    def row16_form(operand):
        def body(s):
            x0i, y0i, fx, fy = fetch_indices(s)
            idx = jnp.stack([jnp.zeros_like(y0i), y0i, x0i], -1)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2))
            c = jax.lax.gather(
                operand, idx, dnums, slice_sizes=(1, 1, 1, 16),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
            ).astype(jnp.float32).reshape(-1, 4, 4)
            out = lerp(c[:, 0], c[:, 1], c[:, 2], c[:, 3], fx, fy)
            return 1e-6 * jnp.mean(out)

        return body

    def corner_form(operand):
        def body(s):
            x0i, y0i, fx, fy = fetch_indices(s)
            idx = jnp.stack([jnp.zeros_like(y0i), y0i, x0i], -1)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2))
            c = jax.lax.gather(
                operand, idx, dnums, slice_sizes=(1, 1, 1, 4),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
            ).astype(jnp.float32).reshape(-1, 4)
            return 1e-6 * jnp.mean(c * (1.0 + fx + fy))

        return body

    res = {}
    res["patch_f32_ms"] = time_chain(patch_form(padded))
    print("patch_f32", res["patch_f32_ms"], flush=True)
    res["row16_f32_ms"] = time_chain(row16_form(row16))
    print("row16_f32", res["row16_f32_ms"], flush=True)
    res["row16_bf16_ms"] = time_chain(row16_form(row16.astype(jnp.bfloat16)))
    print("row16_bf16", res["row16_bf16_ms"], flush=True)
    res["patch_bf16_ms"] = time_chain(patch_form(padded.astype(jnp.bfloat16)))
    print("patch_bf16", res["patch_bf16_ms"], flush=True)
    res["corner4_f32_ms"] = time_chain(corner_form(padded))
    print("corner4_f32", res["corner4_f32_ms"], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""End-to-end frame timing ablations on the real chip (dependent-chain
slope, see bench.py for the methodology): compaction on/off, slot count,
in-kernel opaque stop on/off, sparse noise-skip, the reference's default
interactive workload, and BASELINE config 3 at 1024x1024.

Prints one JSON dict of milliseconds per frame.  Used to decide the
production defaults documented in docs/tpu_cost_model.md (e.g. whether
compact_slots pays for itself at a given scene's overlap sparsity).

Run:  python -m benchmarks.frame_profile   (real chip; add --cpu to smoke-
test the mechanics on small shapes with the interpreter kernel).
"""

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp

import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.kernel_scene import render_fast


def time_chain(body_fn, chains=(4, 12)):
    """Milliseconds per frame = slope of dependent-chain totals."""
    def make(chain):
        @jax.jit
        def chained(r0):
            def body(r, _):
                return r + body_fn(r), None

            r, _ = jax.lax.scan(body, r0, None, length=chain)
            return r

        return chained

    totals = {}
    for chain in chains:
        fn = make(chain)
        float(fn(jnp.float32(1.0)))  # compile + warm
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(fn(jnp.float32(1.0 + 1e-5 * i)))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best
    lo, hi = min(chains), max(chains)
    return (totals[hi] - totals[lo]) / (hi - lo) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="mechanics smoke run: small shapes, interpret kernel")
    args = ap.parse_args()
    if args.cpu:
        # The axon plugin ignores JAX_PLATFORMS=cpu; this is the only way to
        # keep backend discovery off the (possibly hung) tunnel.
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu or args.cpu):
        raise SystemExit(f"not on TPU ({jax.devices()}); pass --cpu to smoke")
    size = 64 if args.cpu else 512
    kw_common = dict(overflow="ignore", interpret=not on_tpu)

    res = {}
    sc = configs.demo_scene()
    cam = configs.demo_camera()
    bg = configs.background_texture()
    tex = configs.demo_texture_stack()

    cfg = st.RenderConfig(width=size, height=size, percent_black=-1.0,
                          checkpoint_every=0)
    for label, kw in (
            ("demo", dict()),                      # compacted (default)
            ("demo_nocompact", dict(compact_slots=None)),
            ("demo_k2", dict(n_slots=2)),
            ("demo_nostop", dict(opaque_stop=False))):
        def full(r, kw=kw):
            return 1e-6 * jnp.mean(render_fast(sc, cam, cfg, bg, tex, r,
                                               **kw_common, **kw))

        res[f"{label}{size}_ms"] = time_chain(full)
        print(label, res[f"{label}{size}_ms"], flush=True)

    cfg_sp = dataclasses.replace(cfg, percent_black=0.75, noise_mode="hash")

    def sp(r):
        return 1e-6 * jnp.mean(render_fast(sc, cam, cfg_sp, bg, tex, r,
                                           **kw_common))

    res[f"demo{size}_sparse_ms"] = time_chain(sp)
    print("demo_sparse", res[f"demo{size}_sparse_ms"], flush=True)

    # Reference default interactive workload: 1280x720, 75% noise skip
    # (main.cpp:25-26,66).
    iw, ih = (128, 72) if args.cpu else (1280, 720)
    cfg_int = st.RenderConfig(width=iw, height=ih, percent_black=0.75,
                              noise_mode="hash", checkpoint_every=0)

    def inter(r):
        return 1e-6 * jnp.mean(render_fast(sc, cam, cfg_int, bg, tex, r,
                                           **kw_common))

    res["interactive_720p_ms"] = time_chain(inter)
    print("interactive_720p", res["interactive_720p_ms"], flush=True)

    # BASELINE config 3: full scene at 1024x1024.
    c3 = configs.config3_full_scene()
    s3 = 128 if args.cpu else 1024
    cfg3 = st.RenderConfig(width=s3, height=s3, percent_black=-1.0,
                           checkpoint_every=0)
    for label, kw in (("c3", dict()),
                      ("c3_nocompact", dict(compact_slots=None))):
        def full3(r, kw=kw):
            return 1e-6 * jnp.mean(render_fast(
                c3["scene"], c3["camera"], cfg3, c3["background"], c3["tex"],
                r, **kw_common, **kw))

        res[f"{label}_{s3}_ms"] = time_chain(full3, chains=(2, 6))
        print(label, res[f"{label}_{s3}_ms"], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""STILL4K_r04: BASELINE config 3 (textured planets) at 4K UHD on one chip.

The reference is locked to its 1280x720 window (main.cpp:25-26); this
framework renders production stills at arbitrary resolution — the fast
path handles 3840x2160 (8.3M rays) in one launch on a single v5e, and the
jnp twin covers the same frame via strip rendering (render(rows=...))
when its un-compacted march state would not fit HBM.

Writes STILL4K_r04.json + docs/still_4k_preview.png (960x540 downscale).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.compile_cache import enable_persistent_cache
from schwarzschild_tpu.kernel_scene import render_fast
from schwarzschild_tpu.textures import build_atlas_cached


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    enable_persistent_cache()
    assert jax.devices()[0].platform != "cpu", jax.devices()
    conf = configs.config3_full_scene()
    sc, cam, bg, tex = (conf["scene"], conf["camera"], conf["background"],
                        conf["tex"])
    W, H = 3840, 2160
    cfg = st.RenderConfig(width=W, height=H, percent_black=-1.0)
    atlas = build_atlas_cached(bg, tex)

    render = jax.jit(lambda r, a: render_fast(sc, cam, cfg, bg, tex, r,
                                              overflow="ignore", atlas=a))
    t0 = time.time()
    img = render(jnp.float32(1.0), atlas)
    img.block_until_ready()
    compile_s = time.time() - t0
    log(f"compiled + first frame in {compile_s:.1f}s")

    # Device time via the dependent-chain slope (bench.py methodology).
    def make_chain(n):
        @jax.jit
        def chain(r0, a):
            def body(r, _):
                im = render_fast(sc, cam, cfg, bg, tex, r, overflow="ignore",
                                 atlas=a)
                return r + 1e-6 * jnp.mean(im), None
            r, _ = jax.lax.scan(body, r0, None, length=n)
            return r
        return chain

    totals = {}
    for n in (2, 6):
        f = make_chain(n)
        float(f(jnp.float32(1.0), atlas))
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-5 * i), atlas))
            best = min(best, time.perf_counter() - t0)
        totals[n] = best
    dev_s = (totals[6] - totals[2]) / 4
    log(f"4K frame device time: {dev_s*1e3:.1f} ms "
        f"({W*H/dev_s/1e6:.1f} Mrays/s)")

    arr = np.asarray(img)
    from PIL import Image

    pil = Image.fromarray(
        (np.clip(arr[..., :3], 0, 1) * 255).astype(np.uint8))
    pil.resize((960, 540), Image.LANCZOS).save(
        "/root/repo/docs/still_4k_preview.png")

    out = {"round": 4, "device": str(jax.devices()[0]),
           "resolution": f"{W}x{H}", "config": "BASELINE config 3 "
           "(planets), percent_black=-1 (every ray marched), max_steps=100",
           "frame_device_ms": dev_s * 1e3,
           "mrays_per_s": W * H / dev_s / 1e6,
           "finite": bool(np.isfinite(arr).all()),
           "nonblack_frac": float((arr[..., :3].max(-1) > 0.01).mean())}
    with open("/root/repo/STILL4K_r04.json", "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote STILL4K_r04.json  {out['frame_device_ms']:.1f} ms/frame")


if __name__ == "__main__":
    main()

"""STILL4K: BASELINE config 3 (textured planets) at 4K UHD on one chip.

The reference is locked to its 1280x720 window (main.cpp:25-26); this
framework renders production stills at arbitrary resolution — the fast
path handles 3840x2160 (8.3M rays) in one launch on a single v5e, and the
jnp twin covers the same frame via strip rendering (render(rows=...))
when its un-compacted march state would not fit HBM.

Round 5 (VERDICT r4 item 8): the r04 artifact recorded 14.9 Mrays/s at 4K
vs 31.0 at 512^2 with no explanation.  This version decomposes the frame
into march / composition via dependent-chain timing of the march kernel
alone vs the full pipeline, times an n_slots=1 variant (pass-0-only
composition) to isolate the trailing slot passes, and sweeps resolution
on the SAME scene (the r04 comparison crossed scenes: the 512^2 number
was the config-2 demo scene, the 4K one config-3 planets — different
object tables and hit statistics).

Writes STILL4K_r05.json + docs/still_4k_preview.png (960x540 downscale).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import schwarzschild_tpu as st
from schwarzschild_tpu import camera as cam_mod
from schwarzschild_tpu import configs, geometry as geo, physics
from schwarzschild_tpu.compile_cache import enable_persistent_cache
from schwarzschild_tpu.kernel_scene import march_scene, render_fast
from schwarzschild_tpu.textures import build_atlas_cached


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def chain_ms(fn, lengths=(2, 6), tries=3):
    """Device ms per call via the dependent-chain slope
    (docs/tpu_cost_model.md section 5): fn(r)->scalar feeding the next
    call's r, timed at two chain lengths; the slope cancels dispatch and
    tunnel latency."""
    totals = {}
    for n in lengths:
        @jax.jit
        def chained(r0):
            def body(r, _):
                return r + 1e-6 * fn(r), None
            return jax.lax.scan(body, r0, None, length=n)[0]

        float(chained(jnp.float32(1.0)))  # compile
        best = 1e9
        for i in range(tries):
            t0 = time.perf_counter()
            float(chained(jnp.float32(1.0 + 1e-5 * i)))
            best = min(best, time.perf_counter() - t0)
        totals[n] = best
    lo, hi = lengths
    return (totals[hi] - totals[lo]) / (hi - lo) * 1e3


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

    # ---- stage breakdown at 4K (VERDICT r4 item 8) ----
    def make_frame_fn(cfg_, n_slots=4, compact=True):
        def f(r):
            im = render_fast(sc, cam, cfg_, bg, tex, r, overflow="ignore",
                             atlas=atlas, n_slots=n_slots,
                             compact_slots="auto" if compact else None)
            return jnp.mean(im)
        return f

    def make_march_fn(cfg_, n_slots=4):
        # The march kernel alone on the same lanes render_fast marches.
        u_ndc, v_ndc = cam_mod.pixel_grid(cfg_.width, cfg_.height)
        origin, direction = cam_mod.generate_rays(cam, u_ndc, v_ndc,
                                                  cfg_.width, cfg_.height)
        flat_px = physics.is_radial(direction, geo.safe_normalize(origin))

        def f(r):
            fdir, fpos, status, slots, nhits = march_scene(
                origin, direction, ~flat_px, r, sc, cfg_, n_slots=n_slots)
            return (jnp.mean(fdir) + jnp.mean(fpos) + jnp.mean(status)
                    + jnp.mean(nhits))
        return f

    full_ms = chain_ms(make_frame_fn(cfg))
    march_ms = chain_ms(make_march_fn(cfg))
    slots1_ms = chain_ms(make_frame_fn(cfg, n_slots=1))
    nocompact_ms = chain_ms(make_frame_fn(cfg, compact=False))
    compose_ms = full_ms - march_ms
    log(f"4K: full {full_ms:.1f} ms = march {march_ms:.1f} + compose "
        f"{compose_ms:.1f}; n_slots=1 {slots1_ms:.1f}; "
        f"compact off {nocompact_ms:.1f}")

    # ---- resolution sweep, SAME scene (config 3) ----
    sweep = {}
    for n in (512, 1024, 2048):
        cfg_n = st.RenderConfig(width=n, height=n, percent_black=-1.0)
        f_ms = chain_ms(make_frame_fn(cfg_n))
        m_ms = chain_ms(make_march_fn(cfg_n))
        sweep[str(n)] = {
            "full_ms": f_ms, "march_ms": m_ms, "compose_ms": f_ms - m_ms,
            "mrays_per_s": n * n / f_ms / 1e3,
            "march_mrays_per_s": n * n / m_ms / 1e3}
        log(f"{n}^2: full {f_ms:.2f} ms ({sweep[str(n)]['mrays_per_s']:.1f} "
            f"Mrays/s), march {m_ms:.2f} ms")

    arr = np.asarray(img)
    from PIL import Image

    pil = Image.fromarray(
        (np.clip(arr[..., :3], 0, 1) * 255).astype(np.uint8))
    pil.resize((960, 540), Image.LANCZOS).save(
        "/root/repo/docs/still_4k_preview.png")

    out = {"round": 5, "device": str(jax.devices()[0]),
           "resolution": f"{W}x{H}", "config": "BASELINE config 3 "
           "(planets), percent_black=-1 (every ray marched), max_steps=100",
           "frame_device_ms": full_ms,
           "mrays_per_s": W * H / full_ms / 1e3,
           "breakdown_4k": {
               "march_ms": march_ms, "compose_ms": compose_ms,
               "full_ms_n_slots1": slots1_ms,
               "trailing_passes_ms_est": full_ms - slots1_ms,
               "full_ms_compact_off": nocompact_ms},
           "resolution_sweep_same_scene": sweep,
           "finite": bool(np.isfinite(arr).all()),
           "nonblack_frac": float((arr[..., :3].max(-1) > 0.01).mean())}
    with open("/root/repo/STILL4K_r05.json", "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote STILL4K_r05.json  {out['frame_device_ms']:.1f} ms/frame "
        f"({out['mrays_per_s']:.1f} Mrays/s)")


if __name__ == "__main__":
    main()

"""INVERSE_r05: BASELINE config 5 end-to-end, as specified — recover
BH mass + camera pose + the accretion-disk TEXTURE on the planets scene
(VERDICT r4 item 2; the r04 artifact was horizon+sky only and never
optimized a texel).

Setup:
  * scene  — configs.config5_inverse()'s planets scene: saturn-ring-alpha
    textured HollowDisk (the accretion disk,
    /root/reference/src/lib/Objects/HollowDisk/hollowDisk.h:23-24), earth /
    moon / sun spheres, point light; the real 2k Milky Way background.
  * views  — TWO, with a KNOWN metric baseline between them
    (inverse.make_multiview_loss): breaks the monocular mass/distance gauge
    that stalled INVERSE_r04 (shadow angular size ~ r_s/|cam| pins only the
    ratio; parallax over a known baseline pins |cam|, then the shadow pins
    r_s).
  * params — ALL InverseParams free: r_s (softplus), camera position,
    orientation free vectors, fov, AND the disk layer's texels (init: flat
    0.5 gray — no truth leakage).
  * optim  — staged coarse-to-fine: Gaussian-blur multi-scale loss with a
    sigma schedule, early stages at HALF resolution (a sigma's basin is
    sigma pixels wide), per-group Adam LRs, and texels strictly alternated
    with pose (see the stage table in main()).
  * renderer — "fast": Pallas march forward, scene-free Pallas adjoint
    backward; texel gradients flow through the traced-atlas compose path.

Textures are downsampled (default 512x256) so the per-step traced atlas
rebuild stays small; the truth targets are rendered with the SAME stack, so
recovery is exact-in-the-limit.  Texture PSNR is reported over (a) the
SAMPLED texel mask (texels any ray actually touched — unsampled texels get
no gradient and honestly stay at init) and (b) the full true region, with
the coverage fraction; the r5 gate is (a) >= 25 dB.

Writes INVERSE_r05.json + docs/inverse_r05_disk.png (true | init |
recovered strips).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import schwarzschild_tpu as st
from schwarzschild_tpu import configs, inverse
from schwarzschild_tpu.compile_cache import enable_persistent_cache
from schwarzschild_tpu.kernel_scene import render_fast


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def downsample(img, factor):
    """Box-filter downsample of an (H, W, C) uint8/float image by ``factor``
    (exact mean over factor x factor blocks — no PIL resampling surprises)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    h2, w2 = h // factor * factor, w // factor * factor
    img = img[:h2, :w2]
    img = img.reshape(h2 // factor, factor, w2 // factor, factor, -1)
    return img.mean(axis=(1, 3))


def small_planet_stack(factor=4):
    """planet_texture_stack at 1/factor resolution (2048x1024 -> 512x256)."""
    from schwarzschild_tpu.textures import load_image, stack_textures

    tex_dir = configs.asset_dir() / "textures"
    names = ["2k_earth_daymap.jpg", "2k_earth_nightmap.jpg",
             "2k_earth_normal_map.jpg", "2k_moon.jpg", "2k_sun.jpg",
             "2k_saturn_ring_alpha.png"]
    raws = []
    for n in names:
        p = tex_dir / n
        raw = (load_image(p) if p.exists()
               else configs._procedural_checker(512, 8))
        # Keep the 0-255 range: stack_textures' _to_gl_rgba_f32 divides by
        # 255 itself (float input is fine).
        raws.append(downsample(raw, factor))
    return stack_textures(raws)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128,
                    help="fine resolution; pose stages start at size/2")
    ap.add_argument("--factor", type=int, default=4,
                    help="texture downsample factor (2048x1024 / factor)")
    ap.add_argument("--out", default="/root/repo/INVERSE_r05.json")
    ap.add_argument("--max-steps", type=int, default=100)
    args = ap.parse_args()

    enable_persistent_cache()
    on_tpu = jax.devices()[0].platform != "cpu"
    N = args.size
    N_coarse = N // 2
    factor = args.factor
    sc = configs._orbiting_planets_scene()
    cam_true = configs.demo_camera()
    bg = configs.background_texture()
    tex = small_planet_stack(factor)
    disk_slot = 5
    cfgs = {n: st.RenderConfig(width=n, height=n, max_steps=args.max_steps,
                               percent_black=-1.0, horizon_softness=0.1,
                               checkpoint_every=0)
            for n in (N_coarse, N)}
    cfg = cfgs[N]
    offsets = [(0.0, 0.0, 0.0), (5.0, 0.0, -3.0)]

    # Truth targets: r_s = 1, true pose, true disk texture — both views, at
    # BOTH resolutions (the pose stages run coarse-to-fine; a blur sigma is
    # a PIXEL width, so its world-angle basin halves every resolution
    # doubling — the r5 experiments measured the 64^2-converged schedule
    # DIVERGING when run directly at 128^2 for exactly that reason).
    def render_view(off, n):
        cam = cam_true._replace(
            pos=jnp.asarray(cam_true.pos, jnp.float32)
            + jnp.asarray(off, jnp.float32))
        return render_fast(sc, cam, cfgs[n], bg, tex, 1.0, overflow="ignore")

    targets = {n: [jax.jit(lambda o=o, n=n: render_view(o, n))()
                   for o in offsets] for n in cfgs}
    jax.block_until_ready(targets)
    log("targets rendered (r_s=1, true pose, true disk texture)")

    # Perturbed start: wrong mass, wrong pose, flat-gray disk.
    cam0 = cam_true._replace(
        pos=jnp.asarray(cam_true.pos, jnp.float32)
        + jnp.asarray([0.3, -0.2, 0.4], jnp.float32),
        axes=jnp.asarray(cam_true.axes, jnp.float32))
    params = inverse.init_params(cam0, 0.7, tex, disk_slot)
    truth_layer = np.asarray(params.disk_texture)
    params = params._replace(
        disk_texture=jnp.full_like(params.disk_texture, 0.5),
        cam_fwd_raw=params.cam_fwd_raw
        + jnp.asarray([0.02, -0.015, 0.01], jnp.float32))
    init_layer = np.asarray(params.disk_texture)

    # Staged optimization (the r5 experiment outcome; every earlier single-
    # schedule attempt failed a different way):
    #   * Gaussian-BLUR multi-scale loss, NOT pooling — blur keeps subpixel
    #     localization (make_multiview_loss blur_sigmas docstring);
    #   * coarse-to-fine in BOTH sigma and RESOLUTION — a sigma's basin is
    #     sigma PIXELS wide, so early stages run at N/2 where the initial
    #     pose error is safely inside it;
    #   * per-GROUP Adam LRs — orientation raws move the image ~1 deg per
    #     2e-2 step, 20x the equivalent position step; one global LR either
    #     thrashes the orientation or freezes the position;
    #   * texels strictly ALTERNATED with pose (frozen complements): joint
    #     steps let the texture absorb pose error (measured PSNR drop), and
    #     a flat-gray disk drags the pose at sharp sigmas.
    import optax

    P = dict(mass=2e-2, pos=2e-2, orient=1e-3, fov=5e-2)

    def sc_lr(f):
        return {k: v * f for k, v in P.items()}

    stages = [
        ("S1 pose  @%d (8,2)" % N_coarse, N_coarse, (8.0, 2.0), sc_lr(1.0),
         150),
        ("S2 pose  @%d (4,1)" % N_coarse, N_coarse, (4.0, 1.0), sc_lr(0.5),
         100),
        ("S3 pose  @%d (2,.5)" % N_coarse, N_coarse, (2.0, 0.5),
         sc_lr(0.25), 100),
        ("S4 pose  @%d (4,1)" % N, N, (4.0, 1.0), sc_lr(0.25), 100),
        ("S5 pose  @%d (2,.5)" % N, N, (2.0, 0.5), sc_lr(0.125), 100),
        ("S6 texel @%d" % N, N, (0.0,), dict(tex=3e-2), 200),
        ("S7 pose  @%d (2,.5)" % N, N, (2.0, 0.5), sc_lr(0.06), 100),
        ("S8 texel @%d" % N, N, (0.0,), dict(tex=1e-2), 200),
    ]
    n_steps = sum(s[-1] for s in stages)

    def stage_optimizer(lrs):
        lab = lambda k: k if k in lrs else "frozen"
        labels = inverse.InverseParams(
            r_s_raw=lab("mass"), cam_pos=lab("pos"),
            cam_fwd_raw=lab("orient"), cam_right_raw=lab("orient"),
            fov=lab("fov"), disk_texture=lab("tex"))
        tx = {k: optax.adam(v) for k, v in lrs.items()}
        tx["frozen"] = optax.set_to_zero()
        return optax.chain(
            inverse.zero_nonfinite(),
            optax.clip_by_global_norm(1.0),
            optax.multi_transform(tx, labels))

    history = []
    t_steps = 0.0
    opt_state = None
    for sname, n_img, sigmas, lrs, pn in stages:
        loss_fn = inverse.make_multiview_loss(
            sc, cfgs[n_img], bg, tex, disk_slot, targets[n_img], offsets,
            renderer="fast", blur_sigmas=sigmas)
        optimizer = stage_optimizer(lrs)
        opt_state = optimizer.init(params)
        train_step = inverse.make_train_step(loss_fn, optimizer)
        params, opt_state, loss = train_step(params, opt_state)  # compile
        history.append(float(loss))
        t0 = time.time()
        for step in range(1, pn):
            params, opt_state, loss = train_step(params, opt_state)
            history.append(float(loss))
        jax.block_until_ready(params)
        t_steps += time.time() - t0
        cam_f, r_s_f, _ = inverse.realize(params, tex, disk_slot)
        pe = float(np.linalg.norm(np.asarray(cam_f.pos)
                                  - np.asarray(cam_true.pos)))
        log(f"{sname}: loss {float(loss):.6f} r_s {float(r_s_f):.4f} "
            f"pos_err {pe:.3f}")
    per_step_ms = t_steps / max(n_steps - len(stages), 1) * 1e3

    cam_fit, r_s_fit, _ = inverse.realize(params, tex, disk_slot)
    r_s_fit = float(r_s_fit)
    pos_err0 = float(np.linalg.norm(np.asarray(cam0.pos)
                                    - np.asarray(cam_true.pos)))
    pos_err = float(np.linalg.norm(np.asarray(cam_fit.pos)
                                   - np.asarray(cam_true.pos)))
    fwd_true = np.asarray(cam_true.axes)[:, 2]
    fwd_fit = np.asarray(cam_fit.axes)[:, 2]
    ang_err = float(np.degrees(np.arccos(
        np.clip(np.dot(fwd_true, fwd_fit), -1.0, 1.0))))

    # Sampled-texel mask: texels with nonzero gradient of sum(img) at the
    # FINAL params (MSE gradients vanish at a perfect fit, sum(img) doesn't).
    def coverage_loss(p):
        cam, r_s, tex_p = inverse.realize(p, tex, disk_slot)
        total = jnp.float32(0.0)
        for off in offsets:
            cam_i = cam._replace(pos=cam.pos
                                 + jnp.asarray(off, jnp.float32))
            img = render_fast(sc, cam_i, cfg, bg, tex_p, r_s,
                              overflow="ignore", differentiable=True)
            total = total + jnp.sum(img)
        return total

    gcov = jax.grad(coverage_loss)(params).disk_texture
    sampled = np.asarray(jnp.abs(gcov).sum(-1) > 0)
    fit_layer = np.asarray(params.disk_texture)

    th, tw = (np.asarray(tex.sizes)[disk_slot][1].astype(int),
              np.asarray(tex.sizes)[disk_slot][0].astype(int))
    region = np.zeros(truth_layer.shape[:2], bool)
    region[:th, :tw] = True

    def psnr(mask):
        if not mask.any():
            return None
        mse = float(((fit_layer - truth_layer) ** 2)[mask].mean())
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    psnr_sampled = psnr(sampled & region)
    psnr_region = psnr(region)
    psnr_init = psnr_sampled and 10.0 * np.log10(1.0 / max(float(
        ((init_layer - truth_layer) ** 2)[sampled & region].mean()), 1e-12))
    coverage = float((sampled & region).sum() / region.sum())

    # Tail behavior within the FINAL stage (stage losses are not comparable
    # across stages — each blurs differently): the last-stage tail must
    # settle near that stage's minimum (r04 weak #4: constant LR oscillated
    # 10x past the min).
    last_n = stages[-1][-1]
    stage_hist = np.asarray(history[-last_n:])
    tail = stage_hist[-40:]
    tail_ratio = float(tail.mean() / max(stage_hist.min(), 1e-12))

    fired = inverse.nonfinite_fired(opt_state)
    shadow_true = 1.0 / float(np.linalg.norm(np.asarray(cam_true.pos)))
    shadow_fit = r_s_fit / float(np.linalg.norm(np.asarray(cam_fit.pos)))

    out = {
        "round": 5, "device": str(jax.devices()[0]),
        "config": f"config5 planets scene, 2 views (known baseline "
                  f"{offsets[1]}), max_steps={args.max_steps}, "
                  f"horizon_softness=0.1, Gaussian-blur multi-scale loss, "
                  f"coarse-to-fine {N_coarse}^2 -> {N}^2 with sigma "
                  f"schedule (8,2)->(4,1)->(2,.5), per-group Adam LRs, "
                  f"texels strictly alternated with pose "
                  f"({len(stages)} stages, {n_steps} steps total), "
                  f"renderer=fast (Pallas fwd + scene-free Pallas adjoint); "
                  f"free: r_s, cam pos, orientation, fov, disk texels "
                  f"(saturn-ring layer at {tw}x{th}, init flat 0.5)",
        "stages": [dict(name=s[0], res=s[1], sigmas=list(s[2]),
                        lrs=s[3], steps=s[4]) for s in stages],
        "start": {"r_s": 0.7, "cam_pos_err": pos_err0,
                  "disk_psnr_sampled_db": psnr_init},
        "recovered": {
            "r_s": r_s_fit, "r_s_rel_err": abs(r_s_fit - 1.0),
            "cam_pos_err": pos_err,
            "cam_forward_angle_err_deg": ang_err,
            "shadow_scale_invariant_rel_err":
                abs(shadow_fit - shadow_true) / shadow_true,
            "disk_psnr_sampled_db": psnr_sampled,
            "disk_psnr_region_db": psnr_region,
            "disk_sampled_coverage": coverage,
        },
        "loss_first": history[0], "loss_last": history[-1],
        "loss_min": float(min(history)),
        "tail40_mean_over_min": tail_ratio,
        "loss_history": history,
        "per_step_ms_on_chip" if on_tpu else "per_step_ms_cpu": per_step_ms,
        "nonfinite_grad_entries": int(fired),
        "converged": bool(psnr_sampled is not None and psnr_sampled >= 25.0
                          and abs(r_s_fit - 1.0) < 0.05
                          and pos_err < 0.5 * pos_err0
                          and tail_ratio < 3.0
                          and fired == 0),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)

    # Visual receipt: true | init | recovered disk layer (RGB over alpha).
    strip = np.concatenate([
        np.clip(truth_layer[:th, :tw, :3], 0, 1),
        np.clip(init_layer[:th, :tw, :3], 0, 1),
        np.clip(fit_layer[:th, :tw, :3], 0, 1)], axis=0)
    try:
        from PIL import Image

        Image.fromarray((strip * 255).astype(np.uint8)).save(
            "/root/repo/docs/inverse_r05_disk.png")
    except Exception as e:  # keep the JSON receipt even without PIL
        log(f"PNG save skipped: {e}")

    log(f"wrote {args.out}  r_s {r_s_fit:.4f} "
        f"(err {abs(r_s_fit - 1):.4f})  pos err {pos_err0:.3f}->{pos_err:.3f}"
        f"  disk PSNR {psnr_init and round(psnr_init, 1)} -> "
        f"{psnr_sampled and round(psnr_sampled, 1)} dB "
        f"(coverage {coverage:.1%})  tail40/min {tail_ratio:.2f}  "
        f"{per_step_ms:.0f} ms/step  converged={out['converged']}")


if __name__ == "__main__":
    main()

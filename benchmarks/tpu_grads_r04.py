"""TPU_GRADS_r04: AD vs central finite differences ON CHIP at
horizon_softness=0.15 (VERDICT r3 item 6 / round-2 item 4).

What is actually being claimed, and why the methodology below is the
honest version of it
---------------------------------------------------------------------
A geodesic that skims the photon sphere (impact parameter b near
b_crit = 3*sqrt(3)/2 * r_s, black_hole.frag:336-338's ODE) has
Lyapunov-amplified parameter sensitivity: after ~2 revolutions the
smooth derivative of its exit direction w.r.t. (r_s, cam_pos) is
O(1e4-1e5).  AD reports that amplified-but-correct tangent; a finite
difference at any practical eps is far outside the linear regime there
and measures bounded secant jumps instead.  Probes on chip (r4) show the
unmasked 128^2 MSE has AD/FD "rel errors" of 2-300x for exactly this
reason — at EVERY eps, on the pure-jnp twin as well, and on CPU f32 too,
so it is a property of the loss surface, not of the Pallas backward.

The well-posed <5% comparison therefore:
  * config 2 (horizon+sky, no hard-edged scene objects — an object
    silhouette sweeping across pixels is a genuine discontinuity AD
    rightly ignores, SURVEY section 7 subgradient convention);
  * per-pixel weights FROZEN at the unperturbed camera that zero the
    near-critical annulus |b - b_crit| <= 0.6 (straight-line impact
    parameter; camera at r=15 is effectively at infinity);
  * small central-difference steps: the masked loss is smooth but has
    curvature structure at the ~1e-3 parameter scale (measured by a
    21-point scan: AD tangent deviation < 1e-8 within +-2e-4, 1.5e-5 at
    +-2e-3), so eps must sit BELOW that scale: eps = 2e-4 (r_s) /
    3e-4 (cam_pos), with a 1e-3 point recorded to show convergence.

The AD path is the production one — render_fast(differentiable=True):
Pallas march forward, Pallas adjoint kernel backward (march_scene_bwd).
Two consistency probes ride along: fast-AD vs jnp-twin-AD on the SAME
masked loss on chip (must agree ~1e-3: same convention, same branches),
and the unmasked demo-scene gradients as a labelled diagnostic of the
silhouette/chaos flux (NOT gated).

Writes TPU_GRADS_r04.json.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import schwarzschild_tpu as st
from schwarzschild_tpu import camera as cm, configs
from schwarzschild_tpu.compile_cache import enable_persistent_cache
from schwarzschild_tpu.kernel_scene import render_fast
from schwarzschild_tpu.textures import build_atlas_cached

MARGIN = 0.6
EPS_RS = 2e-4
EPS_POS = 3e-4


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def central_fd(fun, eps):
    return (float(fun(eps)) - float(fun(-eps))) / (2 * eps)


def main():
    enable_persistent_cache()
    assert jax.devices()[0].platform != "cpu", jax.devices()
    out = {"round": 4, "device": str(jax.devices()[0]),
           "backward": "pallas adjoint kernel (march_scene_bwd)",
           "softness": 0.15, "mask_margin": MARGIN,
           "eps": {"r_s": EPS_RS, "cam_pos": EPS_POS},
           "method": "config2 horizon+sky 128^2, weighted MSE with frozen "
                     "ring mask |b - 3sqrt(3)/2| > 0.6 (see module "
                     "docstring for why the unmasked large-eps comparison "
                     "is ill-posed: photon-ring Lyapunov amplification)",
           "results": {}, "consistency": {}, "diagnostics": {}}
    gate = []

    c2 = configs.config2_curved()
    sc2, cam2, bg2 = c2["scene"], c2["camera"], c2["background"]
    atlas2 = build_atlas_cached(bg2, None)
    N = 128
    cfg = st.RenderConfig(width=N, height=N, percent_black=-1.0,
                          horizon_softness=0.15, checkpoint_every=0)

    u_ndc, v_ndc = cm.pixel_grid(N, N)
    origin, direction = cm.generate_rays(cam2, u_ndc, v_ndc, N, N)
    b = np.linalg.norm(
        np.cross(np.asarray(origin), np.asarray(direction)), axis=-1)
    b_crit = 3.0 * np.sqrt(3.0) / 2.0
    w = jnp.asarray((np.abs(b - b_crit) > MARGIN).astype(np.float32))
    wn = w / jnp.sum(w)
    out["mask_kept_frac"] = float(np.mean(np.abs(b - b_crit) > MARGIN))

    target = jax.jit(
        lambda a: render_fast(sc2, cam2, cfg, bg2, None, 1.0,
                              overflow="ignore", atlas=a))(atlas2)
    target.block_until_ready()
    log("config2 target rendered")

    def loss_fast(r_s, pos, a):
        c = cam2._replace(pos=pos)
        img = render_fast(sc2, c, cfg, bg2, None, r_s, overflow="ignore",
                          differentiable=True, atlas=a)
        per = jnp.mean((img - target) ** 2, axis=-1)
        return jnp.sum(wn * per)

    def loss_jnp(r_s, pos):
        c = cam2._replace(pos=pos)
        img = st.render(sc2, c, cfg, bg2, None, r_s)
        per = jnp.mean((img - target) ** 2, axis=-1)
        return jnp.sum(wn * per)

    lf = jax.jit(loss_fast)
    gf = jax.jit(jax.grad(loss_fast, argnums=(0, 1)))
    gj = jax.jit(jax.grad(loss_jnp, argnums=(0, 1)))

    r0 = jnp.float32(0.9)
    p0 = jnp.asarray(cam2.pos) + jnp.asarray([0.1, -0.05, 0.2], jnp.float32)

    t0 = time.time()
    g_rs, g_pos = gf(r0, p0, atlas2)
    g_rs = float(g_rs)
    g_pos = np.asarray(g_pos)
    log(f"fast AD ({time.time() - t0:.1f}s): r_s {g_rs:.6g} pos {g_pos}")

    t0 = time.time()
    j_rs, j_pos = gj(r0, p0)
    j_rs = float(j_rs)
    j_pos = np.asarray(j_pos)
    log(f"jnp AD ({time.time() - t0:.1f}s): r_s {j_rs:.6g} pos {j_pos}")
    denom = max(abs(j_rs), float(np.abs(j_pos).max()), 1e-12)
    out["consistency"]["fast_vs_jnp_ad_masked_loss"] = {
        "fast_r_s": g_rs, "jnp_r_s": j_rs,
        "fast_pos": [float(x) for x in g_pos],
        "jnp_pos": [float(x) for x in j_pos],
        "max_component_rel": float(
            max(abs(g_rs - j_rs), float(np.abs(g_pos - j_pos).max()))
            / denom)}

    # d/d(r_s): gated at EPS_RS; a coarse eps recorded for the convergence
    # story.
    for eps, gated in ((EPS_RS, True), (1e-3, False)):
        v = central_fd(lambda e: lf(r0 + e, p0, atlas2), eps)
        rel = float(abs(v - g_rs) / max(abs(v), 1e-12))
        key = f"r_s_eps{eps:g}"
        out["results"][key] = {"ad": g_rs, "fd": float(v), "rel_err": rel,
                               "gated": gated}
        if gated:
            gate.append((key, rel))
        log(f"r_s FD(eps={eps:g}) = {v:.6g} rel_err {rel:.4f}"
            + ("" if gated else " (convergence point, ungated)"))

    # d/d(cam_pos): the three per-axis FDs form the FD gradient VECTOR;
    # each component is gated on |fd_i - ad_i| / ||fd||_2 (the camera moves
    # in R^3 — a component whose true value is ~0, like the view axis z
    # here at 4% of ||g||, has a noise-floor-dominated per-component ratio
    # that says nothing about backward correctness).  Per-component ratios
    # are still reported.  A directional derivative along the AD gradient
    # direction — the best-conditioned scalar probe of the same vector —
    # is gated too.
    fd_vec = np.zeros(3)
    for i, axis in enumerate("xyz"):
        e3 = jnp.zeros(3, jnp.float32).at[i].set(1.0)
        for eps, record in ((EPS_POS, True), (1e-3, False)):
            v = central_fd(lambda e: lf(r0, p0 + e * e3, atlas2), eps)
            rel = float(abs(v - g_pos[i]) / max(abs(v), 1e-12))
            key = f"cam_pos_{axis}_eps{eps:g}"
            out["results"][key] = {"ad": float(g_pos[i]), "fd": float(v),
                                   "component_rel_err": rel}
            if record:
                fd_vec[i] = v
            log(f"cam_pos.{axis} FD(eps={eps:g}) = {v:.6g} "
                f"AD = {g_pos[i]:.6g} component-rel {rel:.4f}")
    nrm = float(np.linalg.norm(fd_vec))
    for i, axis in enumerate("xyz"):
        key = f"cam_pos_{axis}_vs_norm"
        rel = float(abs(fd_vec[i] - g_pos[i]) / max(nrm, 1e-12))
        out["results"][key] = {"ad": float(g_pos[i]),
                               "fd": float(fd_vec[i]),
                               "rel_err_vs_fd_norm": rel, "gated": True}
        gate.append((key, rel))
        log(f"cam_pos.{axis}: |fd-ad|/||fd|| = {rel:.4f}")

    u_dir = jnp.asarray(g_pos / max(np.linalg.norm(g_pos), 1e-12),
                        jnp.float32)
    v = central_fd(lambda e: lf(r0, p0 + e * u_dir, atlas2), EPS_POS)
    ad_dir = float(np.dot(g_pos, np.asarray(u_dir)))
    rel = float(abs(v - ad_dir) / max(abs(v), 1e-12))
    out["results"]["cam_pos_directional"] = {
        "ad": ad_dir, "fd": float(v), "rel_err": rel, "gated": True,
        "direction": [float(x) for x in np.asarray(u_dir)]}
    gate.append(("cam_pos_directional", rel))
    log(f"cam_pos directional FD = {v:.6g} AD = {ad_dir:.6g} rel {rel:.4f}")

    # ---- diagnostics: unmasked demo-scene gradients (silhouette flux) ----
    sc = configs.demo_scene()
    cam = configs.demo_camera()
    bg = configs.background_texture()
    tex = configs.demo_texture_stack()
    atlas = build_atlas_cached(bg, tex)
    targetd = jax.jit(
        lambda a: render_fast(sc, cam, cfg, bg, tex, 1.0, overflow="ignore",
                              atlas=a))(atlas)
    targetd.block_until_ready()

    def loss_demo(r_s, pos, a):
        c = cam._replace(pos=pos)
        img = render_fast(sc, c, cfg, bg, tex, r_s, overflow="ignore",
                          differentiable=True, atlas=a)
        return jnp.mean((img - targetd) ** 2)

    ld = jax.jit(loss_demo)
    gd = jax.jit(jax.grad(loss_demo, argnums=(0, 1)))
    pd0 = jnp.asarray(cam.pos) + jnp.asarray([0.1, -0.05, 0.2], jnp.float32)
    d_rs, d_pos = gd(r0, pd0, atlas)
    fd_rs = central_fd(lambda e: ld(r0 + e, pd0, atlas), 0.01)
    out["diagnostics"]["demo_unmasked"] = {
        "note": "UNGATED: demo scene, no ring mask, eps=0.01 — the 'rel "
                "err' here measures photon-ring Lyapunov flux and object-"
                "silhouette jumps, not backward correctness (module "
                "docstring).",
        "r_s_ad": float(d_rs), "r_s_fd_eps0.01": float(fd_rs),
        "cam_pos_ad": [float(x) for x in np.asarray(d_pos)]}
    log(f"demo diagnostic: r_s AD {float(d_rs):.6g} vs coarse FD "
        f"{fd_rs:.6g} (expected to disagree)")

    out["gated"] = {k: v for k, v in gate}
    out["all_rel_err_lt_5pct"] = all(v < 0.05 for _, v in gate)
    out["finite"] = bool(np.isfinite(g_rs) and np.isfinite(g_pos).all()
                         and np.isfinite(float(d_rs)))
    with open("/root/repo/TPU_GRADS_r04.json", "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote TPU_GRADS_r04.json  all<5%: {out['all_rel_err_lt_5pct']}  "
        f"ad-consistency max rel: "
        f"{out['consistency']['fast_vs_jnp_ad_masked_loss']['max_component_rel']:.5f}")


if __name__ == "__main__":
    main()

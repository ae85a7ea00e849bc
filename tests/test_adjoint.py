"""Kernel-forward / remat-backward custom_vjp (adjoint.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu import adjoint


CFG = st.RenderConfig(width=24, height=16, max_steps=20, percent_black=-1.0,
                      checkpoint_every=10)


def _setup():
    cam = configs.demo_camera()
    bg = configs.background_texture()
    return cam, bg


def _interpret_patch(monkeypatch):
    # Interpret mode so the Pallas forward runs on CPU.
    from schwarzschild_tpu import kernel as kmod

    orig = kmod.render_horizon_sky
    monkeypatch.setattr(
        adjoint, "render_horizon_sky",
        lambda cam, cfg, bg, r_s, **kw: orig(cam, cfg, bg, r_s,
                                             interpret=True, **kw))


def test_horizon_sky_twin_backward_grads_match_jnp(monkeypatch):
    _interpret_patch(monkeypatch)
    cam, bg = _setup()
    f = adjoint.make_diff_horizon_sky(CFG, backward="twin")

    def loss_fast(r_s):
        return f(cam, bg.data, r_s).mean()

    def loss_jnp(r_s):
        return st.render(st.empty_scene(), cam, CFG, bg, None, r_s).mean()

    # Forward values match (kernel parity) ...
    assert np.isclose(float(loss_fast(jnp.float32(1.0))),
                      float(loss_jnp(jnp.float32(1.0))), atol=1e-4)
    # ... and the twin backward IS the jnp gradient.
    g_fast = float(jax.grad(loss_fast)(jnp.float32(1.0)))
    g_jnp = float(jax.grad(loss_jnp)(jnp.float32(1.0)))
    assert np.isclose(g_fast, g_jnp, rtol=1e-6, atol=1e-9)


def test_horizon_sky_kernel_backward_grads():
    """The kernel-forward/replay-backward march gives the replay's gradient
    wherever the kernel and replay forwards agree.

    Near-critical lanes (the shadow edge) have exponentially-large,
    decision-sensitive derivatives, and the kernel vs replay forward can land
    on opposite sides of a capture decision there — so the comparison masks
    to agreeing lanes (the full-scene composition-level comparison lives in
    test_kernel_scene.py::test_fast_backward_matches_twin_gradients)."""
    from schwarzschild_tpu import camera as cam_mod
    from schwarzschild_tpu.kernel import march_bh, march_bh_diff, march_bh_jnp

    cam, _ = _setup()
    cfg = st.RenderConfig(width=24, height=16, max_steps=20,
                          percent_black=-1.0, checkpoint_every=10)
    u_ndc, v_ndc = cam_mod.pixel_grid(cfg.width, cfg.height)
    origin, direction = cam_mod.generate_rays(cam, u_ndc, v_ndc,
                                              cfg.width, cfg.height)
    active = jnp.ones((cfg.height, cfg.width), bool)

    fd_k, st_k = march_bh(origin, direction, active, 1.0, cfg, interpret=True)
    fd_t, st_t = march_bh_jnp(origin, direction, active, 1.0, cfg)
    agree = ((np.asarray(st_k) == np.asarray(st_t))
             & (np.abs(np.asarray(fd_k) - np.asarray(fd_t)) < 1e-4).all(-1))
    assert agree.mean() > 0.99
    w = (np.random.RandomState(0).rand(cfg.height, cfg.width, 3)
         .astype(np.float32)) * agree[..., None]

    def h(march, r_s):
        fd, _ = march(origin, direction, active, r_s, cfg)
        return jnp.sum(jnp.asarray(w) * fd)

    g_fast = float(jax.grad(
        lambda r: h(lambda o, d, a, r_, c: march_bh_diff(
            o, d, a, r_, c, interpret=True), r))(jnp.float32(1.0)))
    g_twin = float(jax.grad(lambda r: h(march_bh_jnp, r))(jnp.float32(1.0)))
    assert np.isfinite(g_fast)
    assert np.isclose(g_fast, g_twin, rtol=1e-3, atol=1e-5), (g_fast, g_twin)

    # FD sanity of the replay gradient on the same masked functional.
    eps = 1e-3
    fd = (float(h(march_bh_jnp, jnp.float32(1 + eps)))
          - float(h(march_bh_jnp, jnp.float32(1 - eps)))) / (2 * eps)
    assert np.isclose(g_twin, fd, rtol=5e-2, atol=1e-2), (g_twin, fd)


def test_horizon_sky_camera_and_texture_grads(monkeypatch):
    _interpret_patch(monkeypatch)
    cam, bg = _setup()
    f = adjoint.make_diff_horizon_sky(CFG)
    g = jax.grad(lambda p, b: f(cam._replace(pos=p), b, jnp.float32(1.0)).mean(),
                 argnums=(0, 1))(cam.pos, bg.data)
    assert np.isfinite(np.asarray(g[0])).all()
    assert (np.asarray(g[1]) != 0).any()
    assert np.isfinite(np.asarray(g[1])).all()


def test_march_bh_twin_matches_kernel():
    """march_bh_jnp (the backward replay) reproduces the kernel outputs."""
    from schwarzschild_tpu import camera as cam_mod
    from schwarzschild_tpu.kernel import march_bh, march_bh_jnp

    cam, _ = _setup()
    cfg = st.RenderConfig(width=32, height=24, percent_black=-1.0)
    u_ndc, v_ndc = cam_mod.pixel_grid(cfg.width, cfg.height)
    origin, direction = cam_mod.generate_rays(cam, u_ndc, v_ndc,
                                              cfg.width, cfg.height)
    active = np.ones((cfg.height, cfg.width), bool)

    fd_k, st_k = march_bh(origin, direction, active, 1.0, cfg, interpret=True)
    fd_t, st_t = march_bh_jnp(origin, direction, active, 1.0, cfg)
    ok_dir = (np.abs(np.asarray(fd_k) - np.asarray(fd_t)) < 1e-4).all(-1)
    ok_st = np.asarray(st_k) == np.asarray(st_t)
    # FMA/fusion differences may flip decision-boundary lanes.
    assert ok_dir.mean() > 0.995
    assert ok_st.mean() > 0.995


def test_pallas_adjoint_matches_replay_march_grads():
    """The Pallas adjoint kernel (march_scene_bwd) matches the checkpointed
    replay VJP on (origin, direction, r_s) gradients of ALL differentiable
    march outputs — same fixed-decision convention, same guards; differences
    are f32 reassociation only (measured <= ~5e-4 rel at 40-100 steps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import schwarzschild_tpu as st
    from schwarzschild_tpu import camera as cm, configs, geometry as geo
    from schwarzschild_tpu import physics
    from schwarzschild_tpu.kernel_scene import march_scene_diff

    W, H = 64, 16
    cam = configs.demo_camera()
    sc = configs.demo_scene()
    u, v = cm.pixel_grid(W, H)
    origin, direction = cm.generate_rays(cam, u, v, W, H)
    active = ~physics.is_radial(direction, geo.safe_normalize(origin))
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.standard_normal((H, W, 3)), jnp.float32)
          for _ in range(10)]
    wl = [jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
          for _ in range(4)]
    cfg = st.RenderConfig(width=W, height=H, max_steps=40,
                          percent_black=-1.0, checkpoint_every=0)

    def loss(o, d, r, backward):
        fdir, fpos, status, slots, nhits = march_scene_diff(
            o, d, active, r, sc, cfg, interpret=True, backward=backward)
        t = jnp.sum(fdir * ws[0]) + jnp.sum(fpos * ws[1])
        for k, (s0, d0, l0) in enumerate(slots):
            t = (t + jnp.sum(s0 * ws[2 + 2 * k]) + jnp.sum(d0 * ws[3 + 2 * k])
                 + jnp.sum(l0 * wl[k]))
        return t

    gr = jax.grad(loss, argnums=(0, 1, 2))(origin, direction,
                                           jnp.float32(1.0), "replay")
    gp = jax.grad(loss, argnums=(0, 1, 2))(origin, direction,
                                           jnp.float32(1.0), "pallas")
    for a, b in zip(gr[:2], gp[:2]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, rtol=0)
    np.testing.assert_allclose(float(gp[2]), float(gr[2]), rtol=2e-3)

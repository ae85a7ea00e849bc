"""Inverse rendering (BASELINE config 5): recover black-hole mass / camera /
disk texture by gradient descent; checkpoint/resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import schwarzschild_tpu as st
from schwarzschild_tpu import configs, inverse


CFG = st.RenderConfig(width=24, height=24, max_steps=50, percent_black=-1.0,
                      checkpoint_every=10)


def _setup():
    sc = st.build_scene([st.HollowDisk(material=st.Material(texture_index=0))],
                        [st.Light(intensity=8.0)])
    cam = configs.demo_camera()
    bg = st.solid_color_texture((0.05, 0.05, 0.1, 1.0))
    import numpy as _np
    rng = _np.random.default_rng(3)
    tex = st.stack_textures([(_np.clip(rng.random((16, 16, 3)), 0, 1) * 255
                              ).astype(_np.uint8)])
    return sc, cam, bg, tex


def _smooth_sky():
    v = np.linspace(0, 1, 64)[:, None]
    u = np.linspace(0, 1, 128)[None, :]
    img = np.stack([0.2 + 0.6 * u * np.ones_like(v),
                    0.3 + 0.5 * v * np.ones_like(u),
                    0.5 + 0.3 * np.sin(np.pi * u) * v], -1)
    return st.from_array(img)


def test_recover_mass():
    """Config 5 core: recover the Schwarzschild radius by gradient descent.

    Needs horizon_softness > 0: hard visibility gives no silhouette gradient
    (the smooth part of the loss even points the wrong way), and a smooth sky
    so the lensed background correlates rather than decorrelates."""
    sc = st.empty_scene()
    cam = configs.demo_camera()
    bg = _smooth_sky()
    cfg = st.RenderConfig(width=32, height=32, max_steps=50,
                          percent_black=-1.0, checkpoint_every=10,
                          horizon_softness=0.15)
    target = st.render(sc, cam, cfg, bg, None, r_s=1.0)

    params, history = inverse.fit(
        sc, cfg, bg, None, None, target, cam, r_s0=0.6,
        n_steps=120, learning_rate=3e-2, log_every=0, log_fn=lambda *_: None)
    r_s = float(inverse._softplus(params.r_s_raw))
    assert history[-1] < history[0] * 0.5
    assert abs(r_s - 1.0) < 0.12, r_s


def test_recover_disk_texture_gradient_flows():
    sc, cam, bg, tex = _setup()
    target = st.render(sc, cam, CFG, bg, tex, r_s=1.0)

    # Perturb the disk texture; its gradient must be nonzero and finite.
    p0 = inverse.init_params(cam, 1.0, tex, disk_slot=0)
    p0 = p0._replace(disk_texture=p0.disk_texture * 0.5)
    loss_fn = inverse.make_loss(sc, CFG, bg, tex, 0, target)
    g = jax.grad(loss_fn)(p0)
    gd = np.asarray(g.disk_texture)
    assert np.isfinite(gd).all()
    assert (gd != 0).any()
    # A few optimizer steps reduce the loss.
    step = inverse.make_train_step(loss_fn, __import__("optax").adam(5e-2))
    opt_state = __import__("optax").adam(5e-2).init(p0)
    losses = []
    p = p0
    for _ in range(10):
        p, opt_state, l = step(p, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_fast_renderer_texel_gradients_flow():
    """Config-5 requirement on the PRODUCTION path: disk-texel gradients
    through render_fast(differentiable=True) — Pallas forward, scene-free
    Pallas adjoint, traced-atlas compose.  Pins the r5 fix for the
    custom_vjp closure leak (a traced texture stack captured in the march's
    bwd closure raised UnexpectedTracerError)."""
    from schwarzschild_tpu.kernel_scene import render_fast

    sc, cam, bg, tex = _setup()

    def loss(layer):
        tex_p = tex._replace(data=tex.data.at[0].set(layer))
        img = render_fast(sc, cam, CFG, bg, tex_p, 1.0, overflow="ignore",
                          differentiable=True, interpret=True)
        return jnp.mean(img)

    g = jax.jit(jax.grad(loss))(jnp.full_like(tex.data[0], 0.5))
    gd = np.asarray(g)
    assert np.isfinite(gd).all()
    assert (gd != 0).any()


def test_multiview_loss_breaks_scale_gauge_mechanics():
    """make_multiview_loss: one loss over 2 views with a known camera
    baseline; gradients flow to every parameter (r_s, pose, texels)."""
    sc, cam, bg, tex = _setup()
    offs = [(0.0, 0.0, 0.0), (2.0, 0.0, -1.0)]
    targets = []
    for off in offs:
        cam_i = cam._replace(pos=jnp.asarray(cam.pos, jnp.float32)
                             + jnp.asarray(off, jnp.float32))
        targets.append(st.render(sc, cam_i, CFG, bg, tex, r_s=1.0))
    loss_fn = inverse.make_multiview_loss(sc, CFG, bg, tex, 0, targets,
                                          offs, renderer="jnp")
    p0 = inverse.init_params(cam, 0.8, tex, disk_slot=0)
    p0 = p0._replace(disk_texture=p0.disk_texture * 0.6)
    val, g = jax.value_and_grad(loss_fn)(p0)
    assert np.isfinite(float(val))
    for name in ("r_s_raw", "cam_pos", "cam_fwd_raw", "disk_texture"):
        leaf = np.asarray(getattr(g, name))
        assert np.isfinite(leaf).all(), name
        assert (leaf != 0).any(), name


def test_multiview_loss_view_weights():
    """view_weights: all-ones weights reproduce the unweighted loss; a
    zero-weighted region contributes no gradient (the config-5 harness
    masks disk-influenced pixels out of the pose objective this way)."""
    sc, cam, bg, tex = _setup()
    offs = [(0.0, 0.0, 0.0)]
    target = [st.render(sc, cam, CFG, bg, tex, r_s=1.0)]
    p0 = inverse.init_params(cam, 0.8, tex, disk_slot=0)
    p0 = p0._replace(disk_texture=p0.disk_texture * 0.6)

    base = inverse.make_multiview_loss(sc, CFG, bg, tex, 0, target, offs,
                                       renderer="jnp")
    ones = inverse.make_multiview_loss(
        sc, CFG, bg, tex, 0, target, offs, renderer="jnp",
        view_weights=[np.ones((CFG.height, CFG.width), np.float32)])
    np.testing.assert_allclose(float(base(p0)), float(ones(p0)), rtol=1e-5)

    # Zero out the whole image -> loss 0 and zero texel gradient.
    zeros = inverse.make_multiview_loss(
        sc, CFG, bg, tex, 0, target, offs, renderer="jnp",
        view_weights=[np.zeros((CFG.height, CFG.width), np.float32)])
    val, g = jax.value_and_grad(zeros)(p0)
    assert float(val) == 0.0
    assert not np.asarray(g.disk_texture).any()

    with pytest.raises(ValueError):
        inverse.make_multiview_loss(sc, CFG, bg, tex, 0, target, offs,
                                    renderer="jnp", view_weights=[])


def test_cem_fit_pose_finds_known_minimum():
    """cem_fit_pose: the derivative-free pose searcher recovers a known
    11-dim optimum of a synthetic loss (machinery test; the INVERSE_r05
    harness drives it through the real blurred render loss)."""
    sc, cam, bg, tex = _setup()
    p_start = inverse.init_params(cam, 0.7, tex, disk_slot=0)
    p_true = inverse.init_params(
        cam._replace(pos=jnp.asarray(cam.pos, jnp.float32)
                     + jnp.asarray([0.2, -0.1, 0.15], jnp.float32)),
        1.0, tex, disk_slot=0)
    v_true = jnp.asarray(inverse.pack_pose(p_true))

    def loss_fn(p):
        v = jnp.concatenate([jnp.ravel(x) for x in
                             (p.r_s_raw[None], p.cam_pos, p.cam_fwd_raw,
                              p.cam_right_raw, p.fov[None])])
        return jnp.sum((v - v_true) ** 2)

    fit, info = inverse.cem_fit_pose(loss_fn, p_start, n_iters=25, pop=48,
                                     elite=12, seed=1)
    assert info["best_loss"] < 1e-3
    # Improvement is monotone-ish: last iterate far better than first.
    assert info["history"][-1] < 0.01 * info["history"][0]
    np.testing.assert_allclose(inverse.pack_pose(fit),
                               np.asarray(v_true), atol=0.05)
    # Texels (not part of the search space) must pass through untouched.
    np.testing.assert_array_equal(np.asarray(fit.disk_texture),
                                  np.asarray(p_start.disk_texture))


def test_checkpoint_resume(tmp_path):
    sc, cam, bg, tex = _setup()
    target = st.render(sc, cam, CFG, bg, tex, r_s=1.0)
    kw = dict(n_steps=10, learning_rate=5e-2, checkpoint_every=5,
              log_every=0, log_fn=lambda *_: None)

    # Run 10 steps straight through.
    p_full, h_full = inverse.fit(sc, CFG, bg, tex, None, target, cam,
                                 r_s0=0.7, checkpoint_dir=None, **kw)

    # Run 5 steps, "crash", resume to 10 from the checkpoint.
    ck = tmp_path / "ck"
    kw5 = dict(kw, n_steps=5)
    inverse.fit(sc, CFG, bg, tex, None, target, cam, r_s0=0.7,
                checkpoint_dir=ck, **kw5)
    p_res, h_res = inverse.fit(sc, CFG, bg, tex, None, target, cam,
                               r_s0=0.7, checkpoint_dir=ck, **kw)
    np.testing.assert_allclose(
        float(inverse._softplus(p_res.r_s_raw)),
        float(inverse._softplus(p_full.r_s_raw)), rtol=1e-5)
    # The history survives the resume: full 10-step record, matching the
    # straight-through run (pre-resume steps ride inside the checkpoint).
    assert len(h_res) == len(h_full) == 10
    np.testing.assert_allclose(h_res, h_full, rtol=1e-5)


def test_camera_pose_orthonormalized():
    sc, cam, bg, tex = _setup()
    p = inverse.init_params(cam, 1.0)
    # Deliberately de-normalize the raws (as an optimizer would).
    p = p._replace(cam_fwd_raw=p.cam_fwd_raw * 3.0,
                   cam_right_raw=p.cam_right_raw + 0.2 * p.cam_fwd_raw)
    cam2, _, _ = inverse.realize(p, None, None)
    a = np.asarray(cam2.axes)
    np.testing.assert_allclose(a.T @ a, np.eye(3), atol=1e-5)
    # forward direction preserved
    np.testing.assert_allclose(a[:, 2], np.asarray(cam.forward), atol=1e-5)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jax.jit(fn).lower(*args)  # trace + lower only (compile is slow on CPU)


def test_graft_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)

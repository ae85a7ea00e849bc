"""Pixel-gradient correctness: derivatives of the f32 renderer vs central
finite differences of the float64 oracle (BASELINE.md: "pixel-gradient
allclose"; grads w.r.t. camera pose, black-hole mass, scene/texture params).

Rendering is piecewise-smooth: at decision boundaries (shadow silhouette,
object edges, capture-vs-escape) pixels jump discretely and finite differences
measure the jump, not the derivative (SURVEY.md section 7 "gradients through
discrete events").  So per-pixel derivatives are compared on pixels where the
oracle FD is *stable* across two step sizes — exactly the subgradient
convention the framework documents.
"""

import numpy as np
import jax
import jax.numpy as jnp

import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.oracle import OracleScene, render_image

W = H = 16
CFG = st.RenderConfig(width=W, height=H, percent_black=-1.0,
                      checkpoint_every=10)


def _setup():
    sc = configs.demo_scene()
    cam = configs.demo_camera()
    bg = configs.background_texture()
    tex = configs.demo_texture_stack()
    return sc, cam, bg, tex


def _oracle_img(sc, cam_pos, cam_axes, fov, bg, tex, r_s):
    osc = OracleScene.from_scene(sc, background=bg, tex=tex, r_s=r_s)
    return render_image(osc, cam_pos, cam_axes, fov, W, H, percent_black=-1.0)


def _check_per_pixel(dimg, fd_fn, h1=1e-3, h2=3e-3, rtol=0.08, atol=2e-3,
                     min_stable=0.35):
    """dimg: (H, W, 4) forward-mode derivative; fd_fn(h) -> oracle central FD.
    Compare on pixels where the two FD step sizes agree (stable = smooth)."""
    fd1 = fd_fn(h1)
    fd2 = fd_fn(h2)
    scale = np.maximum(np.abs(fd1), np.abs(fd2))
    stable = (np.abs(fd1 - fd2) <= 0.02 * scale + 1e-4).all(-1)
    assert stable.mean() >= min_stable, f"only {stable.mean():.2f} stable"
    got = dimg[stable]
    exp = fd1[stable]
    err = np.abs(got - exp)
    tol = rtol * np.abs(exp) + atol
    frac_ok = (err <= tol).mean()
    assert frac_ok > 0.97, (
        f"{(1 - frac_ok) * 100:.1f}% of stable pixel-grads off; "
        f"max err {err.max():.4g}")


def test_pixel_grads_wrt_mass():
    sc, cam, bg, tex = _setup()

    f = lambda r: st.render(sc, cam, CFG, bg, tex, r_s=r)
    _, dimg = jax.jvp(f, (jnp.float32(1.0),), (jnp.float32(1.0),))
    dimg = np.asarray(dimg)
    assert np.isfinite(dimg).all()

    pos, axes, fov = np.asarray(cam.pos), np.asarray(cam.axes), float(cam.fov)

    def fd(h):
        return (_oracle_img(sc, pos, axes, fov, bg, tex, 1.0 + h)
                - _oracle_img(sc, pos, axes, fov, bg, tex, 1.0 - h)) / (2 * h)

    _check_per_pixel(dimg, fd)


def test_pixel_grads_wrt_camera_pos():
    sc, cam, bg, tex = _setup()
    axes, fov = np.asarray(cam.axes), float(cam.fov)
    for axis in [0, 2]:
        tangent = np.zeros(3, np.float32)
        tangent[axis] = 1.0

        f = lambda p: st.render(sc, cam._replace(pos=p), CFG, bg, tex)
        _, dimg = jax.jvp(f, (cam.pos,), (jnp.asarray(tangent),))
        dimg = np.asarray(dimg)
        assert np.isfinite(dimg).all()

        def fd(h, axis=axis):
            dp = np.zeros(3)
            dp[axis] = h
            p = np.asarray(cam.pos)
            return (_oracle_img(sc, p + dp, axes, fov, bg, tex, 1.0)
                    - _oracle_img(sc, p - dp, axes, fov, bg, tex, 1.0)) / (2 * h)

        _check_per_pixel(dimg, fd)


def test_pixel_grads_wrt_fov():
    sc, cam, bg, tex = _setup()
    pos, axes = np.asarray(cam.pos), np.asarray(cam.axes)

    f = lambda v: st.render(sc, cam._replace(fov=v), CFG, bg, tex)
    _, dimg = jax.jvp(f, (jnp.float32(90.0),), (jnp.float32(1.0),))
    dimg = np.asarray(dimg)
    assert np.isfinite(dimg).all()

    def fd(h):
        return (_oracle_img(sc, pos, axes, 90.0 + h, bg, tex, 1.0)
                - _oracle_img(sc, pos, axes, 90.0 - h, bg, tex, 1.0)) / (2 * h)

    _check_per_pixel(dimg, fd, h1=0.02, h2=0.06)


def test_grad_wrt_background_texture():
    """Texture-data gradients: finite, land only on sampled texels, and sum to
    the number of bg-sampling rays / outputs (additive weight-1 splats)."""
    sc, cam, bg, tex = _setup()

    def loss(bg_data):
        return st.render(sc, cam, CFG, st.Texture(data=bg_data), tex).mean()

    g = np.asarray(jax.grad(loss)(bg.data))
    assert np.all(np.isfinite(g))
    assert (g != 0).any()
    total = g.sum()
    assert 0 < total <= 1.0


def test_grad_wrt_scene_geometry():
    """Scene parameters are differentiable leaves too (accretion disk outer
    radius here — nonzero because the annulus edge moves)."""
    sc, cam, bg, tex = _setup()

    def loss(outer_r):
        hd = sc.hollow_disks._replace(outer_radius=outer_r[None])
        sc2 = sc._replace(hollow_disks=hd)
        return st.render(sc2, cam, CFG, bg, tex).mean()

    g = float(jax.grad(loss)(jnp.float32(5.0)))
    assert np.isfinite(g)
    assert abs(g) > 1e-6


def test_grad_no_nan_with_noise_and_crosshair():
    sc, cam, bg, tex = _setup()
    cfg = st.RenderConfig(width=W, height=H, percent_black=0.75,
                          noise_mode="hash", crosshair=True,
                          checkpoint_every=10)

    def loss(r_s):
        return st.render(sc, cam, cfg, bg, tex, r_s=r_s).mean()

    g = float(jax.grad(loss)(jnp.float32(1.0)))
    assert np.isfinite(g)


def test_checkpointing_matches_plain_scan():
    """checkpoint_every changes memory, not values (fwd and grad)."""
    sc, cam, bg, tex = _setup()
    cfg_ck = st.RenderConfig(width=W, height=H, percent_black=-1.0,
                             checkpoint_every=10)
    cfg_plain = st.RenderConfig(width=W, height=H, percent_black=-1.0,
                                checkpoint_every=0)
    i1 = np.asarray(st.render(sc, cam, cfg_ck, bg, tex))
    i2 = np.asarray(st.render(sc, cam, cfg_plain, bg, tex))
    np.testing.assert_array_equal(i1, i2)

    g1 = float(jax.grad(lambda r: st.render(sc, cam, cfg_ck, bg, tex, r_s=r).mean())(jnp.float32(1.0)))
    g2 = float(jax.grad(lambda r: st.render(sc, cam, cfg_plain, bg, tex, r_s=r).mean())(jnp.float32(1.0)))
    assert np.isclose(g1, g2, rtol=1e-4, atol=1e-7)


def test_degenerate_lane_grads_finite_and_bounded():
    """Guards sized for flush-to-zero hardware (TPU drops f32 denormals):
    anything squared in reverse mode — division guards, atan2 inputs,
    safe_length eps — must square to a NORMAL float.  Probes sit at the
    degenerate points that poisoned round-1 TPU gradients; bounds (not just
    finiteness) catch a regression to 1e-20-style guards even on CPU,
    where denormals survive and the old code was merely astronomically
    large rather than NaN."""
    from schwarzschild_tpu import geometry as geo
    from schwarzschild_tpu import intersect as isect

    # atan2 pole / near-axis lanes: grad must be zeroed under the guard.
    for x, z in [(0.0, 0.0), (1e-20, 1e-20), (1e-13, 1e-13)]:
        g = jax.grad(lambda v: isect._phi_of(v[0], v[1]))(
            jnp.asarray([x, z], jnp.float32))
        g = np.asarray(g)
        assert np.isfinite(g).all(), (x, z, g)
        assert (np.abs(g) < 1e9).all(), (x, z, g)

    # Exact axis hit through the disk frame: r_local's sqrt at 0 was a CPU
    # NaN too (inf * 0) before safe_length.
    pos = jnp.zeros(3, jnp.float32)
    axes = jnp.eye(3, dtype=jnp.float32)

    def frame_sum(point):
        phi, r_local, tangent, bitangent, _ = isect._radial_frame(
            pos, axes, point, 3.0)
        return phi + r_local + tangent.sum() + bitangent.sum()

    for p in [(0.0, 0.0, 0.0), (1e-20, 0.0, 1e-20), (1e-13, 0.0, 1e-13)]:
        g = np.asarray(jax.grad(frame_sum)(jnp.asarray(p, jnp.float32)))
        assert np.isfinite(g).all(), (p, g)
        # _safe_normalize legitimately reaches ~1/sqrt(eps) = 1e10 at the
        # exact pole; anything past 1e12 means a squared-guard regression.
        assert (np.abs(g) < 1e12).all(), (p, g)

    # safe_length at the zero vector.
    g = np.asarray(jax.grad(lambda v: geo.safe_length(v))(jnp.zeros(3)))
    assert np.isfinite(g).all()

    # _safe_div guard: 1/guard must stay well under f32 overflow when
    # multiplied by ordinary cotangents.
    g = np.asarray(jax.grad(lambda a: isect._safe_div(a, jnp.float32(0.0)))(
        jnp.float32(1.0)))
    assert np.isfinite(g) and abs(g) < 1e13

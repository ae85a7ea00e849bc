"""Golden/integration tests: full renders vs the float64 oracle
(SURVEY.md section 4 item 2; BASELINE configs 1-3 shrunk to test sizes)."""

import numpy as np
import jax
import pytest

import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.oracle import OracleScene, render_image

JR = jax.jit(st.render, static_argnames="cfg")


def _compare(sc, cam, cfg, bg, tex, r_s=1.0, atol=2e-3, frac=0.995, **oracle_kw):
    img = np.asarray(JR(sc, cam, cfg, bg, tex, r_s))
    osc = OracleScene.from_scene(sc, background=bg, tex=tex, r_s=r_s)
    oimg = render_image(
        osc, np.asarray(cam.pos), np.asarray(cam.axes), float(cam.fov),
        cfg.width, cfg.height,
        max_steps=cfg.max_steps, max_revolutions=cfg.max_revolutions,
        u_f=cfg.u_f, percent_black=cfg.percent_black,
        raytrace_type=cfg.raytrace_type,
        curved_percentage=cfg.curved_percentage,
        crosshair=cfg.crosshair, **oracle_kw)
    diff = np.abs(img - oimg).max(-1)
    # Bulk of pixels must match tightly; decision-boundary pixels (f32 vs f64
    # branch flips at horizon/silhouette edges) may differ.
    assert (diff < atol).mean() >= frac, (
        f"only {(diff < atol).mean():.4f} of pixels within {atol}; "
        f"max diff {diff.max():.4g}")
    assert np.median(diff) < atol / 4
    return img, oimg


def test_config1_flat_sphere_sky():
    """BASELINE config 1 (shrunk): flat space, BH sphere + equirect sky."""
    c = configs.config1_flat()
    cfg = st.RenderConfig(width=48, height=48, raytrace_type=st.FLAT,
                          percent_black=-1.0)
    _compare(c["scene"], c["camera"], cfg, c["background"], None)


def test_config2_curved_horizon_sky():
    """BASELINE config 2 (shrunk): curved march, horizon + sky."""
    c = configs.config2_curved()
    cfg = st.RenderConfig(width=40, height=40, percent_black=-1.0,
                          checkpoint_every=10)
    _compare(c["scene"], c["camera"], cfg, c["background"], None)


def test_config3_full_scene():
    """BASELINE config 3 (shrunk): accretion disk + textured planets."""
    c = configs.config3_full_scene()
    cfg = st.RenderConfig(width=32, height=32, percent_black=-1.0,
                          checkpoint_every=10)
    _compare(c["scene"], c["camera"], cfg, c["background"], c["tex"])


def test_demo_scene_all_primitives():
    """The reference demo scene exercises every primitive type."""
    cfg = st.RenderConfig(width=32, height=24, percent_black=-1.0,
                          checkpoint_every=10)
    _compare(configs.demo_scene(), configs.demo_camera(), cfg,
             configs.background_texture(), configs.demo_texture_stack())


def test_split_screen_half_width():
    cfg = st.RenderConfig(width=32, height=24, raytrace_type=st.HALF_WIDTH,
                          curved_percentage=0.4, percent_black=-1.0,
                          checkpoint_every=10)
    _compare(configs.demo_scene(), configs.demo_camera(), cfg,
             configs.background_texture(), configs.demo_texture_stack())


def test_split_screen_half_height():
    cfg = st.RenderConfig(width=32, height=24, raytrace_type=st.HALF_HEIGHT,
                          curved_percentage=0.6, percent_black=-1.0,
                          checkpoint_every=10)
    _compare(configs.demo_scene(), configs.demo_camera(), cfg,
             configs.background_texture(), configs.demo_texture_stack())


def test_crosshair_overlay():
    cfg = st.RenderConfig(width=32, height=24, raytrace_type=st.FLAT,
                          percent_black=-1.0, crosshair=True)
    img, oimg = _compare(configs.demo_scene(), configs.demo_camera(), cfg,
                         configs.background_texture(),
                         configs.demo_texture_stack())
    # The crosshair must actually appear (additive 0.5 gray near center).
    center = img[10:14, 12:20]
    assert center.max() > 0.0


def test_noise_skip_hash_mask_exact():
    """Canonical 'hash' noise mode: skip mask identical between the jitted
    renderer and the oracle (deterministic, seedable — SURVEY section 4
    item 4)."""
    cfg = st.RenderConfig(width=24, height=24, percent_black=0.75,
                          noise_mode="hash", noise_seed=7, checkpoint_every=10)
    sc = st.empty_scene()
    cam = configs.demo_camera()
    bg = configs.background_texture()
    img = np.asarray(JR(sc, cam, cfg, bg, None, 1.0))
    osc = OracleScene.from_scene(sc, background=bg)
    oimg = render_image(osc, np.asarray(cam.pos), np.asarray(cam.axes),
                        float(cam.fov), 24, 24, percent_black=0.75,
                        noise_mode="hash", noise_seed=7)
    jb = img.max(-1) == 0
    ob = oimg.max(-1) == 0
    np.testing.assert_array_equal(jb, ob)
    # different seed -> different mask
    cfg2 = st.RenderConfig(width=24, height=24, percent_black=0.75,
                           noise_mode="hash", noise_seed=8, checkpoint_every=10)
    img2 = np.asarray(JR(sc, cam, cfg2, bg, None, 1.0))
    assert (img2.max(-1) == 0).sum() != 0
    assert ((img2.max(-1) == 0) != jb).any()


def test_noise_skip_glsl_mask_mostly_matches():
    """The reference's f32 sin-hash is backend-dependent (1-ulp sin
    differences blow up through *43758); require bulk agreement only."""
    cfg = st.RenderConfig(width=24, height=24, percent_black=0.75,
                          noise_mode="glsl", checkpoint_every=10)
    sc = st.empty_scene()
    cam = configs.demo_camera()
    bg = configs.background_texture()
    img = np.asarray(JR(sc, cam, cfg, bg, None, 1.0))
    osc = OracleScene.from_scene(sc, background=bg)
    oimg = render_image(osc, np.asarray(cam.pos), np.asarray(cam.axes),
                        float(cam.fov), 24, 24, percent_black=0.75,
                        noise_mode="glsl")
    jb = img.max(-1) == 0
    ob = oimg.max(-1) == 0
    assert (jb == ob).mean() > 0.8
    # both should skip roughly percent_black of curved pixels
    assert 0.5 < jb.mean() < 0.95


def test_hyperbolic_trajectory_frame():
    """Config 4 seed: a mid-flyby pose renders and matches the oracle."""
    cam = st.hyperbolic_trajectory(configs.demo_camera(), 30.0, 10.0, 0.37)
    # Oracle check of the conic parameterization (camera.cpp:20-33).
    a = -(10.0 ** 2) / (-30.0 + 2 * 10.0)
    c = 10.0 + a
    b = np.sqrt(10.0 ** 2 + 2 * a * 10.0)
    eased = (1 - np.cos(0.37 * np.pi)) / 2
    x = -30.0 + 2 * eased * 30.0
    y = c - a * np.sqrt(1 + (x / b) ** 2)
    expected = x * np.array([0.0, 0.0, -1.0]) + y * np.array(
        [np.cos(np.pi / 10), np.sin(np.pi / 10), 0.0])
    np.testing.assert_allclose(np.asarray(cam.pos), expected, rtol=1e-5)
    # forward looks at origin
    fwd = np.asarray(cam.forward)
    np.testing.assert_allclose(fwd, -expected / np.linalg.norm(expected),
                               rtol=1e-5, atol=1e-6)

    cfg = st.RenderConfig(width=24, height=16, raytrace_type=st.HALF_WIDTH,
                          percent_black=-1.0, checkpoint_every=10)
    _compare(configs.demo_scene(), cam, cfg, configs.background_texture(),
             configs.demo_texture_stack())


def test_r_s_parameter_shrinks_shadow():
    """Smaller mass -> smaller shadow (differentiable-mass sanity)."""
    sc = st.empty_scene()
    cam = configs.demo_camera()
    bg = st.solid_color_texture((1.0, 1.0, 1.0, 1.0))
    cfg = st.RenderConfig(width=32, height=32, percent_black=-1.0,
                          checkpoint_every=10)
    big = np.asarray(JR(sc, cam, cfg, bg, None, 1.0))
    small = np.asarray(JR(sc, cam, cfg, bg, None, 0.5))
    shadow_big = (big[..., :3].max(-1) < 0.1).sum()
    shadow_small = (small[..., :3].max(-1) < 0.1).sum()
    assert shadow_small < shadow_big
    assert shadow_small > 0


def test_strip_render_bit_identical():
    """render(rows=(r0, r1)) must equal the same rows of the full frame,
    bitwise, for every per-pixel field (NDC grid, noise mask, crosshair) —
    the contract benchmarks/parity_r04.py relies on to strip-render 1024^2
    within HBM."""
    sc = configs.demo_scene()
    cam = configs.demo_camera()
    bg = configs.background_texture()
    tex = configs.demo_texture_stack()
    cfg = st.RenderConfig(width=48, height=32, percent_black=0.5,
                          noise_mode="prng", crosshair=True,
                          checkpoint_every=0, max_steps=10)
    jr = jax.jit(st.render, static_argnames=("cfg", "rows"))
    full = np.asarray(jr(sc, cam, cfg, bg, tex, 1.0))
    strip = np.concatenate(
        [np.asarray(jr(sc, cam, cfg, bg, tex, 1.0, rows=(r, r + 8)))
         for r in range(0, 32, 8)], axis=0)
    assert full.shape == strip.shape
    assert (full == strip).all()

"""Native C++ oracle: strict cross-check against the Python oracle, plus a
full-size golden parity test that is only affordable with the native speed."""

import numpy as np
import jax
import pytest

import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.oracle import OracleScene, render_image
from schwarzschild_tpu.oracle import native

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native oracle failed to build")


def _setup():
    sc = configs.demo_scene()
    cam = configs.demo_camera()
    bg = configs.background_texture()
    tex = configs.demo_texture_stack()
    return sc, cam, bg, tex


def test_native_matches_python_oracle_exactly():
    """Both are float64 implementations of the same branch structure; they
    must agree to round-off."""
    sc, cam, bg, tex = _setup()
    osc = OracleScene.from_scene(sc, background=bg, tex=tex)
    pos, axes, fov = np.asarray(cam.pos), np.asarray(cam.axes), float(cam.fov)
    for kwargs in [
        dict(percent_black=-1.0),
        dict(percent_black=-1.0, raytrace_type=1),
        dict(percent_black=-1.0, raytrace_type=2, curved_percentage=0.3),
        dict(percent_black=0.75, noise_mode="hash", noise_seed=5),
        dict(percent_black=-1.0, crosshair=True),
    ]:
        py = render_image(osc, pos, axes, fov, 24, 16, **kwargs)
        nat = native.render_image(osc, pos, axes, fov, 24, 16, **kwargs)
        np.testing.assert_allclose(nat, py, rtol=1e-10, atol=1e-10,
                                   err_msg=str(kwargs))


def test_native_matches_python_with_mass_param():
    sc, cam, bg, tex = _setup()
    osc = OracleScene.from_scene(sc, background=bg, tex=tex, r_s=0.8)
    pos, axes, fov = np.asarray(cam.pos), np.asarray(cam.axes), float(cam.fov)
    py = render_image(osc, pos, axes, fov, 16, 16, percent_black=-1.0)
    nat = native.render_image(osc, pos, axes, fov, 16, 16, percent_black=-1.0)
    np.testing.assert_allclose(nat, py, rtol=1e-10, atol=1e-10)


def test_golden_256_demo_scene():
    """BASELINE-scale golden test: 256x256 demo scene, JAX renderer vs the
    native f64 oracle (the Python oracle would take ~2 minutes here)."""
    sc, cam, bg, tex = _setup()
    cfg = st.RenderConfig(width=256, height=256, percent_black=-1.0,
                          checkpoint_every=0)
    img = np.asarray(jax.jit(st.render, static_argnames="cfg")(
        sc, cam, cfg, bg, tex))
    osc = OracleScene.from_scene(sc, background=bg, tex=tex)
    gold = native.render_image(osc, np.asarray(cam.pos), np.asarray(cam.axes),
                               float(cam.fov), 256, 256, percent_black=-1.0)
    diff = np.abs(img - gold).max(-1)
    assert (diff < 2e-3).mean() > 0.995, (
        f"{(diff < 2e-3).mean():.4f} within tol; max {diff.max():.4g}")
    assert np.median(diff) < 5e-4

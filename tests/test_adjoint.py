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


def test_horizon_sky_grads_match_jnp(monkeypatch):
    # Interpret mode so the Pallas forward runs on CPU.
    from schwarzschild_tpu import kernel as kmod

    orig = kmod.render_horizon_sky
    monkeypatch.setattr(
        adjoint, "render_horizon_sky",
        lambda cam, cfg, bg, r_s: orig(cam, cfg, bg, r_s, interpret=True))

    cam, bg = _setup()
    f = adjoint.make_diff_horizon_sky(CFG)

    def loss_fast(r_s):
        return f(cam, bg.data, r_s).mean()

    def loss_jnp(r_s):
        return st.render(st.empty_scene(), cam, CFG, bg, None, r_s).mean()

    # Forward values match (kernel parity) ...
    assert np.isclose(float(loss_fast(jnp.float32(1.0))),
                      float(loss_jnp(jnp.float32(1.0))), atol=1e-4)
    # ... and the custom backward IS the jnp gradient.
    g_fast = float(jax.grad(loss_fast)(jnp.float32(1.0)))
    g_jnp = float(jax.grad(loss_jnp)(jnp.float32(1.0)))
    assert np.isclose(g_fast, g_jnp, rtol=1e-6, atol=1e-9)


def test_horizon_sky_camera_and_texture_grads(monkeypatch):
    from schwarzschild_tpu import kernel as kmod

    orig = kmod.render_horizon_sky
    monkeypatch.setattr(
        adjoint, "render_horizon_sky",
        lambda cam, cfg, bg, r_s: orig(cam, cfg, bg, r_s, interpret=True))

    cam, bg = _setup()
    f = adjoint.make_diff_horizon_sky(CFG)
    g = jax.grad(lambda p, b: f(cam._replace(pos=p), b, jnp.float32(1.0)).mean(),
                 argnums=(0, 1))(cam.pos, bg.data)
    assert np.isfinite(np.asarray(g[0])).all()
    assert (np.asarray(g[1]) != 0).any()
    assert np.isfinite(np.asarray(g[1])).all()

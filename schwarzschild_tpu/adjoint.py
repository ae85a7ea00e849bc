"""Checkpointed adjoint wiring: Pallas forward, rematerialized jnp backward.

SURVEY section 7 step 6.  Two mechanisms implement the memory-bounded
backward pass through the 100-step march:

  1. ``render.py`` runs the march as a scan of ``jax.checkpoint`` chunks
     (``RenderConfig.checkpoint_every``): O(sqrt(steps)) residual memory,
     recompute inside each chunk — the ODE-adjoint analog of blockwise
     processing (SURVEY section 2.2 SP row).

  2. This module fuses the two renderers with ``jax.custom_vjp``: the FORWARD
     pass runs the Pallas kernel (VMEM-resident march, no residuals at all),
     and the BACKWARD pass re-runs the checkpointed jnp twin under jax.vjp.
     Both compute the same function (parity-tested), so the gradients are the
     jnp renderer's gradients while forward-only use pays kernel cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import Camera
from .config import RenderConfig
from .kernel import render_horizon_sky
from .render import render
from .scene import Scene
from .textures import Texture, TextureStack


def make_diff_horizon_sky(cfg: RenderConfig):
    """Differentiable horizon+sky renderer: kernel forward, remat backward.

    Returns f(cam, background_data, r_s) -> (H, W, 4).  Gradients flow to all
    three arguments via the jnp twin.
    """
    from .scene import build_scene

    empty = build_scene([], [])

    def _jnp_render(cam, bg_data, r_s):
        return render(empty, cam, cfg, Texture(data=bg_data), None, r_s)

    @jax.custom_vjp
    def f(cam, bg_data, r_s):
        return render_horizon_sky(cam, cfg, Texture(data=bg_data), r_s)

    def fwd(cam, bg_data, r_s):
        return f(cam, bg_data, r_s), (cam, bg_data, r_s)

    def bwd(residuals, cotangent):
        cam, bg_data, r_s = residuals
        _, vjp = jax.vjp(_jnp_render, cam, bg_data, r_s)
        return vjp(cotangent)

    f.defvjp(fwd, bwd)
    return f


def make_diff_scene_renderer(cfg: RenderConfig, sc: Scene,
                             tex: TextureStack | None = None,
                             n_slots: int = 4):
    """Differentiable full-scene renderer: scene-kernel forward, remat
    backward.  f(cam, background_data, r_s) -> image; the scene/textures are
    closed over (optimize them through the jnp path directly if needed)."""
    from .kernel_scene import render_fast

    def _jnp_render(cam, bg_data, r_s):
        return render(sc, cam, cfg, Texture(data=bg_data), tex, r_s)

    @jax.custom_vjp
    def f(cam, bg_data, r_s):
        return render_fast(sc, cam, cfg, Texture(data=bg_data), tex, r_s,
                           n_slots=n_slots)

    def fwd(cam, bg_data, r_s):
        return f(cam, bg_data, r_s), (cam, bg_data, r_s)

    def bwd(residuals, cotangent):
        cam, bg_data, r_s = residuals
        _, vjp = jax.vjp(_jnp_render, cam, bg_data, r_s)
        return vjp(cotangent)

    f.defvjp(fwd, bwd)
    return f

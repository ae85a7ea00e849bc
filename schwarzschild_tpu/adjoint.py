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


def make_diff_horizon_sky(cfg: RenderConfig, backward: str = "kernel"):
    """Differentiable horizon+sky renderer: kernel forward, kernel-speed
    backward.

    Returns f(cam, background_data, r_s) -> (H, W, 4).  Gradients flow to all
    three arguments.  ``backward="kernel"`` (default) uses the checkpointed
    dynamics-replay VJP on the march (``kernel.march_bh_jnp``);
    ``backward="twin"`` is the round-1 dense-twin VJP (gradient oracle).
    """
    if backward == "kernel":
        def f(cam, bg_data, r_s):
            return render_horizon_sky(cam, cfg, Texture(data=bg_data), r_s,
                                      differentiable=True)

        return f
    if backward != "twin":
        raise ValueError(f"unknown backward mode {backward!r}")

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
                             n_slots: int = 4, backward: str = "kernel"):
    """Differentiable full-scene renderer: scene-kernel forward, kernel-speed
    backward.  f(cam, background_data, r_s) -> image; the scene/textures are
    closed over (optimize them through the jnp path directly if needed).

    ``backward``:
      * "kernel" (default): the march carries a custom_vjp whose backward is
        a checkpointed VALIDITY-march replay (``march_scene_jnp``) — ~10x
        fewer ops per RK4 step than the dense twin, because per-step
        intersect+shade never runs; slot shading (K passes) differentiates
        directly.  This is the round-2 fast gradient path.
      * "twin": round-1 behavior — jax.vjp of the full dense jnp renderer
        (kept as the gradient correctness oracle).
    """
    from .kernel_scene import render_fast

    if backward == "kernel":
        def f(cam, bg_data, r_s):
            return render_fast(sc, cam, cfg, Texture(data=bg_data), tex, r_s,
                               n_slots=n_slots, overflow="ignore",
                               differentiable=True)

        return f
    if backward != "twin":
        raise ValueError(f"unknown backward mode {backward!r}")

    def _jnp_render(cam, bg_data, r_s):
        return render(sc, cam, cfg, Texture(data=bg_data), tex, r_s)

    @jax.custom_vjp
    def f(cam, bg_data, r_s):
        return render_fast(sc, cam, cfg, Texture(data=bg_data), tex, r_s,
                           n_slots=n_slots, overflow="ignore")

    def fwd(cam, bg_data, r_s):
        return f(cam, bg_data, r_s), (cam, bg_data, r_s)

    def bwd(residuals, cotangent):
        cam, bg_data, r_s = residuals
        _, vjp = jax.vjp(_jnp_render, cam, bg_data, r_s)
        return vjp(cotangent)

    f.defvjp(fwd, bwd)
    return f

"""Frozen render configuration.

Replaces the reference's compile-time #defines + GLSL uniform defaults
(main.cpp:57-69, black_hole.frag:19-39).  One hashable dataclass; it is a
static argument under jit, so changing a field recompiles (like editing a
#define and rebuilding — but cached).
"""

from __future__ import annotations

import dataclasses

from . import camera as cam_mod


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 1280  # main.cpp:25
    height: int = 720  # main.cpp:26
    max_steps: int = 100  # main.cpp:68
    max_revolutions: int = 2  # main.cpp:69
    u_f: float = 0.01  # black_hole.frag:22
    # Stochastic pixel skip ("noise optimization", frag:39,879-881).
    # < 0 disables skipping entirely (all curved pixels march).
    percent_black: float = 0.75  # main.cpp:66
    # "hash": portable seeded integer hash (canonical — bit-identical on every
    # backend); "glsl": the reference's fract(sin(dot)) hash (visually
    # faithful but 1-ulp sin() differences make it backend-dependent);
    # "prng": seeded threefry; "tile": TILE-coherent hash — skipped pixels
    # come in noise_tile blocks aligned to the Pallas kernel tiles, so the
    # march's early tile exit actually recovers ~percent_black of the work
    # (render.tile_hash_rand documents the visual trade-off).
    noise_mode: str = "hash"
    noise_seed: int = 0
    # Tile shape for noise_mode="tile"; match the march kernel's
    # (block_h, block_w) so dead noise tiles = dead kernel tiles.
    noise_tile: tuple = (16, 128)
    raytrace_type: int = cam_mod.CURVED  # frag:36
    curved_percentage: float = 0.5  # frag:37
    crosshair: bool = False  # frag:24
    # Reverse-mode memory: checkpoint the march every this many RK4 steps
    # (sqrt-style rematerialization); 0 = no checkpointing (scan stores all).
    checkpoint_every: int = 10
    # Inverse-rendering aid: > 0 smooths the event-horizon silhouette with a
    # sigmoid of the photon's conserved impact parameter b against the exact
    # shadow radius b_crit = 3*sqrt(3)/2 * r_s — background contributions are
    # scaled by 1 - sigmoid((b_crit - b)/softness), so the shadow edge becomes
    # CONTINUOUS in r_s/camera and carries usable gradients (render.py:297-317
    # implements this).  0.0 (default) = the reference's hard opaque horizon
    # (exact parity).  Not present in the reference — hard visibility gives
    # no silhouette gradient at all (SURVEY section 7 "gradients through
    # discrete events").
    horizon_softness: float = 0.0
    # Texture minification: "bilinear" = level-0 GL_LINEAR, which is the
    # reference's ACTUAL behavior (its min filter is GL_LINEAR for both the
    # background and the array, image_utils.cpp:17,113 — the glGenerateMipmap
    # at cpp:31 is dead code under a non-mipmap min filter), and the oracle
    # parity target.  "trilinear" = opt-in mip-pyramid sampling with
    # screen-space-derivative LOD (textures need .mips built via
    # textures.with_mips / stack_with_mips; renderers build them on the fly
    # when absent) — removes minification shimmer the reference exhibits.
    texture_filter: str = "bilinear"
    # Number of slots in the fixed-size test-ray points buffer (frag:182 says
    # MAX_POINTS 1000 but the CPU integrator emits at most max_steps+1 points,
    # main.cpp:108-123).
    test_ray_capacity: int = 101

    @property
    def max_angle(self) -> float:
        import math

        return 2.0 * float(self.max_revolutions) * math.pi

"""Camera model: pinhole rays, lookAt, hyperbolic flyby trajectory.

Replaces /root/reference/src/lib/Objects/Camera/camera.{h,cpp}.  The camera is
a small PyTree (pos, axes, fov) so every field is a differentiable leaf for
inverse rendering; the trajectory is a pure function of time, replacing the
interactive key-H controller (main.cpp:404-410).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from . import geometry as geo

DEFAULT_FOV = 90.0  # degrees, camera.h:7
HYPERBOLIC_TRAJECTORY_DURATION = 5.0  # seconds, camera.h:10
# In-plane basis of the flyby conic (camera.h:11-12).
HYPERBOLIC_BASE_X = (0.0, 0.0, -1.0)
HYPERBOLIC_BASE_Y = (math.cos(math.pi / 10.0), math.sin(math.pi / 10.0), 0.0)

# Raytrace modes (black_hole.frag:32-35, camera.h:14-19).
CURVED = 0
FLAT = 1
HALF_WIDTH = 2
HALF_HEIGHT = 3


class Camera(NamedTuple):
    """pos (3,), axes (3,3) columns (right, up, forward), fov degrees."""

    pos: jnp.ndarray
    axes: jnp.ndarray
    fov: jnp.ndarray

    @property
    def right(self):
        return self.axes[..., :, 0]

    @property
    def up(self):
        return self.axes[..., :, 1]

    @property
    def forward(self):
        return self.axes[..., :, 2]


def make_camera(pos, forward=None, right=None, fov=DEFAULT_FOV):
    """Build a camera the way Camera(pos, forward, right) does
    (camera.cpp:7-11): right/forward normalized, up = cross(right, forward)."""
    pos = jnp.asarray(pos, jnp.float32)
    if forward is None:
        axes = geo.IDENTITY_AXES
    else:
        f = geo.normalize(jnp.asarray(forward, jnp.float32))
        r = geo.normalize(jnp.asarray(right, jnp.float32))
        u = geo.normalize(geo.cross(r, f))
        axes = jnp.stack([r, u, f], axis=-1)
    return Camera(pos=pos, axes=axes, fov=jnp.asarray(fov, jnp.float32))


def look_at(cam: Camera, point=(0.0, 0.0, 0.0)) -> Camera:
    """Recompute axes to face ``point`` with world-up reference
    (camera.cpp:35-39)."""
    point = jnp.asarray(point, jnp.float32)
    world_up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    f = geo.normalize(point - cam.pos)
    r = geo.normalize(geo.cross(f, world_up))
    u = geo.normalize(geo.cross(r, f))
    return cam._replace(axes=jnp.stack([r, u, f], axis=-1))


def hyperbolic_trajectory(
    cam: Camera, initial_distance, closest_distance, time
) -> Camera:
    """Conic-section flyby pose at normalized ``time`` in [0, 1]
    (camera.cpp:20-33).  Differentiable in all arguments."""
    initial_distance = jnp.asarray(initial_distance, jnp.float32)
    closest_distance = jnp.asarray(closest_distance, jnp.float32)
    time = jnp.asarray(time, jnp.float32)

    closest_sq = closest_distance**2
    a = -closest_sq / (-initial_distance + 2.0 * closest_distance)
    c = closest_distance + a
    b = jnp.sqrt(closest_sq + 2.0 * a * closest_distance)

    eased = (1.0 - jnp.cos(time * jnp.pi)) / 2.0
    x = -initial_distance + 2.0 * eased * initial_distance
    y = c - a * jnp.sqrt(1.0 + (x / b) ** 2)

    base_x = jnp.array(HYPERBOLIC_BASE_X, jnp.float32)
    base_y = jnp.array(HYPERBOLIC_BASE_Y, jnp.float32)
    pos = x * base_x + y * base_y
    return look_at(cam._replace(pos=pos))


def pixel_grid(width: int, height: int, dtype=jnp.float32):
    """Normalized device coordinates of pixel centers.

    Returns (u, v) arrays of shape (height, width) with u, v in (-1, 1),
    row 0 = TOP of the image (v decreasing with row index).  This matches the
    full-screen-quad interpolated ``uv`` of the reference
    (full_screen_quad.vert:7-10) after the usual GL bottom-up -> top-down image
    flip.
    """
    u = (2.0 * (jnp.arange(width, dtype=dtype) + 0.5)) / width - 1.0
    v = 1.0 - (2.0 * (jnp.arange(height, dtype=dtype) + 0.5)) / height
    return jnp.meshgrid(u, v, indexing="xy")


def generate_rays(cam: Camera, u, v, width, height):
    """Pinhole rays from NDC (black_hole.frag:859-863).

    Horizontal FOV: forward_len = 1/tan(fov*pi/360); v is scaled by the aspect
    ratio height/width.  Returns (origin (..., 3), dir (..., 3)).
    """
    forward_len = 1.0 / jnp.tan(cam.fov / 360.0 * jnp.pi)
    uv_vec = jnp.stack(
        [u, v * (height / width), jnp.broadcast_to(forward_len, u.shape)], axis=-1
    )
    direction = geo.normalize(geo.mat_vec(cam.axes, uv_vec))
    origin = jnp.broadcast_to(cam.pos, direction.shape)
    return origin, direction

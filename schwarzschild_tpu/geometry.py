"""Vector / frame math shared across the framework.

Conventions (match the reference renderer, see
/root/reference/assets/shaders/black_hole.frag:2-4):
  * right-handed, y-up world coordinates;
  * an orthonormal frame ("axes") is stored as a 3x3 matrix whose COLUMNS are
    (right, up, forward) — identical to the GLM ``mat3`` layout where
    ``axes[0]`` is the first column;
  * ``axes @ v`` maps local -> world, ``axes.T @ v`` maps world -> local.

All functions broadcast over arbitrary leading batch dimensions and are pure
jnp so they can be jitted/vmapped/differentiated freely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1e-7  # black_hole.frag:30

# numpy, not jnp: creating a device array at import time would initialize the
# JAX backend before callers can pick a platform (jax.config.update), which
# hangs imports outright when the TPU tunnel is unreachable.  jnp ops convert
# it on first use.
IDENTITY_AXES = np.eye(3, dtype=np.float32)


class Transform(NamedTuple):
    """Position + column frame — the PyTree replacement of the reference's
    Transform class (src/lib/Objects/Transform/transform.h:9-50).

    ``axes`` columns are (right, up, forward); use :func:`quat_to_axes` /
    :func:`angle_axis` for the quaternion setter and the ``calculate_*``
    helpers below for orthonormal recompletion (transform.cpp:48-56).
    """

    pos: jnp.ndarray  # (3,)
    axes: jnp.ndarray  # (3, 3)

    @property
    def right(self):
        return self.axes[..., :, 0]

    @property
    def up(self):
        return self.axes[..., :, 1]

    @property
    def forward(self):
        return self.axes[..., :, 2]

    def with_forward_from_right_up(self) -> "Transform":
        f = normalize(cross(self.right, self.up))
        return self._replace(axes=jnp.stack([self.right, self.up, f], -1))

    def with_right_from_up_forward(self) -> "Transform":
        r = normalize(cross(self.up, self.forward))
        return self._replace(axes=jnp.stack([r, self.up, self.forward], -1))

    def with_up_from_forward_right(self) -> "Transform":
        u = normalize(cross(self.forward, self.right))
        return self._replace(axes=jnp.stack([self.right, u, self.forward], -1))


def make_transform(pos=(0.0, 0.0, 0.0), axes=None) -> Transform:
    return Transform(
        pos=jnp.asarray(pos, jnp.float32),
        axes=IDENTITY_AXES if axes is None else jnp.asarray(axes, jnp.float32),
    )


def mat_vec(m, v):
    """``m @ v`` batched: m (..., 3, 3), v (..., 3) -> (..., 3)."""
    return (m * v[..., None, :]).sum(-1)


def mat_tvec(m, v):
    """``m.T @ v`` batched: m (..., 3, 3), v (..., 3) -> (..., 3)."""
    return (m * v[..., :, None]).sum(-2)


def dot(a, b):
    return (a * b).sum(-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(dot(v, v))


def normalize(v):
    return v / length(v)[..., None]


def safe_length(v, eps=1e-24):
    """|v| with a reverse-mode-safe zero: sqrt(max(v.v, eps)).

    Plain sqrt(dot(v, v)) has derivative inf at v=0, which turns into NaN
    gradients via the 0-cotangent-times-inf of masked lanes — the standard
    JAX where-mask pitfall.  At valid lanes (|v|^2 >> eps) this is bit-identical
    to length().

    eps must be a NORMAL f32 (>= ~1.2e-38), and so must every downstream
    square of sqrt(eps): TPUs flush f32 denormals to zero, so the former
    1e-30 default behaved as eps=0 on TPU and still emitted NaN gradients
    on zero-length lanes (CPU, which keeps denormals, was clean — the
    round-1 'TPU-only non-finite gradients' issue).  1e-24 keeps
    sqrt(eps) = 1e-12 and its square 1e-24 in normal range.
    """
    return jnp.sqrt(jnp.maximum(dot(v, v), eps))


def safe_normalize(v, eps=1e-24):
    """normalize(v) with finite gradients everywhere (0 maps to 0).

    Written as ``v * rsqrt(max(v.v, eps))`` — the form XLA:TPU canonicalizes
    every divide-by-sqrt variant into EXCEPT the broadcast stacked divide
    (``v / sqrt(...)[..., None]`` stays a true division and differs in the
    last ulp for ~60% of operands, measured on v5e).  Keeping every
    normalization in the canonical attractor form is what makes the Pallas
    kernels bit-equal to this jnp twin (PARITY_r05 root cause; see
    kernel._tangent_of and docs/tpu_cost_model.md section 9).
    """
    return v * jax.lax.rsqrt(jnp.maximum(dot(v, v), eps))[..., None]


def square_vector(v):
    """|v|^2 (black_hole.frag:357-359)."""
    return dot(v, v)


def distance(a, b):
    return length(a - b)


def reflect(incident, normal):
    """GLSL ``reflect``: I - 2*dot(N, I)*N."""
    return incident - 2.0 * dot(normal, incident)[..., None] * normal


def project(v, target):
    """Project v onto target (black_hole.frag:739-741)."""
    return (dot(v, target) / square_vector(target))[..., None] * target


def gram_schmidt(m):
    """Orthonormalize a column-frame keeping the direction of column 1 (up)
    fixed, exactly as black_hole.frag:744-753.

    m: (..., 3, 3) with columns (x, y, z); returns orthonormal frame.
    """
    c0 = m[..., :, 0]
    c1 = m[..., :, 1]
    c2 = m[..., :, 2]
    c0 = c0 - project(c0, c1)
    c2 = c2 - project(c2, c1) - project(c2, c0)
    c0 = normalize(c0)
    c1 = normalize(c1)
    c2 = normalize(c2)
    return jnp.stack([c0, c1, c2], axis=-1)


def rotate_vector(angle, v, axis=None):
    """Rotate ``v`` by ``angle`` (radians) about ``axis`` (default world up).

    Rodrigues rotation; replaces the reference's mouse-look helper
    (/root/reference/src/lib/utils/utils.cpp:6-18).
    """
    if axis is None:
        axis = jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32)
    axis = normalize(axis)
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    return (
        v * c
        + cross(axis, v) * s
        + axis * dot(axis, v)[..., None] * (1.0 - c)
    )


def quat_to_axes(q):
    """Unit quaternion (w, x, y, z) -> column frame, GLM ``glm::toMat3``
    convention (used by Transform::setAxes, transform.cpp:23-25)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # Rotation matrix (row-major entries); columns are the rotated basis
    # vectors, matching GLM's column-major mat3 layout.
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return r


def angle_axis(angle, axis):
    """Quaternion (w,x,y,z) from angle/axis — ``glm::angleAxis``."""
    axis = normalize(axis)
    half = angle / 2.0
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def min_positive(n1, n2):
    """Smallest positive of two numbers, -1 if neither positive
    (black_hole.frag:441-454)."""
    both = (n1 > 0) & (n2 > 0)
    res = jnp.where(both, jnp.minimum(n1, n2), jnp.where(n1 > 0, n1, jnp.where(n2 > 0, n2, -1.0)))
    return res

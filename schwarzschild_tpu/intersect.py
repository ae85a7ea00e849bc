"""Analytic ray-primitive intersections over the scene struct-of-arrays.

Replaces black_hole.frag:441-822.  Instead of the reference's per-object
``switch`` dispatch and linear closest-hit scan (frag:697-736, 805-814), every
primitive of every type is intersected vectorized (rays x primitives) and the
closest hit is an argmin reduction — branch-free, which is what the TPU VPU
wants.  Tie-breaking matches the reference: candidates are ordered
[black hole, test rays, spheres, planes, disks, hollow disks, cylinders,
rectangles, boxes] and argmin keeps the first minimum, mirroring the strict
``hit.dist < closest.dist`` replacement of the linear scan.

All math is "gradient-safe": divisions and normalizations that can hit zero in
masked-out lanes are guarded so that reverse-mode AD never sees NaN * 0.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from . import geometry as geo
from .scene import (
    OBJECT_TYPE_BOX,
    OBJECT_TYPE_CYLINDER,
    OBJECT_TYPE_DISK,
    OBJECT_TYPE_HOLLOW_DISK,
    OBJECT_TYPE_PLANE,
    OBJECT_TYPE_RECTANGLE,
    OBJECT_TYPE_SPECIAL,
    OBJECT_TYPE_SPHERE,
    OBJECT_TYPE_TEST_RAY_CURVED,
    OBJECT_TYPE_TEST_RAY_FLAT,
    Scene,
)

_TINY = 1e-20
# Division guards must be >= ~1e-19: reverse-mode d(a/b)/db = -a/b^2, and on
# TPU (flush-to-zero, no f32 denormals) a guard of 1e-20 squares to 1e-40 -> 0
# -> inf -> NaN gradients, while CPU keeps the denormal and stays finite.
# 1e-12 squares to 1e-24 (comfortably normal); every validity test that gates
# these denominators triggers at >= 1e-7, so no valid lane's forward value can
# change.  This was the root cause of the round-1 "TPU-only non-finite
# gradient lanes" known issue.
_DIV_GUARD = 1e-12
# numpy scalar, not jnp: no device-array creation (= backend init) at import.
_INF = np.float32(np.inf)


def _safe_div(a, b):
    """a / b with b guarded away from 0 (sign-preserving)."""
    guarded = jnp.where(jnp.abs(b) < _DIV_GUARD,
                        jnp.where(b < 0, -_DIV_GUARD, _DIV_GUARD), b)
    return a / guarded


def _safe_normalize(v):
    return geo.safe_normalize(v, _TINY)


def _safe_sqrt(x):
    # max with a positive floor, not 0: d/dx sqrt(max(x, 0)) at x<0 is
    # inf * 0 = NaN under reverse-mode AD (missed-ray lanes hit this
    # constantly); with a positive floor the max's zero-branch gradient
    # kills the inf before it forms.
    return jnp.sqrt(jnp.maximum(x, _TINY))


def _safe_asin(x):
    # 1e-7 margin keeps asin' finite at |x| = 1 (exact pole hits); the
    # forward perturbation is < 4.5e-4 rad, well under a texel of UV.
    return jnp.arcsin(jnp.clip(x, -1.0 + 1e-7, 1.0 - 1e-7))


class TestRay(NamedTuple):
    """Debug test-ray overlay (black_hole.frag:182-192).

    ``points`` is a fixed-size (K, 3) array with ``num_points`` valid entries
    (the CPU-integrated geodesic polyline, main.cpp:94-124); the flat ray is
    the un-deflected straight ray for visual comparison.
    """

    points: jnp.ndarray  # (K, 3)
    num_points: jnp.ndarray  # () int32
    flat_origin: jnp.ndarray  # (3,)
    flat_dir: jnp.ndarray  # (3,)


class Hit(NamedTuple):
    """Closest-hit record (HitInfo, black_hole.frag:199-206) plus the fields
    shading needs gathered from the winning candidate."""

    valid: jnp.ndarray  # (...,) bool
    dist: jnp.ndarray  # (...,)
    point: jnp.ndarray  # (..., 3)
    tangent: jnp.ndarray  # (..., 3)
    bitangent: jnp.ndarray  # (..., 3)
    normal: jnp.ndarray  # (..., 3)
    uv: jnp.ndarray  # (..., 2)
    obj_type: jnp.ndarray  # (...,) int32
    mat_idx: jnp.ndarray  # (...,) int32
    plane_tex_offset: jnp.ndarray  # (..., 2) — valid for PLANE hits
    plane_tex_size: jnp.ndarray  # (..., 2)
    plane_repeat: jnp.ndarray  # (...,) bool


class _Cand(NamedTuple):
    """Per-candidate hit fields with a trailing candidate axis."""

    valid: jnp.ndarray  # (..., N)
    dist: jnp.ndarray  # (..., N)
    point: jnp.ndarray  # (..., N, 3)
    tangent: jnp.ndarray
    bitangent: jnp.ndarray
    normal: jnp.ndarray
    uv: jnp.ndarray  # (..., N, 2)
    obj_type: jnp.ndarray  # (..., N) int32
    mat_idx: jnp.ndarray  # (..., N) int32
    plane_tex_offset: jnp.ndarray  # (..., N, 2)
    plane_tex_size: jnp.ndarray
    plane_repeat: jnp.ndarray  # (..., N) bool


def _default_plane_fields(batch_n):
    return (
        jnp.zeros(batch_n + (2,), jnp.float32),
        jnp.ones(batch_n + (2,), jnp.float32),
        jnp.ones(batch_n, dtype=bool),
    )


def _mk_cand(valid, dist, point, tangent, bitangent, normal, uv, obj_type, mat_idx,
             plane_fields=None):
    batch_n = valid.shape
    if plane_fields is None:
        plane_fields = _default_plane_fields(batch_n)
    return _Cand(
        valid=valid,
        dist=jnp.where(valid, dist, _INF),
        point=point,
        tangent=tangent,
        bitangent=bitangent,
        normal=normal,
        uv=uv,
        obj_type=jnp.broadcast_to(obj_type, batch_n).astype(jnp.int32),
        mat_idx=jnp.broadcast_to(mat_idx, batch_n).astype(jnp.int32),
        plane_tex_offset=plane_fields[0],
        plane_tex_size=plane_fields[1],
        plane_repeat=plane_fields[2],
    )


def _phi_of(local_x, local_z):
    """atan(x, z) wrapped to [0, 2pi) (frag:215-216 et al.).

    arctan2's gradient is (z, -x) / (x^2 + z^2); lanes within ~1e-19 of the
    pole axis flush that denominator to zero on TPU (no f32 denormals) and
    emit NaN cotangents even though the lane is masked invalid downstream.
    Substituting BOTH inputs on degenerate lanes (double-where) zeroes their
    gradient path entirely; the forward value only changes for r < 1e-12 —
    sub-texel, and phi is undefined on the axis anyway.
    """
    degenerate = local_x * local_x + local_z * local_z < _DIV_GUARD * _DIV_GUARD
    x = jnp.where(degenerate, 0.0, local_x)
    z = jnp.where(degenerate, 1.0, local_z)
    phi = jnp.arctan2(x, z)
    return jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)


def _within(lam, max_lambda):
    """lambda window test: lam >= 0 and (max_lambda < 0 or lam <= max_lambda)."""
    return (lam >= 0.0) & ((max_lambda < 0.0) | (lam <= max_lambda))


# ---------------------------------------------------------------------------
# Per-type candidate intersections.  Rays: origin/direction (..., 3),
# max_lambda (...,); primitives enter with a leading N axis and broadcast.
# ---------------------------------------------------------------------------


def sphere_candidates(origin, direction, max_lambda, pos, axes, radius,
                      mat_idx, obj_type=OBJECT_TYPE_SPHERE):
    """Quadratic sphere intersection + spherical tangent space
    (frag:457-478, 209-232)."""
    o = origin[..., None, :]
    d = direction[..., None, :]
    ml = max_lambda[..., None]

    oc = o - pos  # (..., N, 3)
    d_oc = geo.dot(d, oc)
    disc = d_oc * d_oc - geo.square_vector(oc) + radius * radius
    sqrt_d = _safe_sqrt(disc)
    lam1 = -d_oc - sqrt_d
    lam2 = -d_oc + sqrt_d
    lam = geo.min_positive(lam1, lam2)
    valid = (disc >= 0.0) & _within(lam, ml)

    point = o + lam[..., None] * d
    disp = point - pos
    normal = _safe_normalize(disp)
    local = geo.mat_tvec(axes, disp)
    phi = _phi_of(local[..., 0], local[..., 2])
    theta = _safe_asin(_safe_div(local[..., 1], radius))
    uv = jnp.stack([phi / (2.0 * jnp.pi), theta / jnp.pi + 0.5], axis=-1)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    tangent_local = jnp.stack([cp, jnp.zeros_like(cp), -sp], axis=-1)
    bitangent_local = jnp.stack([sp * ct, st, cp * ct], axis=-1)
    tangent = geo.mat_vec(axes, tangent_local)
    bitangent = geo.mat_vec(axes, bitangent_local)

    dist = geo.safe_length(point - o)
    return _mk_cand(valid, dist, point, tangent, bitangent, normal, uv,
                    obj_type, mat_idx)


def _plane_lambda(o, d, ml, pos, axes):
    normal = axes[..., :, 1]
    denom = geo.dot(normal, d)
    lam = _safe_div(geo.dot(normal, pos - o), denom)
    valid = (jnp.abs(denom) >= geo.EPSILON) & _within(lam, ml)
    return normal, lam, valid


def plane_candidates(origin, direction, max_lambda, planes):
    """Infinite plane + plane tangent space (frag:483-499, 234-247)."""
    o = origin[..., None, :]
    d = direction[..., None, :]
    ml = max_lambda[..., None]
    pos, axes = planes.pos, planes.axes

    normal, lam, valid = _plane_lambda(o, d, ml, pos, axes)
    point = o + d * lam[..., None]
    disp = point - pos
    local = geo.mat_tvec(axes, disp)
    uv = jnp.stack([local[..., 0], 1.0 - local[..., 2]], axis=-1)
    tangent = jnp.broadcast_to(axes[..., :, 0], point.shape)
    bitangent = jnp.broadcast_to(-axes[..., :, 2], point.shape)
    nrm = jnp.broadcast_to(axes[..., :, 1], point.shape)
    dist = geo.safe_length(point - o)

    batch_n = valid.shape
    plane_fields = (
        jnp.broadcast_to(planes.texture_offset, batch_n + (2,)),
        jnp.broadcast_to(planes.texture_size, batch_n + (2,)),
        jnp.broadcast_to(planes.repeat_texture, batch_n),
    )
    return _mk_cand(valid, dist, point, tangent, bitangent, nrm, uv,
                    OBJECT_TYPE_PLANE, planes.mat_idx, plane_fields)


def _radial_frame(pos, axes, point, radius_like):
    """Shared disk/hollow-disk tangent space (frag:249-295):
    tangent = normalize(disp), bitangent = axes @ (cos phi, 0, -sin phi),
    normal = up axis."""
    disp = point - pos
    local = geo.mat_tvec(axes, disp)
    phi = _phi_of(local[..., 0], local[..., 2])
    # safe_length: a zero-length local (ray through the disk center axis,
    # masked invalid downstream) must not emit inf * 0 = NaN in reverse mode.
    r_local = geo.safe_length(local)
    tangent = _safe_normalize(disp)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    bitangent = geo.mat_vec(axes, jnp.stack([cp, jnp.zeros_like(cp), -sp], -1))
    normal = jnp.broadcast_to(axes[..., :, 1], point.shape)
    return phi, r_local, tangent, bitangent, normal


def disk_candidates(origin, direction, max_lambda, disks):
    """Plane hit restricted to a disk (frag:502-508, 249-271)."""
    o = origin[..., None, :]
    d = direction[..., None, :]
    ml = max_lambda[..., None]
    pos, axes, radius = disks.pos, disks.axes, disks.radius

    _, lam, valid = _plane_lambda(o, d, ml, pos, axes)
    point = o + d * lam[..., None]
    valid = valid & (geo.square_vector(point - pos) <= radius * radius)

    phi, r_local, tangent, bitangent, normal = _radial_frame(pos, axes, point, radius)
    uv = jnp.stack([_safe_div(r_local, radius), phi / (2.0 * jnp.pi)], axis=-1)
    dist = geo.safe_length(point - o)
    return _mk_cand(valid, dist, point, tangent, bitangent, normal, uv,
                    OBJECT_TYPE_DISK, disks.mat_idx)


def hollow_disk_candidates(origin, direction, max_lambda, hd):
    """Annulus (frag:510-517, 273-295) — the accretion disk."""
    o = origin[..., None, :]
    d = direction[..., None, :]
    ml = max_lambda[..., None]
    pos, axes = hd.pos, hd.axes
    inner, outer = hd.inner_radius, hd.outer_radius

    _, lam, valid = _plane_lambda(o, d, ml, pos, axes)
    point = o + d * lam[..., None]
    sq = geo.square_vector(point - pos)
    valid = valid & (sq >= inner * inner) & (sq <= outer * outer)

    phi, r_local, tangent, bitangent, normal = _radial_frame(pos, axes, point, outer)
    uv = jnp.stack(
        [_safe_div(r_local - inner, outer - inner), phi / (2.0 * jnp.pi)], axis=-1
    )
    dist = geo.safe_length(point - o)
    return _mk_cand(valid, dist, point, tangent, bitangent, normal, uv,
                    OBJECT_TYPE_HOLLOW_DISK, hd.mat_idx)


def cylinder_candidates(origin, direction, max_lambda, pos, axes, height,
                        radius, mat_idx, obj_type=OBJECT_TYPE_CYLINDER):
    """Open lateral cylinder (frag:523-570, 297-318).

    Also used for the test-ray tubes (frag:761-793), hence the obj_type
    parameter and explicit SoA-field arguments.
    """
    o = origin[..., None, :]
    d = direction[..., None, :]
    ml = max_lambda[..., None]

    axis = axes[..., :, 1]
    local_o = geo.mat_tvec(axes, o - pos)
    local_d = geo.mat_tvec(axes, d)

    a = local_o[..., 0] * local_d[..., 0] + local_o[..., 2] * local_d[..., 2]
    dir_par_sq = local_d[..., 0] ** 2 + local_d[..., 2] ** 2
    origin_par_sq = local_o[..., 0] ** 2 + local_o[..., 2] ** 2
    disc = a * a + dir_par_sq * (radius * radius - origin_par_sq)
    sqrt_d = _safe_sqrt(disc)
    lam1 = _safe_div(-(a + sqrt_d), dir_par_sq)
    lam2 = _safe_div(-(a - sqrt_d), dir_par_sq)

    p1 = o + d * lam1[..., None]
    p2 = o + d * lam2[..., None]
    in1 = _in_height(p1, pos, axis, height)
    in2 = _in_height(p2, pos, axis, height)

    lam = jnp.where(
        in1 & in2,
        geo.min_positive(lam1, lam2),
        jnp.where(in1, lam1, jnp.where(in2, lam2, -1.0)),
    )
    valid = (disc >= 0.0) & (in1 | in2) & _within(lam, ml)
    # The reference divides by dir_par_sq without a guard; a ray exactly
    # parallel to the axis yields 0/0=NaN there and never hits — our guard
    # gives huge lambdas that fail the height/window tests, same outcome.
    point = o + d * lam[..., None]

    disp = point - pos
    normal = _safe_normalize(disp)  # reference quirk: includes axial component
    bitangent = jnp.broadcast_to(axis, point.shape)
    local = geo.mat_tvec(axes, disp)
    phi = _phi_of(local[..., 0], local[..., 2])
    uv = jnp.stack([phi / (2.0 * jnp.pi), _safe_div(local[..., 1], height)], -1)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    tangent = geo.mat_vec(axes, jnp.stack([cp, jnp.zeros_like(cp), -sp], -1))
    dist = geo.safe_length(point - o)
    return _mk_cand(valid, dist, point, tangent, bitangent, normal, uv,
                    obj_type, mat_idx)


def _in_height(p, pos, axis, height):
    t = geo.dot(p - pos, axis)
    return (t >= 0.0) & (t <= height)


def _rectangle_core(o, d, ml, pos, axes, width, height):
    """Shared rectangle math: plane hit + extent test + tangent space
    (frag:573-584, 320-333)."""
    _, lam, valid = _plane_lambda(o, d, ml, pos, axes)
    point = o + d * lam[..., None]
    disp = point - pos
    alpha = geo.dot(disp, axes[..., :, 0])
    beta = geo.dot(disp, axes[..., :, 2])
    valid = valid & (alpha >= 0.0) & (alpha <= width) & (beta >= 0.0) & (beta <= height)

    local = geo.mat_tvec(axes, disp)
    uv = jnp.stack(
        [_safe_div(local[..., 0], width), 1.0 - _safe_div(local[..., 2], height)],
        axis=-1,
    )
    tangent = jnp.broadcast_to(axes[..., :, 0], point.shape)
    bitangent = jnp.broadcast_to(-axes[..., :, 2], point.shape)
    normal = jnp.broadcast_to(axes[..., :, 1], point.shape)
    dist = geo.safe_length(point - o)
    return valid, dist, point, tangent, bitangent, normal, uv


def rectangle_candidates(origin, direction, max_lambda, rects):
    o = origin[..., None, :]
    d = direction[..., None, :]
    ml = max_lambda[..., None]
    valid, dist, point, tangent, bitangent, normal, uv = _rectangle_core(
        o, d, ml, rects.pos, rects.axes, rects.width, rects.height
    )
    return _mk_cand(valid, dist, point, tangent, bitangent, normal, uv,
                    OBJECT_TYPE_RECTANGLE, rects.mat_idx)


def box_candidates(origin, direction, max_lambda, boxes):
    """Box = closest of 6 precomputed face rectangles + 4x3 atlas UV
    (frag:586-695).  One candidate per box; the face reduction happens here."""
    o = origin[..., None, None, :]  # (..., 1, 1, 3) vs faces (N, 6, ...)
    d = direction[..., None, None, :]
    ml = max_lambda[..., None, None]

    valid, dist, point, tangent, bitangent, normal, uv = _rectangle_core(
        o, d, ml, boxes.face_pos, boxes.face_axes, boxes.face_width, boxes.face_height
    )
    # Atlas UV (frag:667-692): offsets per face, then /4, /3.
    uv = (uv + boxes.atlas_offset) / jnp.array([4.0, 3.0], jnp.float32)

    dist = jnp.where(valid, dist, _INF)

    # Closest-face reduction via elementwise selects (first-min tie-break ==
    # the reference's `hit.dist < res.dist`, frag:658) — no gathers.
    def face_tuple(i):
        return (valid[..., i], dist[..., i], point[..., i, :],
                tangent[..., i, :], bitangent[..., i, :], normal[..., i, :],
                uv[..., i, :])

    best = face_tuple(0)
    for i in range(1, 6):
        cand = face_tuple(i)
        better = cand[1] < best[1]
        bv = better[..., None]
        best = (
            jnp.where(better, cand[0], best[0]),
            jnp.where(better, cand[1], best[1]),
            jnp.where(bv, cand[2], best[2]),
            jnp.where(bv, cand[3], best[3]),
            jnp.where(bv, cand[4], best[4]),
            jnp.where(bv, cand[5], best[5]),
            jnp.where(bv, cand[6], best[6]),
        )

    return _mk_cand(
        best[0], best[1], best[2], best[3], best[4], best[5], best[6],
        OBJECT_TYPE_BOX, boxes.mat_idx,
    )


def black_hole_candidate(origin, direction, max_lambda, r_s):
    """The event horizon: an ordinary scene sphere of radius r_s at the origin
    (frag:104, 757-758) shading opaque black (OBJECT_TYPE_SPECIAL)."""
    zero = jnp.zeros((1, 3), jnp.float32)
    eye = jnp.eye(3, dtype=jnp.float32)[None]
    return sphere_candidates(
        origin, direction, max_lambda,
        zero, eye, jnp.asarray(r_s, jnp.float32)[None],
        jnp.zeros((1,), jnp.int32), obj_type=OBJECT_TYPE_SPECIAL,
    )


def test_ray_candidates(origin, direction, max_lambda, test_ray: TestRay,
                        radius=0.025, extended_length=1000.0, r_s=1.0):
    """Test-ray tubes (frag:760-803): one flat cylinder along the straight ray
    plus a chain of cylinders through the integrated points; the final segment
    is extended to ``extended_length`` when the geodesic fell into the hole
    (frag:782-784 tests length < 1 because the reference fixes r_s = 1; here
    the horizon radius ``r_s`` is threaded through)."""
    k = test_ray.points.shape[0]
    npts = test_ray.num_points

    def seg_frame(diff):
        # gram_schmidt(mat3(diff.xzy, diff, diff.zxy)) (frag:764, 789)
        xzy = diff[..., jnp.array([0, 2, 1])]
        zxy = diff[..., jnp.array([2, 0, 1])]
        return geo.gram_schmidt(jnp.stack([xzy, diff, zxy], axis=-1))

    # Flat tube.
    flat_axes = seg_frame(test_ray.flat_dir)[None]
    flat = cylinder_candidates(
        origin, direction, max_lambda,
        test_ray.flat_origin[None], flat_axes,
        jnp.asarray([extended_length], jnp.float32),
        jnp.asarray([radius], jnp.float32),
        jnp.zeros((1,), jnp.int32), obj_type=OBJECT_TYPE_TEST_RAY_FLAT,
    )

    # Curved tube chain: segments i -> i+1 for i < num_points - 1.
    p0 = test_ray.points[:-1]
    p1 = test_ray.points[1:]
    diff = p1 - p0
    seg_len = geo.length(diff)
    seg_idx = jnp.arange(k - 1)
    active = (seg_idx < npts - 1) & (npts >= 2)
    # Last valid segment extended when the final point is inside the horizon.
    last_inside = geo.length(test_ray.points[jnp.maximum(npts - 1, 0)]) < r_s
    is_last = seg_idx == npts - 2
    seg_len = jnp.where(is_last & last_inside, extended_length, seg_len)

    axes = seg_frame(diff)
    curved = cylinder_candidates(
        origin, direction, max_lambda,
        p0, axes, seg_len,
        jnp.full((k - 1,), radius, jnp.float32),
        jnp.zeros((k - 1,), jnp.int32), obj_type=OBJECT_TYPE_TEST_RAY_CURVED,
    )
    curved = curved._replace(
        valid=curved.valid & active,
        dist=jnp.where(active, curved.dist, _INF),
    )
    return flat, curved


def _hit_from_cand_index(c: _Cand, i) -> Hit:
    """Slice candidate i out of a _Cand (static index)."""
    return Hit(
        valid=c.valid[..., i], dist=c.dist[..., i], point=c.point[..., i, :],
        tangent=c.tangent[..., i, :], bitangent=c.bitangent[..., i, :],
        normal=c.normal[..., i, :], uv=c.uv[..., i, :],
        obj_type=c.obj_type[..., i], mat_idx=c.mat_idx[..., i],
        plane_tex_offset=c.plane_tex_offset[..., i, :],
        plane_tex_size=c.plane_tex_size[..., i, :],
        plane_repeat=c.plane_repeat[..., i],
    )


def _merge_hits(a: Hit, b: Hit) -> Hit:
    """Keep the closer hit; ties keep ``a`` (the reference's linear scan only
    replaces on strictly smaller dist, frag:811).  Pure elementwise selects —
    deliberately NO argmin/take_along_axis, which lower to per-pixel gathers
    and dominate the pass cost on TPU."""
    better = b.dist < a.dist
    bv = better[..., None]
    return Hit(
        valid=jnp.where(better, b.valid, a.valid),
        dist=jnp.where(better, b.dist, a.dist),
        point=jnp.where(bv, b.point, a.point),
        tangent=jnp.where(bv, b.tangent, a.tangent),
        bitangent=jnp.where(bv, b.bitangent, a.bitangent),
        normal=jnp.where(bv, b.normal, a.normal),
        uv=jnp.where(bv, b.uv, a.uv),
        obj_type=jnp.where(better, b.obj_type, a.obj_type),
        mat_idx=jnp.where(better, b.mat_idx, a.mat_idx),
        plane_tex_offset=jnp.where(bv, b.plane_tex_offset, a.plane_tex_offset),
        plane_tex_size=jnp.where(bv, b.plane_tex_size, a.plane_tex_size),
        plane_repeat=jnp.where(better, b.plane_repeat, a.plane_repeat),
    )


def _reduce_cand(c: _Cand, best: Optional[Hit] = None) -> Hit:
    n = c.valid.shape[-1]
    start = 0
    if best is None:
        best = _hit_from_cand_index(c, 0)
        start = 1
    for i in range(start, n):
        best = _merge_hits(best, _hit_from_cand_index(c, i))
    return best


def intersect_scene(
    origin,
    direction,
    max_lambda,
    sc: Scene,
    r_s=1.0,
    test_ray: Optional[TestRay] = None,
) -> Hit:
    """Closest hit against the black hole + the whole scene (frag:755-822).

    ``max_lambda`` < 0 means an unbounded ray.  Returns a :class:`Hit` with
    the ray batch shape.
    """
    cands = [black_hole_candidate(origin, direction, max_lambda, r_s)]
    if test_ray is not None:
        flat, curved = test_ray_candidates(origin, direction, max_lambda,
                                           test_ray, r_s=r_s)
        cands.extend([flat, curved])
    if sc.spheres.radius.shape[0]:
        cands.append(
            sphere_candidates(origin, direction, max_lambda, sc.spheres.pos,
                              sc.spheres.axes, sc.spheres.radius, sc.spheres.mat_idx)
        )
    if sc.planes.mat_idx.shape[0]:
        cands.append(plane_candidates(origin, direction, max_lambda, sc.planes))
    if sc.disks.mat_idx.shape[0]:
        cands.append(disk_candidates(origin, direction, max_lambda, sc.disks))
    if sc.hollow_disks.mat_idx.shape[0]:
        cands.append(hollow_disk_candidates(origin, direction, max_lambda, sc.hollow_disks))
    if sc.cylinders.mat_idx.shape[0]:
        cands.append(
            cylinder_candidates(origin, direction, max_lambda, sc.cylinders.pos,
                                sc.cylinders.axes, sc.cylinders.height,
                                sc.cylinders.radius, sc.cylinders.mat_idx)
        )
    if sc.rectangles.mat_idx.shape[0]:
        cands.append(rectangle_candidates(origin, direction, max_lambda, sc.rectangles))
    if sc.boxes.mat_idx.shape[0]:
        cands.append(box_candidates(origin, direction, max_lambda, sc.boxes))

    # Candidate order (bh, test rays, spheres, ..., boxes) + first-wins ties
    # reproduces the reference's scan order for same-type objects and for the
    # BH-first rule.  Known deviation (exact float-tie only): across DIFFERENT
    # primitive types the reference scans objects[] in scene insertion order
    # (frag:805-814), while this fixed per-type order can pick the other
    # object when two hits are bit-identical in distance (e.g. a coplanar disk
    # and rectangle).  Reproducing insertion-order ties would need interleaved
    # per-object reduction; measure-zero in every shipped scene.
    best = None
    for c in cands:
        best = _reduce_cand(c, best)
    return best

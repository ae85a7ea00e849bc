"""Full-scene Pallas march kernel (configs 3-4 fast path).

Architecture — hit-segment recording (the "two-phase" design from SURVEY
section 7, refined):

  * the kernel marches the geodesic exactly like kernel.py and, per segment,
    runs VALIDITY-ONLY intersection tests against every scene primitive
    (scalar primitive parameters broadcast from SMEM over the ray lanes);
  * when a segment hits something, the kernel records the segment itself —
    (segment start, direction, length) — into one of K slots and marches on
    (the reference only stops on OPAQUE hits, which depend on textures the
    kernel cannot see); if the closest hit in the segment is the event
    horizon, the ray stops (captures are always opaque black, frag:366);
  * outside, the recorded segments are re-intersected with the fully-featured
    jnp ``intersect_scene`` + ``shade`` (identical closest-hit semantics, so
    the recomputed hit matches what the kernel detected), and composed
    additively in slot order with the reference's first-opaque cutoff
    (frag:930-932) and final background (frag:935).

Cost: 100 in-kernel validity steps + at most K jnp intersect/shade passes,
vs the dense renderer's 100 full passes.  Slot passes k >= 1 are COMPACTED
by default (gather active lanes -> small pass -> scatter-add back): only a
few % of rays record a second hit, and TPU texture gathers are per-index
latency-bound, so a full-batch trailing pass pays for every idle lane (see
``render_fast`` ``compact_slots``).

Deviation (documented + detected): a ray crossing more than K non-opaque hits
drops the extras; K=4 covers every shipped scene (the reference demo has no
ray with more than 3 translucent crossings).  The kernel counts ALL hits
(``nhits``, uncapped), so ``render_fast`` detects overflow and warns / returns
the overflowed-ray count (``overflow=`` kwarg) instead of deviating silently.
Captured rays whose capture slot was dropped still composite opaque black
(never background) — the shadow cannot leak sky.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import camera as cam_mod
from . import geometry as geo
from . import physics
from .config import RenderConfig
from .intersect import intersect_scene
from .render import glsl_rand, pixel_hash_rand
from .scene import Scene
from .shading import CROSSHAIR_COLOR, crosshair_mask, get_background, shade
from .textures import Texture, TextureStack

STATUS_MARCHING = 0.0
STATUS_CAPTURED = 1.0
STATUS_ESCAPED = 2.0
STATUS_FLAT_FINISH = 3.0
# The segment's closest hit was a provably-opaque primitive: the march
# stopped there (the reference's first-opaque break, frag:930-932, pulled
# into the kernel for primitives whose opacity is knowable without
# sampling textures — see _opaque_flags).
STATUS_HIT_OPAQUE = 4.0

_EPS = 1e-7


def _test_ray_cylinder_rows(test_ray, r_s, radius=0.025,
                            extended_length=1000.0):
    """Debug test-ray tubes (frag:760-803) as cylinder-table rows for the
    kernel's validity test: the straight (flat, green) tube plus the chain of
    curved (red) segment tubes; the final segment is extended when the
    geodesic fell through the horizon (frag:782-784, radius test vs r_s).

    Inactive chain slots get height=-1 (can never pass the y in [0, height]
    test) and an identity frame (no NaNs into SMEM).
    """
    from . import geometry as geo

    f32 = jnp.float32
    pts = jnp.asarray(test_ray.points, f32)
    npts = test_ray.num_points
    k = pts.shape[0] - 1

    def seg_frame(diff):
        xzy = diff[..., jnp.array([0, 2, 1])]
        zxy = diff[..., jnp.array([2, 0, 1])]
        return geo.gram_schmidt(jnp.stack([xzy, diff, zxy], axis=-1))

    p0 = pts[:-1]
    diff = pts[1:] - p0
    seg_idx = jnp.arange(k)
    active = (seg_idx < npts - 1) & (npts >= 2)
    seg_len = geo.length(diff)
    last_inside = geo.length(pts[jnp.maximum(npts - 1, 0)]) < r_s
    is_last = seg_idx == npts - 2
    seg_len = jnp.where(is_last & last_inside, f32(extended_length), seg_len)
    height = jnp.where(active, seg_len, f32(-1.0))

    frames = seg_frame(diff)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=f32), frames.shape)
    frames = jnp.where(active[:, None, None], frames, eye)

    def rows(pos, fr, h, rad):
        return jnp.concatenate([
            pos, fr[..., :, 0], fr[..., :, 1], fr[..., :, 2],
            h[..., None], jnp.full_like(h[..., None], rad)], axis=-1)

    curved = rows(p0, frames, height, radius)
    flat = rows(jnp.asarray(test_ray.flat_origin, f32)[None],
                seg_frame(jnp.asarray(test_ray.flat_dir, f32))[None],
                jnp.asarray([extended_length], f32), radius)
    return jnp.concatenate([flat, curved], axis=0)


def _opaque_flags(sc: Scene, tex):
    """Per-primitive "provably opaque at EVERY sample" flags, or None.

    A hit on such a primitive always shades alpha == 1, so the march can
    stop there — the reference's first-opaque break (frag:930-932) pulled
    into the kernel.  Provable without sampling (mirrors shade()):

      * material color alpha == 1 (the no-texture and plane-outside-window
        fallback, shade()'s ``base_color``), AND
      * no texture, or the texture's min alpha over its ENTIRE PADDED layer
        == 1.  The whole layer, not just the true region: bilinear samples
        at the true-region edge blend the zero-alpha PADDING texels
        (reference-faithful stack padding, image_utils.cpp:89-98), and mip
        levels of a padded layer inherit that pollution — so a texture
        smaller than the stack max is never provably opaque, while a
        full-size all-opaque one is (its mips box-filter alpha==1 to
        alpha==1).  AND
      * double-sided normals (a culled backface shades TRANSPARENT black,
        shade()'s ``culled`` — frag:372 — so single-sided is never provable).

    Needs CONCRETE materials/texture data: when either is traced (e.g.
    inverse rendering optimizing texels), returns None and the march keeps
    the record-and-continue behavior.
    """
    try:
        m = sc.materials
        color_a = np.asarray(m.color)[:, 3]
        tex_idx = np.asarray(m.texture_index)
        dbl = np.asarray(m.double_sided_normals)
        if tex is not None:
            # Min over the WHOLE padded layer (see docstring: edge samples
            # and mips blend the padding).  Reduce ON DEVICE and pull one
            # scalar per layer — np.asarray(tex.data) would drag the whole
            # stack through the host link at trace time (minutes through
            # the tunneled TPU in this environment).
            tmin = np.asarray(jnp.min(tex.data[..., 3], axis=(1, 2)))
        else:
            tmin = None
        def mat_opaque(mat_idx):
            mi = np.asarray(mat_idx).astype(int)
            if mi.size == 0:
                return np.zeros(0, np.float32)
            mi = np.clip(mi, 0, color_a.shape[0] - 1)
            # EXACTLY 1: the first-opaque break tests rgba.a == 1.0
            # (frag:931), so alpha > 1 keeps accumulating in the reference.
            # Exact 1s survive the samplers exactly (lerps of equal
            # endpoints and box-filter means of 1s are 1 in f32).
            a_ok = color_a[mi] == 1.0
            ti = tex_idx[mi]
            if tmin is None:
                t_ok = ti < 0
            else:
                t_ok = (ti < 0) | (tmin[np.clip(ti, 0, len(tmin) - 1)] == 1.0)
            return (a_ok & t_ok & dbl[mi]).astype(np.float32)

        flags = {name: mat_opaque(getattr(sc, name).mat_idx)
                 for name in ("spheres", "planes", "disks", "hollow_disks",
                              "cylinders", "rectangles")}
        flags["boxes"] = np.repeat(mat_opaque(sc.boxes.mat_idx), 6)
        return flags
    except Exception:  # traced scene / texture — nothing provable
        return None


def _pack_scene_smem(sc: Scene, test_ray=None, r_s=1.0, tex=None):
    """Scene -> dict of f32 SMEM tables for the kernel.

    Every table carries a trailing "provably opaque" column (see
    :func:`_opaque_flags`; all-zero when unprovable or ``tex`` not given):

    planes: (N,7)  [pos, normal, opq]
    disks: (N,8)   [pos, normal, radius^2, opq]
    hollow: (N,9)  [pos, normal, inner^2, outer^2, opq]
    spheres: (N,5) [pos, radius, opq]
    cylinders: (N,15) [pos, axes(cols flat), height, radius, opq]
    rects: (N,15) [pos, ax0, normal(ax1), ax2, w, h, opq]
    boxes -> 6 rect rows each

    ``test_ray``: debug tubes appended to the cylinders table — the kernel
    needs only validity (record-a-slot), the slot re-intersection shades the
    red/green tube colors via ``intersect_scene(..., test_ray=...)``.  Tube
    hits are opaque (the reference's tube colors have alpha 1, frag:191-192).
    """
    out = {}
    opq = _opaque_flags(sc, tex) if tex is not None else None
    if opq is None:
        opq = {name: np.zeros(getattr(sc, name).mat_idx.shape[0], np.float32)
               for name in ("spheres", "planes", "disks", "hollow_disks",
                            "cylinders", "rectangles")}
        opq["boxes"] = np.zeros(sc.boxes.mat_idx.shape[0] * 6, np.float32)

    def col(name):
        return jnp.asarray(opq[name], jnp.float32)[:, None]

    def jn(x):
        # jnp (not numpy) so the packing traces under jit with a traced scene.
        return jnp.asarray(x, jnp.float32)

    if sc.spheres.radius.shape[0]:
        out["spheres"] = jnp.concatenate(
            [jn(sc.spheres.pos), jn(sc.spheres.radius)[:, None],
             col("spheres")], 1)
    if sc.planes.mat_idx.shape[0]:
        out["planes"] = jnp.concatenate(
            [jn(sc.planes.pos), jn(sc.planes.axes)[:, :, 1],
             col("planes")], 1)
    if sc.disks.mat_idx.shape[0]:
        out["disks"] = jnp.concatenate([
            jn(sc.disks.pos), jn(sc.disks.axes)[:, :, 1],
            (jn(sc.disks.radius) ** 2)[:, None], col("disks")], 1)
    if sc.hollow_disks.mat_idx.shape[0]:
        out["hollow"] = jnp.concatenate([
            jn(sc.hollow_disks.pos), jn(sc.hollow_disks.axes)[:, :, 1],
            (jn(sc.hollow_disks.inner_radius) ** 2)[:, None],
            (jn(sc.hollow_disks.outer_radius) ** 2)[:, None],
            col("hollow_disks")], 1)
    if sc.cylinders.mat_idx.shape[0]:
        ax = jn(sc.cylinders.axes)
        out["cylinders"] = jnp.concatenate([
            jn(sc.cylinders.pos),
            ax[:, :, 0], ax[:, :, 1], ax[:, :, 2],
            jn(sc.cylinders.height)[:, None],
            jn(sc.cylinders.radius)[:, None], col("cylinders")], 1)

    if test_ray is not None:
        tube_rows = _test_ray_cylinder_rows(test_ray, jn(r_s))
        # Tube colors are opaque (frag:191-192) — hitting one stops the ray,
        # like the reference's first-opaque break.
        tube_rows = jnp.concatenate(
            [tube_rows, jnp.ones((tube_rows.shape[0], 1), jnp.float32)], 1)
        if "cylinders" in out:
            out["cylinders"] = jnp.concatenate([out["cylinders"], tube_rows], 0)
        else:
            out["cylinders"] = tube_rows

    rect_rows = []
    if sc.rectangles.mat_idx.shape[0]:
        ax = jn(sc.rectangles.axes)
        rect_rows.append(jnp.concatenate([
            jn(sc.rectangles.pos), ax[:, :, 0], ax[:, :, 1], ax[:, :, 2],
            jn(sc.rectangles.width)[:, None],
            jn(sc.rectangles.height)[:, None], col("rectangles")], 1))
    if sc.boxes.mat_idx.shape[0]:
        fp = jn(sc.boxes.face_pos).reshape(-1, 3)
        fa = jn(sc.boxes.face_axes).reshape(-1, 3, 3)
        fw = jn(sc.boxes.face_width).reshape(-1, 1)
        fh = jn(sc.boxes.face_height).reshape(-1, 1)
        rect_rows.append(jnp.concatenate(
            [fp, fa[:, :, 0], fa[:, :, 1], fa[:, :, 2], fw, fh,
             col("boxes")], 1))
    if rect_rows:
        out["rects"] = jnp.concatenate(rect_rows, 0)
    return out


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _rnorm(ax, ay, az):
    return jax.lax.rsqrt(jnp.maximum(ax * ax + ay * ay + az * az, 1e-20))


def _len3(ax, ay, az):
    """sqrt-of-dot length; normalizations DIVIDE by it (never multiply by
    its reciprocal) — see kernel._len3 for the bitwise-parity rationale."""
    return jnp.sqrt(jnp.maximum(ax * ax + ay * ay + az * az, 1e-20))


def _tangent_of(nx, ny, nz, dx, dy, dz):
    # normalize(cross(cross(n, d), n)) expanded in jnp.cross's component
    # order — NOT the algebraically equal d - n (n.d); see kernel._tangent_of
    # (PARITY_r05 root cause: the ~ulp difference between the two forms is
    # chaos-amplified near the photon sphere).
    nd = _dot3(nx, ny, nz, dx, dy, dz)
    cx = ny * dz - nz * dy
    cy = nz * dx - nx * dz
    cz = nx * dy - ny * dx
    tx = cy * nz - cz * ny
    ty = cz * nx - cx * nz
    tz = cx * ny - cy * nx
    inv = _rnorm(tx, ty, tz)
    return tx * inv, ty * inv, tz * inv, nd


def _init_march_state(ox, oy, oz, dx, dy, dz, marching, n_slots,
                      events=False, max_steps=None):
    """Initial orbital-plane state (frag:865, 883-887) as a dict of arrays.

    Shared by the Pallas kernel (on VMEM tiles) and the jnp twin (on full
    (H, W) planes) — the backward pass rematerializes through the exact same
    math the kernel ran forward.

    ``events``: additionally carry per-lane EVENT planes — ``t_end`` (step
    index of the lane's terminal event; ``max_steps`` for exhausted lanes,
    -1 for lanes that never march) and ``sstep{k}`` (step index at which
    slot k recorded; -1 if never).  These are the residuals of the r5
    scene-free adjoint kernel: given (t_end, status, sstep_k), the backward
    replay needs no scene tables at all (see _scene_march_bwd_kernel).
    """
    f32 = jnp.float32
    inv_len_o = _rnorm(ox, oy, oz)
    nx, ny, nz = ox * inv_len_o, oy * inv_len_o, oz * inv_len_o
    tx, ty, tz, nd0 = _tangent_of(nx, ny, nz, dx, dy, dz)
    u = inv_len_o
    dt0 = _dot3(tx, ty, tz, dx, dy, dz)
    du = -u * nd0 / jnp.where(jnp.abs(dt0) < 1e-12, 1e-12, dt0)

    zero = jnp.zeros_like(u)
    state = dict(
        px=ox, py=oy, pz=oz, dx=dx, dy=dy, dz=dz,
        nx=nx, ny=ny, nz=nz, tx=tx, ty=ty, tz=tz,
        u=u, du=du, phi=zero,
        status=jnp.where(marching, f32(STATUS_MARCHING), f32(STATUS_ESCAPED)),
        live=marching.astype(f32),
        nhits=zero,
    )
    for k in range(n_slots):
        for fld in ("sx", "sy", "sz", "sdx", "sdy", "sdz", "slen"):
            state[f"{fld}{k}"] = zero
    if events:
        state["t_end"] = jnp.where(marching, f32(max_steps), f32(-1.0))
        for k in range(n_slots):
            state[f"sstep{k}"] = jnp.full_like(u, f32(-1.0))
    return state


def _make_march_body(r_s, tabs, *, table_rows, n_slots, max_steps, max_angle,
                     u_f, with_exit=True, events=False):
    """Build the per-step march function body(i, state) -> state.

    ``tabs`` maps table name -> (N, F) array (SMEM refs inside the kernel,
    jnp arrays in the twin); all math is identical either way.
    ``with_exit=False`` returns the RAW body (no per-step any-live cond) —
    for callers that run it under a death-terminating lax.while_loop, where
    the per-step cond would be redundant overhead.
    ``events``: also update the t_end/sstep{k} event planes (see
    _init_march_state) — ~6 extra selects per step."""
    f32 = jnp.float32

    dot3 = _dot3
    rnorm = _rnorm
    tangent_of = _tangent_of

    def sphere_entry(px, py, pz, dx, dy, dz, cx, cy, cz, radius):
        ocx, ocy, ocz = px - cx, py - cy, pz - cz
        d_oc = dot3(dx, dy, dz, ocx, ocy, ocz)
        oc2 = dot3(ocx, ocy, ocz, ocx, ocy, ocz)
        disc = d_oc * d_oc - oc2 + radius * radius
        # Clamp to a tiny positive (not 0.0): d sqrt at 0 is inf, and the
        # replay backward would turn miss lanes into 0*inf = NaN cotangents.
        sq = jnp.sqrt(jnp.maximum(disc, 1e-20))
        lam1 = -d_oc - sq
        lam2 = -d_oc + sq
        lam = jnp.where((lam1 > 0) & (lam2 > 0), jnp.minimum(lam1, lam2),
                        jnp.where(lam1 > 0, lam1, jnp.where(lam2 > 0, lam2, -1.0)))
        return (disc >= 0.0) & (lam >= 0.0), lam

    def segment_min_dist(px, py, pz, sdx, sdy, sdz, seg_len):
        """Closest scene-hit lambda within [0, seg_len] (inf if none), the
        BH hit lambda, and the closest PROVABLY-OPAQUE hit lambda (each
        table's trailing column — _opaque_flags).  Validity-only versions
        of intersect.py."""
        INF = f32(np.inf)
        best = jnp.full_like(px, INF)
        best_opq = jnp.full_like(px, INF)

        def within(lam):
            return (lam >= 0.0) & (lam <= seg_len)

        def fold(cand, opq_flag):
            nonlocal best, best_opq
            best = jnp.minimum(best, cand)
            best_opq = jnp.minimum(best_opq,
                                   jnp.where(opq_flag > 0.5, cand, INF))

        # Event horizon (frag:757-758).
        bh_ok, bh_lam = sphere_entry(px, py, pz, sdx, sdy, sdz, 0.0, 0.0, 0.0, r_s)
        bh = jnp.where(bh_ok & within(bh_lam), bh_lam, INF)

        if "spheres" in tabs:
            t = tabs["spheres"]
            for i in range(table_rows["spheres"]):
                ok, lam = sphere_entry(px, py, pz, sdx, sdy, sdz,
                                       t[i, 0], t[i, 1], t[i, 2], t[i, 3])
                fold(jnp.where(ok & within(lam), lam, INF), t[i, 4])

        def plane_lam(t, i):
            nxs, nys, nzs = t[i, 3], t[i, 4], t[i, 5]
            denom = dot3(nxs, nys, nzs, sdx, sdy, sdz)
            num = nxs * (t[i, 0] - px) + nys * (t[i, 1] - py) + nzs * (t[i, 2] - pz)
            lam = num / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            ok = (jnp.abs(denom) >= _EPS) & within(lam)
            return ok, lam

        if "planes" in tabs:
            t = tabs["planes"]
            for i in range(table_rows["planes"]):
                ok, lam = plane_lam(t, i)
                fold(jnp.where(ok, lam, INF), t[i, 6])

        if "disks" in tabs:
            t = tabs["disks"]
            for i in range(table_rows["disks"]):
                ok, lam = plane_lam(t, i)
                hx = px + lam * sdx - t[i, 0]
                hy = py + lam * sdy - t[i, 1]
                hz = pz + lam * sdz - t[i, 2]
                ok = ok & (dot3(hx, hy, hz, hx, hy, hz) <= t[i, 6])
                fold(jnp.where(ok, lam, INF), t[i, 7])

        if "hollow" in tabs:
            t = tabs["hollow"]
            for i in range(table_rows["hollow"]):
                ok, lam = plane_lam(t, i)
                hx = px + lam * sdx - t[i, 0]
                hy = py + lam * sdy - t[i, 1]
                hz = pz + lam * sdz - t[i, 2]
                sq = dot3(hx, hy, hz, hx, hy, hz)
                ok = ok & (sq >= t[i, 6]) & (sq <= t[i, 7])
                fold(jnp.where(ok, lam, INF), t[i, 8])

        if "cylinders" in tabs:
            t = tabs["cylinders"]
            for i in range(table_rows["cylinders"]):
                # Local frame: columns at 3..5 (ax0), 6..8 (ax1=axis), 9..11.
                rx = px - t[i, 0]
                ry = py - t[i, 1]
                rz = pz - t[i, 2]
                lox = dot3(t[i, 3], t[i, 4], t[i, 5], rx, ry, rz)
                loy = dot3(t[i, 6], t[i, 7], t[i, 8], rx, ry, rz)
                loz = dot3(t[i, 9], t[i, 10], t[i, 11], rx, ry, rz)
                ldx = dot3(t[i, 3], t[i, 4], t[i, 5], sdx, sdy, sdz)
                ldy = dot3(t[i, 6], t[i, 7], t[i, 8], sdx, sdy, sdz)
                ldz = dot3(t[i, 9], t[i, 10], t[i, 11], sdx, sdy, sdz)
                height, radius = t[i, 12], t[i, 13]
                a = lox * ldx + loz * ldz
                dps = ldx * ldx + ldz * ldz
                disc = a * a + dps * (radius * radius - (lox * lox + loz * loz))
                sq = jnp.sqrt(jnp.maximum(disc, 1e-20))  # see sphere_entry
                dps_s = jnp.where(jnp.abs(dps) < 1e-12, 1e-12, dps)
                lam1 = -(a + sq) / dps_s
                lam2 = -(a - sq) / dps_s
                y1 = loy + lam1 * ldy
                y2 = loy + lam2 * ldy
                in1 = (y1 >= 0.0) & (y1 <= height)
                in2 = (y2 >= 0.0) & (y2 <= height)
                lam = jnp.where(in1 & in2,
                                jnp.where((lam1 > 0) & (lam2 > 0),
                                          jnp.minimum(lam1, lam2),
                                          jnp.where(lam1 > 0, lam1,
                                                    jnp.where(lam2 > 0, lam2, -1.0))),
                                jnp.where(in1, lam1, jnp.where(in2, lam2, -1.0)))
                ok = (disc >= 0.0) & (in1 | in2) & within(lam)
                fold(jnp.where(ok, lam, INF), t[i, 14])

        if "rects" in tabs:
            t = tabs["rects"]
            for i in range(table_rows["rects"]):
                nxs, nys, nzs = t[i, 6], t[i, 7], t[i, 8]
                denom = dot3(nxs, nys, nzs, sdx, sdy, sdz)
                num = (nxs * (t[i, 0] - px) + nys * (t[i, 1] - py)
                       + nzs * (t[i, 2] - pz))
                lam = num / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
                ok = (jnp.abs(denom) >= _EPS) & within(lam)
                hx = px + lam * sdx - t[i, 0]
                hy = py + lam * sdy - t[i, 1]
                hz = pz + lam * sdz - t[i, 2]
                alpha = dot3(t[i, 3], t[i, 4], t[i, 5], hx, hy, hz)
                beta = dot3(t[i, 9], t[i, 10], t[i, 11], hx, hy, hz)
                ok = ok & (alpha >= 0.0) & (alpha <= t[i, 12]) \
                        & (beta >= 0.0) & (beta <= t[i, 13])
                fold(jnp.where(ok, lam, INF), t[i, 14])

        return best, bh, best_opq

    def body(i, s):
        live = s["live"] > 0.5

        # Far-field rule (frag:891-912).
        ff = live & (s["u"] < u_f)
        big_ok, big_lam = sphere_entry(s["px"], s["py"], s["pz"],
                                       s["dx"], s["dy"], s["dz"],
                                       0.0, 0.0, 0.0, 1.0 / u_f)
        hx = s["px"] + big_lam * s["dx"]
        hy = s["py"] + big_lam * s["dy"]
        hz = s["pz"] + big_lam * s["dz"]
        inv_h = rnorm(hx, hy, hz)
        nnx, nny, nnz = hx * inv_h, hy * inv_h, hz * inv_h
        nd = dot3(nnx, nny, nnz, s["dx"], s["dy"], s["dz"])
        radial = jnp.abs(nd) >= 1.0 - _EPS

        finish = ff & (~big_ok | radial)
        status = jnp.where(finish, f32(STATUS_FLAT_FINISH), s["status"])
        live = live & ~finish

        reinit = ff & big_ok & ~radial
        ntx, nty, ntz, _ = tangent_of(nnx, nny, nnz, s["dx"], s["dy"], s["dz"])
        dt = dot3(ntx, nty, ntz, s["dx"], s["dy"], s["dz"])
        new_u = inv_h
        new_du = -new_u * nd / jnp.where(jnp.abs(dt) < 1e-12, 1e-12, dt)

        sel = jnp.where
        nx = sel(reinit, nnx, s["nx"])
        ny = sel(reinit, nny, s["ny"])
        nz = sel(reinit, nnz, s["nz"])
        tx = sel(reinit, ntx, s["tx"])
        ty = sel(reinit, nty, s["ty"])
        tz = sel(reinit, ntz, s["tz"])
        u0 = sel(reinit, new_u, s["u"])
        du0 = sel(reinit, new_du, s["du"])

        # RK4 (frag:914-919).
        step = (max_angle - s["phi"]) / (max_steps - i).astype(f32)
        phi = s["phi"] + step
        d_u, d_du = physics.rk4_step(u0, du0, step, r_s)
        u1 = u0 + d_u
        du1 = du0 + d_du

        escaped = live & (u1 < 0.0)
        status = jnp.where(escaped, f32(STATUS_ESCAPED), status)
        live = live & ~escaped

        # Segment (frag:924-928).
        # r clamped to 1e6 (see render.py: overflow guard far past u_f).
        u_rec = jnp.maximum(u1, 1e-6)
        inv_u = 1.0 / u_rec
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        npx = (cphi * nx + sphi * tx) * inv_u
        npy = (cphi * ny + sphi * ty) * inv_u
        npz = (cphi * nz + sphi * tz) * inv_u
        ddx = npx - s["px"]
        ddy = npy - s["py"]
        ddz = npz - s["pz"]
        # seg_len via direct sqrt, direction via the canonical rsqrt-mult
        # (see kernel.py's segment comment).
        seg_len = _len3(ddx, ddy, ddz)
        inv_seg = rnorm(ddx, ddy, ddz)
        sdx, sdy, sdz = ddx * inv_seg, ddy * inv_seg, ddz * inv_seg

        best, bh, best_opq = segment_min_dist(s["px"], s["py"], s["pz"],
                                              sdx, sdy, sdz, seg_len)
        any_hit = live & (jnp.minimum(best, bh) < f32(np.inf))
        bh_closest = any_hit & (bh <= best)  # BH wins ties (frag:757 init)
        # First-opaque stop (frag:930-932) at march time: the segment's
        # closest hit is a provably-opaque primitive (best_opq is a min over
        # a SUBSET of best's candidates, so <= means ==: the winner is
        # opaque).  The hit still records below; the ray just stops.
        opq_closest = any_hit & ~bh_closest & (best_opq <= best)

        # Record the segment into the next free slot.
        nh = s["nhits"]
        new_state = dict(s)
        for k in range(n_slots):
            take = any_hit & (nh == float(k))
            new_state[f"sx{k}"] = sel(take, s["px"], s[f"sx{k}"])
            new_state[f"sy{k}"] = sel(take, s["py"], s[f"sy{k}"])
            new_state[f"sz{k}"] = sel(take, s["pz"], s[f"sz{k}"])
            new_state[f"sdx{k}"] = sel(take, sdx, s[f"sdx{k}"])
            new_state[f"sdy{k}"] = sel(take, sdy, s[f"sdy{k}"])
            new_state[f"sdz{k}"] = sel(take, sdz, s[f"sdz{k}"])
            new_state[f"slen{k}"] = sel(take, seg_len, s[f"slen{k}"])
            if events:
                new_state[f"sstep{k}"] = sel(take, i.astype(f32),
                                             s[f"sstep{k}"])
        # Count every hit (uncapped): hits with nh >= n_slots simply match no
        # slot above, so final nhits > n_slots detects dropped recordings.
        nh = jnp.where(any_hit, nh + 1.0, nh)

        captured = bh_closest
        status = jnp.where(captured, f32(STATUS_CAPTURED), status)
        status = jnp.where(opq_closest, f32(STATUS_HIT_OPAQUE), status)
        live = live & ~captured & ~opq_closest
        if events:
            # The four terminal events are disjoint (each gates on the
            # progressively-narrowed live mask).
            terminal = finish | escaped | captured | opq_closest
            new_state["t_end"] = sel(terminal, i.astype(f32), s["t_end"])

        moved = live | captured | opq_closest
        new_state.update(
            px=sel(moved, npx, s["px"]), py=sel(moved, npy, s["py"]),
            pz=sel(moved, npz, s["pz"]),
            dx=sel(moved, sdx, s["dx"]), dy=sel(moved, sdy, s["dy"]),
            dz=sel(moved, sdz, s["dz"]),
            nx=nx, ny=ny, nz=nz, tx=tx, ty=ty, tz=tz,
            u=sel(moved, u1, u0), du=sel(moved, du1, du0),
            phi=sel(moved, phi, s["phi"]),
            status=status, live=live.astype(f32), nhits=nh,
        )
        return new_state

    if not with_exit:
        return body

    def body_with_exit(i, s):
        # Early tile exit: when every lane in the tile is done (captured,
        # escaped, flat-finished, or noise-skipped) the step body is exactly
        # the identity, so skip its whole cost.  Big win for percent_black
        # tiles (75% of lanes never march) and converged tiles.
        return jax.lax.cond(jnp.any(s["live"] > 0.5), body,
                            lambda i, s: dict(s), i, s)

    return body_with_exit


def _final_outputs(state, n_slots, events=False):
    """Final march state -> flat tuple of component planes (kernel output
    order): (fdx, fdy, fdz, fpx, fpy, fpz, status, nhits, *slots
    [, t_end, *ssteps])."""
    f32 = jnp.float32
    final_status = jnp.where(state["live"] > 0.5, f32(STATUS_ESCAPED),
                             state["status"])
    outs = [state["dx"], state["dy"], state["dz"],
            state["px"], state["py"], state["pz"],
            final_status, state["nhits"]]
    for k in range(n_slots):
        for fld in ("sx", "sy", "sz", "sdx", "sdy", "sdz", "slen"):
            outs.append(state[f"{fld}{k}"])
    if events:
        outs.append(state["t_end"])
        for k in range(n_slots):
            outs.append(state[f"sstep{k}"])
    return tuple(outs)


# ---------------------------------------------------------------------------
# Pallas ADJOINT kernel: the march backward at kernel speed (VERDICT r3
# item 3; redesigned SCENE-FREE in r5 per VERDICT r4 item 3).  The jnp-twin
# VJP measured 86-101 ms at 512^2 on v5e (vs 6.3 ms kernel forward) — the
# scan state (~36 planes, 38 MB) round-trips HBM every step, three sweeps
# deep.  This kernel keeps everything VMEM-resident:
#
#   phase 1  replay ONLY the differentiable core (the ~440-op _make_diff_step
#            — far-field, RK4, polar->Cartesian, segment) over the tile,
#            SAVING the 15 core planes per step into VMEM scratch
#            (100 x 15 x (8, 128) f32 = 6.1 MB — fits the ~16 MB VMEM);
#   phase 2  sweep backward applying jax.vjp of that same reduced step
#            (traced in-kernel, so the adjoint code is machine-derived, not
#            hand-written).
#
# The r4 version replayed the FULL march body — scene tables, per-segment
# validity intersections (~1090 ops/step vs the core's ~440) — just to
# regenerate the discrete decisions (live/status/nhits transitions).  r5
# moves that information into per-lane EVENT PLANES recorded by the forward
# kernel (march_scene(events=True)): t_end (terminal-event step), status
# (how it died), sstep_k (slot-k recording step).  From these every mask is
# a comparison against the step index:
#
#   live_in(i) = i <= t_end          (never-marched lanes have t_end = -1)
#   moved(i)   = i < t_end  |  (i == t_end & status in {CAPTURED, OPAQUE})
#   reinit(i)  = live_in & u < u_f & far-sphere re-entry & ~radial
#                (recomputed inside diff_step from the replayed core —
#                 bit-identical to the forward body's test)
#   take_k(i)  = sstep_k == i        (slot cotangent injection)
#
# so the backward needs NO scene tables at all: phase 1 drops from ~1090 to
# ~440 ops/step and the scratch from 18 to 15 planes/step (measured 17.6 ->
# ~8 ms adjoint at 512^2 dense on v5e).
#
# Gradients follow the framework's documented convention (SURVEY section 7):
# continuous sensitivities at FIXED discrete decisions — the event planes
# and the booleans computed inside diff_step carry no tangents.
# ---------------------------------------------------------------------------

# Core planes saved per step (order matters: scratch rows index this list).
_CORE = ("px", "py", "pz", "dx", "dy", "dz", "nx", "ny", "nz",
         "tx", "ty", "tz", "u", "du", "phi")


def _init_core(ox, oy, oz, dx, dy, dz):
    """The differentiable slice of _init_march_state (same math/guards)."""
    inv_len_o = _rnorm(ox, oy, oz)
    nx, ny, nz = ox * inv_len_o, oy * inv_len_o, oz * inv_len_o
    tx, ty, tz, nd0 = _tangent_of(nx, ny, nz, dx, dy, dz)
    u = inv_len_o
    dt0 = _dot3(tx, ty, tz, dx, dy, dz)
    du = -u * nd0 / jnp.where(jnp.abs(dt0) < 1e-12, 1e-12, dt0)
    return (ox, oy, oz, dx, dy, dz, nx, ny, nz, tx, ty, tz, u, du,
            jnp.zeros_like(u))


def _make_diff_step(max_steps, max_angle, u_f):
    """The reduced (scene-free) step: core -> (new core, slot-record values)
    at FIXED masks (live_in, moved).  Bit-identical math to
    _make_march_body's differentiable path — any edit there must be mirrored
    here (parity pinned by tests/test_adjoint.py's pallas-vs-twin gradient
    tests).  ``reinit`` is derived INTERNALLY (live_in & far-field &
    re-entry & ~radial — the same comparisons the body runs, on the same
    replayed values); booleans carry no tangents, so this is still the
    fixed-decision gradient."""
    f32 = jnp.float32
    dot3, rnorm, tangent_of = _dot3, _rnorm, _tangent_of

    def diff_step(i, core, masks, rs):
        (px, py, pz, dx, dy, dz, nx, ny, nz, tx, ty, tz, u, du, phi) = core
        live_in, moved = masks
        sel = jnp.where

        # Far-field re-init values (body lines: big sphere hit + new basis).
        ocx, ocy, ocz = px, py, pz
        d_oc = dot3(dx, dy, dz, ocx, ocy, ocz)
        oc2 = dot3(ocx, ocy, ocz, ocx, ocy, ocz)
        radius = 1.0 / u_f
        disc = d_oc * d_oc - oc2 + radius * radius
        sq = jnp.sqrt(jnp.maximum(disc, 1e-20))
        lam1 = -d_oc - sq
        lam2 = -d_oc + sq
        big_lam = sel((lam1 > 0) & (lam2 > 0), jnp.minimum(lam1, lam2),
                      sel(lam1 > 0, lam1, sel(lam2 > 0, lam2, -1.0)))
        hx = px + big_lam * dx
        hy = py + big_lam * dy
        hz = pz + big_lam * dz
        inv_h = rnorm(hx, hy, hz)
        nnx, nny, nnz = hx * inv_h, hy * inv_h, hz * inv_h
        nd = dot3(nnx, nny, nnz, dx, dy, dz)
        ntx, nty, ntz, _ = tangent_of(nnx, nny, nnz, dx, dy, dz)
        dt = dot3(ntx, nty, ntz, dx, dy, dz)
        new_u = inv_h
        new_du = -new_u * nd / sel(jnp.abs(dt) < 1e-12, 1e-12, dt)

        # reinit = ff & big_ok & ~radial, exactly as the body computes it
        # (body lines: far-field rule) — from the replayed core, no tangents.
        big_ok = (disc >= 0.0) & (big_lam >= 0.0)
        radial = jnp.abs(nd) >= 1.0 - _EPS
        reinit = live_in & (u < u_f) & big_ok & ~radial

        nx = sel(reinit, nnx, nx)
        ny = sel(reinit, nny, ny)
        nz = sel(reinit, nnz, nz)
        tx = sel(reinit, ntx, tx)
        ty = sel(reinit, nty, ty)
        tz = sel(reinit, ntz, tz)
        u0 = sel(reinit, new_u, u)
        du0 = sel(reinit, new_du, du)

        step = (max_angle - phi) / (max_steps - i).astype(f32)
        phi_new = phi + step
        d_u, d_du = physics.rk4_step(u0, du0, step, rs)
        u1 = u0 + d_u
        du1 = du0 + d_du

        u_rec = jnp.maximum(u1, 1e-6)
        inv_u = 1.0 / u_rec
        # Mirrors the forward body exactly (bit-identical replay contract).
        cphi, sphi = jnp.cos(phi_new), jnp.sin(phi_new)
        npx = (cphi * nx + sphi * tx) * inv_u
        npy = (cphi * ny + sphi * ty) * inv_u
        npz = (cphi * nz + sphi * tz) * inv_u
        ddx = npx - px
        ddy = npy - py
        ddz = npz - pz
        seg_len = _len3(ddx, ddy, ddz)
        inv_seg = rnorm(ddx, ddy, ddz)
        sdx, sdy, sdz = ddx * inv_seg, ddy * inv_seg, ddz * inv_seg

        new_core = (
            sel(moved, npx, px), sel(moved, npy, py), sel(moved, npz, pz),
            sel(moved, sdx, dx), sel(moved, sdy, dy), sel(moved, sdz, dz),
            nx, ny, nz, tx, ty, tz,
            sel(moved, u1, u0), sel(moved, du1, du0),
            sel(moved, phi_new, phi),
        )
        slot_vals = (px, py, pz, sdx, sdy, sdz, seg_len)
        return new_core, slot_vals

    return diff_step


def _scene_march_bwd_kernel(rs_ref, *refs, n_slots, max_steps, max_angle,
                            u_f):
    """refs: [ox,oy,oz,dx,dy,dz] + [status, t_end] + [sstep_0..K-1]
    + cotangents [d_fdx,d_fdy,d_fdz,d_fpx,d_fpy,d_fpz]
    + per-slot [d_sx,d_sy,d_sz,d_sdx,d_sdy,d_sdz,d_slen]*K
    + outputs [g_ox,g_oy,g_oz,g_dx,g_dy,g_dz,g_rs]
    + scratch save (max_steps, len(_CORE), bh, bw).

    Scene-free (see the block comment above): every discrete decision comes
    from the event planes the forward kernel recorded, so neither phase
    touches a scene table."""
    f32 = jnp.float32
    r_s = rs_ref[0, 0]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = refs[:6]
    st_ref, te_ref = refs[6:8]
    ss_refs = refs[8:8 + n_slots]
    base = 8 + n_slots
    ct_fd = refs[base:base + 3]
    ct_fp = refs[base + 3:base + 6]
    ct_slots = [refs[base + 6 + 7 * k:base + 6 + 7 * (k + 1)]
                for k in range(n_slots)]
    out_refs = refs[base + 6 + 7 * n_slots:base + 6 + 7 * n_slots + 7]
    save = refs[base + 6 + 7 * n_slots + 7]

    status = st_ref[:]
    t_end = te_ref[:]
    ssteps = [ss_refs[k][:] for k in range(n_slots)]
    died_moving = ((status == f32(STATUS_CAPTURED))
                   | (status == f32(STATUS_HIT_OPAQUE)))

    def masks_at(i):
        # Discrete decisions from the event planes (block comment above):
        # captured/opaque lanes advance INTO their terminal hit (moved at
        # t_end); escaped/flat-finished lanes keep their pre-step state.
        i_f = i.astype(f32)
        live_in = i_f <= t_end
        moved = (i_f < t_end) | ((i_f == t_end) & died_moving)
        return live_in, moved

    diff_step = _make_diff_step(max_steps, max_angle, u_f)
    rs_plane = jnp.full(ox_ref.shape, r_s, f32)
    zero = jnp.zeros(ox_ref.shape, f32)

    # Early tile exit, both phases: ``last`` = steps the tile executed
    # forward = one past the last step any lane was live at entry.
    last = jnp.minimum(jnp.int32(max_steps),
                       jnp.max(t_end).astype(jnp.int32) + 1)

    # ---------------- phase 1: core-only replay with state saves ----------
    core0 = _init_core(ox_ref[:], oy_ref[:], oz_ref[:],
                       dx_ref[:], dy_ref[:], dz_ref[:])

    def fwd_body(i, core):
        for j in range(len(_CORE)):
            save[i, j] = core[j]
        new_core, _ = diff_step(i, core, masks_at(i), rs_plane)
        return new_core

    jax.lax.fori_loop(0, last, fwd_body, core0)

    # ---------------- phase 2: reverse sweep ------------------------------
    # Adjoint init from the final-output cotangents (_final_outputs: fdir =
    # final dx.., fpos = final px..; status/nhits are non-differentiable).
    ct0 = [ct_fp[0][:], ct_fp[1][:], ct_fp[2][:],
           ct_fd[0][:], ct_fd[1][:], ct_fd[2][:]] + [zero] * 9 + [zero]

    def bwd_body(t, carry):
        i = max_steps - 1 - t
        ct = carry[:15]
        g_rs = carry[15]

        core_in = tuple(save[i, j] for j in range(len(_CORE)))
        i_f = i.astype(f32)

        # Slot cotangents recorded at THIS step (take_k = sstep_k == i).
        ct_slot = []
        for j in range(7):
            acc = zero
            for k in range(n_slots):
                acc = acc + jnp.where(ssteps[k] == i_f,
                                      ct_slots[k][j][:], 0.0)
            ct_slot.append(acc)

        masks = masks_at(i)
        _, vjp = jax.vjp(
            lambda core, rp: diff_step(i, core, masks, rp), core_in, rs_plane)
        ct_core, ct_rs = vjp((tuple(ct), tuple(ct_slot)))
        return tuple(ct_core) + (g_rs + ct_rs,)

    # Reverse side of the early tile exit: iterate only the steps the tile
    # actually executed (i in [0, last)) via a dynamic lower bound — a tile
    # that died at step s skips max_steps - s vjp steps with ZERO per-step
    # cond cost, and a tile that never marched skips the whole sweep.
    carry = jax.lax.fori_loop(max_steps - last, max_steps, bwd_body,
                              tuple(ct0))
    ct_core0 = carry[:15]
    g_rs = carry[15]

    _, init_vjp = jax.vjp(_init_core, ox_ref[:], oy_ref[:], oz_ref[:],
                          dx_ref[:], dy_ref[:], dz_ref[:])
    g_o_d = init_vjp(tuple(ct_core0))
    for ref, val in zip(out_refs, tuple(g_o_d) + (g_rs,)):
        ref[:] = val


def march_scene_bwd(origin, direction, r_s, cfg: RenderConfig, cotangents,
                    status, events, n_slots: int = 4,
                    block_h: int = None, block_w: int = 128,
                    interpret: bool = False):
    """Pallas adjoint of :func:`march_scene` w.r.t. (origin, direction, r_s)
    at fixed discrete decisions.  ``cotangents`` = (ct_fdir, ct_fpos,
    ct_slots) with ct_slots a list of K (ct_start, ct_dir, ct_len);
    ``status`` and ``events`` (the dict from ``march_scene(events=True)``)
    carry the forward run's discrete decisions, so no scene is needed.
    Returns (g_origin, g_direction, g_r_s scalar).

    ``block_h=None``: 16 when the save scratch (max_steps x 15 planes) fits
    ~13 MB of the ~16 MB VMEM (measured faster at 512^2/100 steps: 16.2 vs
    17.3 ms full grad), else 8."""
    if block_h is None:
        scratch = cfg.max_steps * len(_CORE) * 16 * block_w * 4
        block_h = 16 if scratch <= 13_000_000 else 8
    H, W = status.shape
    pad_h = (-H) % block_h
    pad_w = (-W) % block_w

    def pad(x, fill=0.0):
        return jnp.pad(x, ((0, pad_h), (0, pad_w)), constant_values=fill)

    ct_fdir, ct_fpos, ct_slots = cotangents
    comps = [pad(origin[..., i]) for i in range(3)]
    comps += [pad(direction[..., i]) for i in range(3)]
    # Padding lanes: status ESCAPED + t_end -1 -> never live, zero masks.
    comps += [pad(status, fill=STATUS_ESCAPED), pad(events["t_end"],
                                                    fill=-1.0)]
    comps += [pad(events["ssteps"][k], fill=-1.0) for k in range(n_slots)]
    comps += [pad(ct_fdir[..., i]) for i in range(3)]
    comps += [pad(ct_fpos[..., i]) for i in range(3)]
    for cs, cd, cl in ct_slots:
        comps += [pad(cs[..., i]) for i in range(3)]
        comps += [pad(cd[..., i]) for i in range(3)]
        comps += [pad(cl)]
    ph, pw = comps[0].shape

    grid = (ph // block_h, pw // block_w)
    tile = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _scene_march_bwd_kernel,
        n_slots=n_slots, max_steps=cfg.max_steps,
        max_angle=float(cfg.max_angle), u_f=float(cfg.u_f))
    n_in = 14 + n_slots + 7 * n_slots
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[scalar] + [tile] * n_in,
        out_specs=[tile] * 7,
        out_shape=[jax.ShapeDtypeStruct((ph, pw), jnp.float32)] * 7,
        scratch_shapes=[
            pltpu.VMEM((cfg.max_steps, len(_CORE), block_h, block_w),
                       jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(r_s, jnp.float32).reshape(1, 1), *comps)

    def crop(x):
        return x[:H, :W]

    g_origin = jnp.stack([crop(outs[0]), crop(outs[1]), crop(outs[2])], -1)
    g_dir = jnp.stack([crop(outs[3]), crop(outs[4]), crop(outs[5])], -1)
    g_rs = jnp.sum(crop(outs[6]))
    return g_origin, g_dir, g_rs


def _scene_march_kernel(rs_ref, *refs, table_names, table_rows, n_slots,
                        max_steps, max_angle, u_f, count_steps=False,
                        events=False):
    """refs order: [tables...] + [ox..dz, act] + outputs
    [fdx,fdy,fdz,fpx,fpy,fpz,status,nhits] + per-slot
    [px,py,pz,dx,dy,dz,len]*K (+ [t_end, sstep_0..K-1] when ``events``)
    (+ executed-steps plane when ``count_steps`` — see
    kernel._march_kernel)."""
    r_s = rs_ref[0, 0]

    n_tab = len(table_names)
    tabs = dict(zip(table_names, refs[:n_tab]))
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, act_ref = refs[n_tab:n_tab + 7]
    out_refs = refs[n_tab + 7:]

    state = _init_march_state(ox_ref[:], oy_ref[:], oz_ref[:],
                              dx_ref[:], dy_ref[:], dz_ref[:],
                              act_ref[:] > 0.5, n_slots,
                              events=events, max_steps=max_steps)
    body = _make_march_body(r_s, tabs, table_rows=table_rows, n_slots=n_slots,
                            max_steps=max_steps, max_angle=max_angle,
                            u_f=u_f, with_exit=False, events=events)

    # Death-terminating march: the loop CONDITION fuses the step bound with
    # the any-live check, so a tile stops paying the moment its last lane
    # finishes (dead steps are exactly the identity — stopping is exact).
    # This subsumes both round-3 forms: the whole-march skip for tiles dead
    # at entry (tile-coherent noise masks kill 75% of tiles at
    # percent_black=0.75) AND the per-step cond, whose any() reduction +
    # branch still cost ~2/3 of a bh step for every dead-tail step.
    def march_cond(carry):
        i, s = carry
        return (i < max_steps) & jnp.any(s["live"] > 0.5)

    def march_step(carry):
        i, s = carry
        return i + 1, body(i, s)

    n_exec, state = jax.lax.while_loop(march_cond, march_step,
                                       (jnp.int32(0), state))
    vals = _final_outputs(state, n_slots, events=events)
    if count_steps:
        vals = vals + (jnp.full(ox_ref.shape, n_exec.astype(jnp.float32)),)
    for ref, val in zip(out_refs, vals):
        ref[:] = val


def march_scene(origin, direction, active, r_s, sc: Scene, cfg: RenderConfig,
                n_slots: int = 4, block_h: int = 16, block_w: int = 128,
                interpret: bool = False, mesh=None, compact: bool = False,
                test_ray=None, tex=None, count_steps: bool = False,
                events: bool = False):
    """Pallas scene march.  Returns (final_dir, final_pos, status, slots,
    nhits) where slots is a list of K (start (H,W,3), dir (H,W,3), length
    (H,W)) and nhits (H,W) counts ALL segment hits along each ray — uncapped,
    so ``nhits > n_slots`` flags rays whose extra hits were dropped.
    ``count_steps=True`` appends a scalar: total EXECUTED lane-steps
    (sum over tiles of loop iterations x lanes — see kernel.march_bh).
    ``events=True`` appends an events dict {"t_end": (H,W), "ssteps":
    [(H,W)]*K} — the residuals of the scene-free adjoint kernel
    (march_scene_bwd): the step index of each lane's terminal event and of
    each slot recording.

    ``mesh``: shard the march over image tiles via shard_map (scene tables
    and r_s replicated; every device launches the kernel on its local tile).
    ``compact``: pack active rays into leading rows so sparse noise masks
    leave whole tiles dead for the early tile exit (kernel.compact_march).
    ``tex``: the texture stack the hits will be shaded with — enables the
    in-kernel first-opaque stop for primitives whose opacity is provable
    from concrete material/texture data (:func:`_opaque_flags`); rays
    stopped this way end with STATUS_HIT_OPAQUE.
    """
    if count_steps and (mesh is not None or compact):
        raise ValueError("count_steps: single-device, non-compact marches "
                         "only (it is a benchmark accounting hook)")
    if events and (mesh is not None or compact):
        raise ValueError("events: single-device, non-compact marches only "
                         "(under a mesh the replay backward is used)")
    if mesh is not None:
        from .sharding import shard_march

        def fn(origin, direction, active, r_s, sc):
            return march_scene(origin, direction, active, r_s, sc, cfg,
                               n_slots=n_slots, block_h=block_h,
                               block_w=block_w, interpret=interpret,
                               compact=compact, test_ray=test_ray, tex=tex)

        return shard_march(mesh, fn)(origin, direction, active, r_s, sc)
    if compact:
        from .kernel import compact_march

        return compact_march(
            lambda o, d, a: march_scene(o, d, a, r_s, sc, cfg,
                                        n_slots=n_slots, block_h=block_h,
                                        block_w=block_w, interpret=interpret,
                                        test_ray=test_ray, tex=tex),
            origin, direction, active)
    H, W = active.shape
    pad_h = (-H) % block_h
    pad_w = (-W) % block_w

    def pad(x):
        return jnp.pad(x, ((0, pad_h), (0, pad_w)))

    comps = [pad(origin[..., i]) for i in range(3)]
    comps += [pad(direction[..., i]) for i in range(3)]
    comps += [pad(active.astype(jnp.float32))]
    ph, pw = comps[0].shape

    tables = _pack_scene_smem(sc, test_ray=test_ray, r_s=r_s, tex=tex)
    table_names = tuple(sorted(tables))
    table_rows = {k: int(tables[k].shape[0]) for k in table_names}

    grid = (ph // block_h, pw // block_w)
    tile = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec(memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _scene_march_kernel,
        table_names=table_names,
        table_rows=table_rows,
        n_slots=n_slots,
        max_steps=cfg.max_steps,
        max_angle=float(cfg.max_angle),
        u_f=float(cfg.u_f),
        count_steps=count_steps,
        events=events,
    )
    n_ev = (1 + n_slots) if events else 0
    n_out = 8 + 7 * n_slots + n_ev + (1 if count_steps else 0)
    out_shape = [jax.ShapeDtypeStruct((ph, pw), jnp.float32)] * n_out
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[scalar] * (1 + len(table_names)) + [tile] * 7,
        out_specs=[tile] * n_out,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(r_s, jnp.float32).reshape(1, 1),
      *[tables[k] for k in table_names], *comps)

    def crop(x):
        return x[:H, :W]

    fdir = jnp.stack([crop(outs[0]), crop(outs[1]), crop(outs[2])], -1)
    fpos = jnp.stack([crop(outs[3]), crop(outs[4]), crop(outs[5])], -1)
    status = crop(outs[6])
    nhits = crop(outs[7])
    slots = []
    for k in range(n_slots):
        b = 8 + k * 7
        start = jnp.stack([crop(outs[b]), crop(outs[b + 1]), crop(outs[b + 2])], -1)
        sdir = jnp.stack([crop(outs[b + 3]), crop(outs[b + 4]), crop(outs[b + 5])], -1)
        slen = crop(outs[b + 6])
        slots.append((start, sdir, slen))
    ret = (fdir, fpos, status, slots, nhits)
    if events:
        e = 8 + 7 * n_slots
        ret = ret + (dict(t_end=crop(outs[e]),
                          ssteps=[crop(outs[e + 1 + k])
                                  for k in range(n_slots)]),)
    if count_steps:
        ret = ret + (jnp.sum(outs[-1]),)
    return ret


def march_scene_jnp(origin, direction, active, r_s, sc: Scene,
                    cfg: RenderConfig, n_slots: int = 4,
                    checkpoint_every: Optional[int] = None, test_ray=None,
                    tex=None, events: bool = False):
    """Dense-jnp twin of the Pallas scene march — IDENTICAL math, identical
    outputs (validity-only intersections, no shading/texturing).

    Two jobs:
      * correctness oracle for the kernel (tests compare them bit-for-bit in
        interpret mode);
      * the rematerialized BACKWARD pass of :func:`march_scene_diff`: per RK4
        step this runs ~10x fewer ops than the full ``render.py`` twin (whose
        per-step intersect+shade dominates), so ``jax.vjp`` of this function
        is the kernel-speed gradient path (VERDICT round 1 item 2).

    ``checkpoint_every`` chunks the scan under ``jax.checkpoint`` (defaults
    to ``cfg.checkpoint_every``) bounding residual memory to
    O(state x steps/K + state x K).
    """
    f32 = jnp.float32
    tables = _pack_scene_smem(sc, test_ray=test_ray, r_s=r_s, tex=tex)
    table_names = tuple(sorted(tables))
    table_rows = {k: int(tables[k].shape[0]) for k in table_names}

    state = _init_march_state(
        origin[..., 0], origin[..., 1], origin[..., 2],
        direction[..., 0], direction[..., 1], direction[..., 2],
        active, n_slots, events=events, max_steps=cfg.max_steps)
    body = _make_march_body(
        jnp.asarray(r_s, f32), tables, table_rows=table_rows, n_slots=n_slots,
        max_steps=cfg.max_steps, max_angle=float(cfg.max_angle),
        u_f=float(cfg.u_f), events=events)

    steps = jnp.arange(cfg.max_steps, dtype=jnp.int32)

    def step_fn(s, i):
        return body(i, s), None

    ck = cfg.checkpoint_every if checkpoint_every is None else checkpoint_every
    if ck and ck < cfg.max_steps:
        if cfg.max_steps % ck:
            raise ValueError(
                f"checkpoint_every={ck} must divide max_steps={cfg.max_steps}")

        def chunk_fn(s, idx):
            out, _ = jax.lax.scan(step_fn, s, idx)
            return out, None

        state, _ = jax.lax.scan(jax.checkpoint(chunk_fn), state,
                                steps.reshape(-1, ck))
    else:
        state, _ = jax.lax.scan(step_fn, state, steps)

    outs = _final_outputs(state, n_slots, events=events)
    fdir = jnp.stack(outs[0:3], -1)
    fpos = jnp.stack(outs[3:6], -1)
    status, nhits = outs[6], outs[7]
    slots = []
    for k in range(n_slots):
        b = 8 + k * 7
        slots.append((jnp.stack(outs[b:b + 3], -1),
                      jnp.stack(outs[b + 3:b + 6], -1), outs[b + 6]))
    if events:
        e = 8 + 7 * n_slots
        return fdir, fpos, status, slots, nhits, dict(
            t_end=outs[e], ssteps=list(outs[e + 1:e + 1 + n_slots]))
    return fdir, fpos, status, slots, nhits


def march_scene_diff(origin, direction, active, r_s, sc: Scene,
                     cfg: RenderConfig, n_slots: int = 4,
                     interpret: bool = False, mesh=None,
                     compact: bool = False, test_ray=None, tex=None,
                     backward: str = "pallas"):
    """Differentiable scene march: Pallas kernel FORWARD, Pallas adjoint
    kernel BACKWARD (``backward="pallas"``, default — :func:`march_scene_bwd`,
    fully VMEM-resident) or the checkpointed validity-march replay
    (``backward="replay"`` — the round-2 jnp path, kept as the gradient
    oracle; it measured 86-101 ms at 512^2 on v5e vs the adjoint kernel's
    kernel-speed sweep).

    Gradients flow to (origin, direction, r_s) — at fixed discrete decisions
    (which object, capture-vs-escape; SURVEY section 7 'gradients through
    discrete events').  The scene's own geometry gradient through the march
    is exactly zero at fixed decisions (the march state never reads scene
    values outside comparisons), so ``sc`` rides as a closure constant —
    scene/texture gradients flow through the slot re-intersection in
    :func:`render_fast` instead.
    """
    if backward not in ("pallas", "replay"):
        raise ValueError(f"unknown backward mode {backward!r}")
    # The adjoint kernel runs per-tile outside shard_map plumbing; under a
    # mesh the replay path (SPMD-partitionable scan) is used instead.
    use_pallas_bwd = backward == "pallas" and mesh is None

    # TRACED texels (inverse rendering optimizing the texture, config 5):
    # the march only reads ``tex`` for the in-kernel opaque-stop flags,
    # which are unprovable from traced data anyway (_opaque_flags returns
    # None) — and keeping the traced stack in the custom_vjp closures leaks
    # a linearize-level tracer out of the AD scope (UnexpectedTracerError).
    # Drop it: identical march semantics, legal closures.
    import jax.core as _core

    if tex is not None and isinstance(tex.data, _core.Tracer):
        tex = None

    @jax.custom_vjp
    def f(origin, direction, r_s):
        return march_scene(origin, direction, active, r_s, sc, cfg,
                           n_slots=n_slots, interpret=interpret, mesh=mesh,
                           compact=compact, test_ray=test_ray, tex=tex)

    def fwd(origin, direction, r_s):
        if use_pallas_bwd:
            # The forward ALSO records the per-lane event planes (terminal
            # step, slot-record steps) that let the backward kernel replay
            # every discrete decision scene-free.
            fdir, fpos, status, slots, nhits, ev = march_scene(
                origin, direction, active, r_s, sc, cfg, n_slots=n_slots,
                interpret=interpret, test_ray=test_ray, tex=tex, events=True)
            return ((fdir, fpos, status, slots, nhits),
                    (origin, direction, r_s, status, ev))
        return f(origin, direction, r_s), (origin, direction, r_s, None,
                                           None)

    def bwd(residuals, cotangent):
        origin, direction, r_s, status, ev = residuals
        if use_pallas_bwd:
            ct_fdir, ct_fpos, _ct_status, ct_slots, _ct_nhits = cotangent
            return march_scene_bwd(
                origin, direction, r_s, cfg,
                (ct_fdir, ct_fpos, ct_slots), status, ev, n_slots=n_slots,
                interpret=interpret)

        def g(origin, direction, r_s):
            return march_scene_jnp(origin, direction, active, r_s, sc, cfg,
                                   n_slots=n_slots, test_ray=test_ray,
                                   tex=tex)

        _, vjp = jax.vjp(g, origin, direction, jnp.asarray(r_s, jnp.float32))
        return vjp(cotangent)

    f.defvjp(fwd, bwd)
    return f(origin, direction, jnp.asarray(r_s, jnp.float32))


def noise_field(cfg: RenderConfig, u_ndc, v_ndc) -> jnp.ndarray:
    """The per-pixel random field behind the noise-skip mask (frag:879-881),
    for cfg's ``noise_mode`` — zeros when noise is off.

    Factored out so tile-sharded renderers can compute it on the FULL pixel
    grid before shard_map: ``pixel_hash_rand`` (and the uniform mode) hash
    absolute pixel coordinates, which a tile-local computation cannot see.
    """
    if cfg.percent_black >= 0.0 and cfg.noise_mode != "none":
        if cfg.noise_mode == "glsl":
            uv_vec = jnp.stack(
                [u_ndc, v_ndc * (cfg.height / cfg.width)], axis=-1)
            return glsl_rand(uv_vec)
        if cfg.noise_mode == "hash":
            return pixel_hash_rand(cfg.width, cfg.height, cfg.noise_seed)
        if cfg.noise_mode == "tile":
            from .render import tile_hash_rand

            return tile_hash_rand(cfg.width, cfg.height, cfg.noise_seed,
                                  cfg.noise_tile)
        return jax.random.uniform(jax.random.key(cfg.noise_seed), u_ndc.shape)
    return jnp.zeros(u_ndc.shape, jnp.float32)


def _render_fast_tile_sparse(sc, cam, cfg, background, tex, r_s, n_slots,
                             interpret, overflow, differentiable, test_ray,
                             skip_empty_slots, opaque_stop, compact_slots,
                             atlas=None):
    """Static tile pre-compaction for noise-sparse frames.

    With the tile-coherent noise mask (cfg.noise_mode == "tile"), which tiles
    the reference's percent_black skip kills (frag:879-881, main.cpp:66) is a
    pure function of STATIC config — so the surviving tiles are a COMPILE
    TIME constant, and the whole pipeline (march kernel, level composition,
    every texel fetch) runs on a dense pseudo-image of just those tiles:
    cost scales with (1 - percent_black) instead of paying full-frame fetch
    latency for lanes that render black.  Measured at the reference default
    (1280x720, percent_black=0.75): 30.1 ms full-frame -> see BENCH_r03.

    One runtime wrinkle: RADIAL pixels render flat REGARDLESS of noise (the
    reference tests radiality before the noise skip, frag:866-881), and
    radiality depends on the camera.  Noise-dropped tiles containing a
    radial pixel ride a small dynamic slack (16 tiles, gathered by a
    runtime nonzero) — far more than the exact-alignment epsilon test can
    produce (a ~4.5e-4 rad cone around +-origin: a few pixels in at most a
    couple of tiles).  Beyond-slack radial tiles would render black — a
    deviation documented here and never observed.
    """
    import dataclasses

    f32 = jnp.float32
    H, W = cfg.height, cfg.width
    th, tw = cfg.noise_tile
    nth, ntw = H // th, W // tw
    nt = nth * ntw
    from .render import tile_hash_rand_np

    rnd_np = tile_hash_rand_np(W, H, cfg.noise_seed, (th, tw))
    tile_rnd = rnd_np[::th, ::tw].reshape(-1)
    keep_static = tile_rnd > cfg.percent_black
    static_ids = np.nonzero(keep_static)[0].astype(np.int32)
    SLACK = 16

    u_ndc, v_ndc = cam_mod.pixel_grid(W, H)
    origin, direction = cam_mod.generate_rays(cam, u_ndc, v_ndc, W, H)
    radial = physics.is_radial(direction, geo.safe_normalize(origin))

    def tz(x):
        xx = x.reshape((nth, th, ntw, tw) + x.shape[2:])
        return jnp.moveaxis(xx, 2, 1).reshape((nt, th, tw) + x.shape[2:])

    dropped_np = jnp.asarray(~keep_static)
    radial_t = jnp.any(tz(radial), axis=(1, 2)) & dropped_np
    dyn_ids = jnp.nonzero(radial_t, size=SLACK, fill_value=nt)[0]
    ids = jnp.concatenate([jnp.asarray(static_ids), dyn_ids.astype(jnp.int32)])
    capk = int(ids.shape[0])
    valid_row = jnp.concatenate([
        jnp.ones(len(static_ids), bool), dyn_ids < nt])

    def gather_plane(x):
        rows = tz(x)[ids]  # fill ids clamp; garbage dropped at scatter
        return rows.reshape((capk * th, tw) + rows.shape[3:])

    # Invalid slack rows get rnd=0 (<= percent_black >= 0) so every lane in
    # them is noise-skipped: no march work, no slot recordings.
    rnd_g = gather_plane(jnp.asarray(rnd_np))
    rnd_g = jnp.where(jnp.repeat(valid_row, th)[:, None], rnd_g, 0.0)
    pre = dict(origin=gather_plane(origin), direction=gather_plane(direction),
               u_ndc=gather_plane(u_ndc), v_ndc=gather_plane(v_ndc),
               rnd=rnd_g)
    inner_cfg = dataclasses.replace(cfg, crosshair=False)
    out = render_fast(sc, None, inner_cfg, background, tex, r_s,
                      n_slots=n_slots, interpret=interpret,
                      overflow="ignore" if overflow == "ignore" else "return",
                      differentiable=differentiable, test_ray=test_ray,
                      skip_empty_slots=skip_empty_slots,
                      opaque_stop=opaque_stop, compact_slots=compact_slots,
                      precomputed=pre, atlas=atlas)
    img_d, n_over = out if overflow != "ignore" else (out, None)

    rows = img_d.reshape((capk, th, tw, 4))
    full_t = jnp.zeros((nt, th, tw, 4), f32).at[ids].set(rows)
    img = jnp.moveaxis(full_t.reshape(nth, ntw, th, tw, 4), 1, 2)
    img = img.reshape(H, W, 4)
    if cfg.crosshair:
        # Crosshair shows over skipped tiles too (the reference draws it
        # before the noise test, frag:845-857) — add it on the full frame.
        ch = crosshair_mask(u_ndc, v_ndc, W, H)
        img = img + jnp.where(ch[..., None], jnp.array(CROSSHAIR_COLOR, f32),
                              0.0)
    if overflow == "ignore":
        return img
    if overflow == "return":
        return img, n_over
    # "warn": mirror render_fast's host-side degradation.
    if not isinstance(n_over, jax.core.Tracer):
        import warnings

        n = int(n_over)
        if n:
            warnings.warn(
                f"render_fast: {n} rays exceeded n_slots={n_slots} "
                "recording slots (extra translucent hits dropped; raise "
                "n_slots)")
    return img


def _render_fast_lane_sparse(sc, cam, cfg, background, tex, r_s, n_slots,
                             interpret, overflow, differentiable, test_ray,
                             skip_empty_slots, opaque_stop, compact_slots,
                             atlas=None):
    """Static per-LANE pre-compaction for per-pixel noise masks.

    The reference's default interactive workload drops 75% of pixels with a
    per-pixel hash (percent_black, main.cpp:66, frag:879-881).  Per-pixel
    speckle is the WORST case for the tile machinery: survivors scatter
    uniformly, so every march tile stays live and every full-batch fetch
    pays all H*W index rows (measured 43 ms at 1280x720/0.75 on v5e).  But
    the canonical hash mask (render.pixel_hash_rand) is a pure function of
    STATIC config — the survivor pixel list is a COMPILE-TIME constant — so
    this path renders a dense pseudo-image of just the survivors:

      * ray origins/directions/uv/noise for the compacted lanes are
        COMPUTED elementwise from the (mostly constant) pixel-id vector —
        no input gather at all (a per-lane gather would pay ~25 ns/row,
        docs/tpu_cost_model.md section 1);
      * march, composition levels, and every texel fetch run on
        ~(1 - percent_black) * H * W lanes;
      * ONE scatter writes the survivors back over a black frame.

    Radial pixels render flat regardless of noise (the reference tests
    radiality before the noise skip, frag:866-881) and radiality is
    camera-dependent: noise-dropped radial pixels ride a small dynamic
    slack of whole (8, 128) tiles appended to the static lanes (radiality
    is an exact-alignment epsilon test — a ~4.5e-4 rad cone around +-origin
    — so at most a couple of tiles ever qualify; beyond-slack radial tiles
    would render black, same documented deviation as the tile-sparse path).
    Slack lanes recompute their own hash value, so kept pixels among them
    (already rendered as static lanes) scatter to a discard slot instead of
    double-writing.
    """
    import dataclasses

    f32 = jnp.float32
    H, W = cfg.height, cfg.width
    from .render import pixel_hash_rand_np

    rnd_np = pixel_hash_rand_np(W, H, cfg.noise_seed)
    keep_np = (rnd_np > cfg.percent_black).reshape(-1)
    static_ids = np.nonzero(keep_np)[0].astype(np.int32)
    n_static = len(static_ids)

    TH, TW = 8, 128
    SLACK_TILES = 4
    nth, ntw = H // TH, W // TW
    nt = nth * ntw

    # Dynamic radial-slack tiles: dropped tiles containing a radial pixel.
    u_full, v_full = cam_mod.pixel_grid(W, H)
    o_full, d_full = cam_mod.generate_rays(cam, u_full, v_full, W, H)
    radial = physics.is_radial(d_full, geo.safe_normalize(o_full))
    rad_drop = radial & jnp.asarray(~keep_np.reshape(H, W))
    rt = rad_drop.reshape(nth, TH, ntw, TW).any(axis=(1, 3)).reshape(-1)
    tids = jnp.nonzero(rt, size=SLACK_TILES, fill_value=nt)[0].astype(jnp.int32)
    tile_base = jnp.where(tids < nt,
                          (tids // ntw) * TH * W + (tids % ntw) * TW,
                          H * W)
    within = jnp.arange(TH * TW, dtype=jnp.int32)
    within = (within // TW) * W + (within % TW)
    dyn_ids = jnp.where(tile_base[:, None] < H * W,
                        tile_base[:, None] + within[None, :],
                        H * W).reshape(-1)
    n_dyn = SLACK_TILES * TH * TW

    cap_rows = -(-(n_static + n_dyn) // 128)
    cap_rows = -(-cap_rows // 16) * 16  # march block_h alignment
    cap = cap_rows * 128
    ids = jnp.concatenate([
        jnp.asarray(static_ids), dyn_ids,
        jnp.full((cap - n_static - n_dyn,), H * W, jnp.int32)])

    # Per-lane quantities COMPUTED from the pixel id (no gather): the id IS
    # y*W + x, which is also the hash input of pixel_hash_rand.
    pid = jnp.minimum(ids, H * W - 1)
    py = (pid // W).astype(f32)
    px = (pid % W).astype(f32)
    u2 = ((2.0 * (px + 0.5)) / W - 1.0).reshape(cap_rows, 128)
    v2 = (1.0 - (2.0 * (py + 0.5)) / H).reshape(cap_rows, 128)
    origin, direction = cam_mod.generate_rays(cam, u2, v2, W, H)
    u32 = jnp.uint32
    h = pid.astype(u32) + u32(cfg.noise_seed & 0xFFFFFFFF) * u32(0x9E3779B9)
    h = h ^ (h >> 16)
    h = h * u32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * u32(0x846CA68B)
    h = h ^ (h >> 16)
    rnd = h.astype(f32) * f32(2.3283064365386963e-10)
    # Filler/invalid-slack lanes (sentinel id): rnd 0 <= percent_black skips
    # them — no march work, no slot recordings, black output.
    rnd = jnp.where(ids == H * W, 0.0, rnd).reshape(cap_rows, 128)

    pre = dict(origin=origin, direction=direction, u_ndc=u2, v_ndc=v2,
               rnd=rnd)
    inner_cfg = dataclasses.replace(cfg, crosshair=False)
    out = render_fast(sc, None, inner_cfg, background, tex, r_s,
                      n_slots=n_slots, interpret=interpret,
                      overflow="ignore" if overflow == "ignore" else "return",
                      differentiable=differentiable, test_ray=test_ray,
                      skip_empty_slots=skip_empty_slots,
                      opaque_stop=opaque_stop, compact_slots=compact_slots,
                      precomputed=pre, atlas=atlas)
    img_d, n_over = out if overflow != "ignore" else (out, None)

    # Slack lanes whose pixel the mask KEPT are duplicates of static lanes:
    # scatter them to the discard slot.  (Identical per-lane math, but slot
    # compaction groups them differently — ~1 ulp — and duplicate .set order
    # is unspecified.)
    is_dyn = np.zeros(cap, bool)
    is_dyn[n_static:] = True
    scatter_ids = jnp.where(jnp.asarray(is_dyn)
                            & (rnd.reshape(-1) > cfg.percent_black),
                            H * W, ids)
    rows = img_d.reshape(cap, 4)
    full = jnp.zeros((H * W + 1, 4), f32).at[scatter_ids].set(rows)
    img = full[:H * W].reshape(H, W, 4)
    if cfg.crosshair:
        # Crosshair shows over skipped pixels too (the reference draws it
        # before the noise test, frag:845-857).
        ch = crosshair_mask(u_full, v_full, W, H)
        img = img + jnp.where(ch[..., None], jnp.array(CROSSHAIR_COLOR, f32),
                              0.0)
    if overflow == "ignore":
        return img
    if overflow == "return":
        return img, n_over
    if not isinstance(n_over, jax.core.Tracer):
        import warnings

        n = int(n_over)
        if n:
            warnings.warn(
                f"render_fast: {n} rays exceeded n_slots={n_slots} "
                "recording slots (extra translucent hits dropped; raise "
                "n_slots)")
    return img


def render_fast(
    sc: Scene,
    cam: cam_mod.Camera,
    cfg: RenderConfig,
    background: Texture,
    tex: Optional[TextureStack] = None,
    r_s=1.0,
    n_slots: int = 4,
    interpret: bool = False,
    overflow: str = "warn",
    mesh=None,
    differentiable: bool = False,
    test_ray=None,
    skip_empty_slots: bool = False,
    opaque_stop: bool = True,
    compact_slots="auto",
    precomputed: Optional[dict] = None,
    atlas=None,
) -> jnp.ndarray:
    """Full-featured fast renderer: Pallas march + K-slot jnp shading.

    Matches render() — including split-screen modes, noise masks, crosshair,
    the horizon_softness soft silhouette AND the debug test-ray overlay
    (``test_ray=``: tube segments ride the kernel's cylinder table as
    validity rows; the slot re-intersection shades them red/green).  Consider
    raising ``n_slots`` with a test ray on: tube crossings consume recording
    slots like any other hit.

    ``overflow`` controls slot-overflow detection (rays crossing more than
    ``n_slots`` translucent hits drop the extras — the documented deviation):
      * "warn": jax.debug.print when any ray overflowed (default); on
        backends without host callbacks (the axon TPU tunnel) this degrades
        to a host-side warning for eager calls and silence under jit —
        prefer "return" there;
      * "return": return (image, n_overflowed) so callers can re-render with
        more slots;
      * "ignore": the round-1 silent behavior.

    ``differentiable=True`` routes the march through
    :func:`march_scene_diff`, making the whole renderer reverse-mode
    differentiable at kernel forward speed (backward = checkpointed
    validity-march replay + the K slot shading passes, NOT the dense
    100-intersect/shade twin).

    ``compact_slots`` compacts the trailing passes' TEXEL FETCHES (round 3:
    the passes themselves are full-batch elementwise — measured free on TPU —
    and only the gathers are compacted; see the composition comment in the
    body).  Trailing passes are active for only a few % of lanes (the demo
    scene records a second hit on ~13% of pixels, a third on ~2%), yet a
    full-batch fetch pays the per-index gather latency for EVERY lane.
      * "auto" (default): trailing pass k fetches at capacity
        ``n_pixels / 4**min(k, 3)``, the final background at ``n_pixels/4``;
        forced off under ``mesh`` (global nonzero/scatter would reshard);
      * None: every fetch runs at full batch;
      * a sequence of per-pass capacities (None entries = full fetch).
    Lanes beyond a capacity take a full-batch fallback under a ``lax.cond``
    that fires only on overflow (never drops lanes; ~1 ulp fusion tolerance —
    textures.atlas_fetch_compact).  Ignored for trilinear (legacy full-pass
    path; screen-space LOD needs the full grid).  ``skip_empty_slots`` only
    affects the trilinear path for the same reason.

    ``atlas``: a prebuilt :class:`textures.FetchAtlas` for the bilinear
    path.  Default None builds (and identity-caches) one from
    (background, tex) as a jit-closure CONSTANT — fine up to ~250 MB, but
    this environment's remote-compile tunnel ships closure constants in the
    compile request (HTTP 413 past ~256 MB).  Callers with a big atlas
    (the 381 MB f32 demo quadrow, any 8k background) should build it once
    with :func:`textures.build_atlas_cached` and pass it as an ARGUMENT of
    their jitted function instead: measured 2.88 ms vs 2.70 ms per
    262k-index fetch — parameters stay on the gather fast path.

    ``precomputed``: dict with keys ``origin``, ``direction`` (each
    batch+(3,)), ``u_ndc``, ``v_ndc``, ``rnd`` (each batch-shaped) replacing
    the internal pixel-grid / ray / noise-field generation.  This is the
    tile-sharding hook (``sharding.make_sharded_render(renderer="fast")``):
    the caller computes full-grid quantities outside shard_map (they depend
    on absolute pixel coordinates) and the whole remaining pipeline — march
    kernel, compacted slot passes, background — runs tile-local per device.
    ``cam`` is unused (may be None) when ``precomputed`` is given.
    """
    f32 = jnp.float32
    r_s = jnp.asarray(r_s, f32)
    H, W = cfg.height, cfg.width
    trilinear = cfg.texture_filter == "trilinear"
    if cfg.texture_filter not in ("bilinear", "trilinear"):
        raise ValueError(f"unknown texture_filter {cfg.texture_filter!r}")
    if (precomputed is None and mesh is None and not trilinear
            and cfg.noise_mode == "hash" and cfg.percent_black > 0.0
            and cfg.raytrace_type == cam_mod.CURVED
            and compact_slots is not None
            and H % 8 == 0 and W % 128 == 0 and H * W >= 64 * 8 * 128):
        # Per-PIXEL noise masks (reference-faithful speckle) kill static
        # lanes — run the whole pipeline on just the surviving lanes,
        # compacted into a dense pseudo-image (see the function docstring).
        return _render_fast_lane_sparse(
            sc, cam, cfg, background, tex, r_s, n_slots, interpret, overflow,
            differentiable, test_ray, skip_empty_slots, opaque_stop,
            compact_slots, atlas=atlas)
    if (precomputed is None and mesh is None and not trilinear
            and cfg.noise_mode == "tile" and cfg.percent_black > 0.0
            and cfg.raytrace_type == cam_mod.CURVED
            and compact_slots is not None
            and H % cfg.noise_tile[0] == 0 and W % cfg.noise_tile[1] == 0
            and H * W >= 16 * cfg.noise_tile[0] * cfg.noise_tile[1]):
        # Tile-coherent noise masks kill whole tiles at STATIC config — run
        # the entire pipeline on just the surviving tiles (march, levels,
        # fetches all scale by ~(1 - percent_black)).
        return _render_fast_tile_sparse(
            sc, cam, cfg, background, tex, r_s, n_slots, interpret, overflow,
            differentiable, test_ray, skip_empty_slots, opaque_stop,
            compact_slots, atlas=atlas)
    if trilinear:
        from .textures import build_mips

        if not background.mips:
            background = background._replace(mips=build_mips(background.data))
        if tex is not None and not tex.mips:
            tex = tex._replace(mips=build_mips(tex.data))

    if precomputed is None:
        u_ndc, v_ndc = cam_mod.pixel_grid(W, H)
        origin, direction = cam_mod.generate_rays(cam, u_ndc, v_ndc, W, H)
        rnd = noise_field(cfg, u_ndc, v_ndc)
    else:
        origin = precomputed["origin"]
        direction = precomputed["direction"]
        u_ndc = precomputed["u_ndc"]
        v_ndc = precomputed["v_ndc"]
        rnd = precomputed["rnd"]
    batch = u_ndc.shape

    base = jnp.zeros(batch + (4,), f32)
    if cfg.crosshair:
        ch = crosshair_mask(u_ndc, v_ndc, W, H)
        base = jnp.where(ch[..., None], jnp.array(CROSSHAIR_COLOR, f32), base)

    if cfg.raytrace_type == cam_mod.FLAT:
        mode_flat = jnp.ones(batch, bool)
    elif cfg.raytrace_type == cam_mod.HALF_WIDTH:
        mode_flat = u_ndc > 2.0 * cfg.curved_percentage - 1.0
    elif cfg.raytrace_type == cam_mod.HALF_HEIGHT:
        mode_flat = v_ndc > 2.0 * cfg.curved_percentage - 1.0
    else:
        mode_flat = jnp.zeros(batch, bool)

    normal_vec0 = geo.safe_normalize(origin)
    flat_px = mode_flat | physics.is_radial(direction, normal_vec0)

    if cfg.percent_black >= 0.0 and cfg.noise_mode != "none":
        noise_skip = ~flat_px & (rnd <= f32(cfg.percent_black))
    else:
        noise_skip = jnp.zeros(batch, bool)

    march_px = ~flat_px & ~noise_skip

    if cfg.raytrace_type != cam_mod.FLAT:
        march = march_scene_diff if differentiable else march_scene
        fdir, fpos, status, slots, nhits = march(
            origin, direction, march_px, r_s, sc, cfg, n_slots=n_slots,
            interpret=interpret, mesh=mesh, test_ray=test_ray,
            tex=tex if opaque_stop else None)
    else:
        fdir, fpos = direction, origin
        status = jnp.full(batch, STATUS_ESCAPED, f32)
        slots = []
        nhits = jnp.zeros(batch, f32)

    # ------------------------------------------------------------------
    # Composition.  Two paths:
    #
    #   * bilinear (the parity default) — the ATLAS path: every pass runs
    #     full-batch ELEMENTWISE (intersect + Phong arithmetic measure ~0.05
    #     ms per 512^2 pass on v5e — free), and the only gathers are texel
    #     fetches: ONE full-batch merged-atlas fetch in pass 0 (each lane
    #     fetches its hit's texel OR its sky texel), small compacted fetches
    #     for the trailing passes and the final background.  This is what
    #     turned the 40 ms round-2 frame into a march-bound one: the round-2
    #     pipeline paid a full texture pass (~7.1 ms, all gather machinery)
    #     per slot plus a full background gather (4.7 ms).
    #
    #   * trilinear (opt-in, beyond reference) — the legacy per-pass path:
    #     screen-space LOD needs full-grid sampling, so each pass samples
    #     through the mip machinery at full batch.
    #
    # Both compose identically: slots in order, additive, first-opaque
    # cutoff (frag:930-932), background for still-open lanes (frag:935).
    # The far-field/flat ray folds into each lane's first free slot; lanes
    # with ALL slots recorded AND a far ray ride the trailing residual pass.
    from .scene import OBJECT_TYPE_SPECIAL
    from .shading import (_concrete_none_negative, _shade_lit, equirect_uv,
                          texel_request)
    from .shading import _gather as _table_gather

    use_pos = jnp.where(flat_px[..., None], origin, fpos)
    use_dir = jnp.where(flat_px[..., None], direction, fdir)
    far_finish = march_px & (status == STATUS_FLAT_FINISH)
    needs_far = flat_px | far_finish

    color = jnp.zeros(batch + (4,), f32)
    # Lanes still accumulating (no opaque hit yet).  Flat pixels participate:
    # their far ray is folded into slot 0 (they record nothing in the kernel).
    open_ = march_px | flat_px
    captured_shaded = jnp.zeros(batch, bool)  # first opaque hit was the BH
    recs = [slen > 0.0 for _, _, slen in slots]
    # Index of each lane's first free slot == number of recorded slots
    # (the kernel fills slots in order).
    n_rec = sum((r.astype(jnp.int32) for r in recs),
                jnp.zeros(batch, jnp.int32))
    bsz = int(np.prod(batch))
    zeros3 = jnp.zeros(batch + (3,), f32)
    unit_x = jnp.array([1.0, 0.0, 0.0], f32)

    # Soft shadow silhouette prelude (identical math to render.py:297-329):
    # every background contribution is scaled by 1 - sigmoid of the photon's
    # conserved impact parameter against b_crit = 3*sqrt(3)/2 r_s; computed
    # up front because the atlas path composes some background in pass 0.
    soft = cfg.horizon_softness > 0.0
    if soft:
        s_soft = jnp.float32(cfg.horizon_softness)
        tangent_vec0 = geo.safe_normalize(
            geo.cross(geo.cross(normal_vec0, direction), normal_vec0))
        u0_ = 1.0 / geo.length(origin)
        dt0 = geo.dot(direction, tangent_vec0)
        dt0 = jnp.where(jnp.abs(dt0) < 1e-12, 1e-12, dt0)
        du0 = -u0_ * geo.dot(direction, normal_vec0) / dt0
        e0 = du0 * du0 + u0_ * u0_ * (1.0 - r_s * u0_)
        b_geo = 1.0 / jnp.sqrt(jnp.maximum(e0, 1e-20))
        b_crit = jnp.float32(1.5 * jnp.sqrt(3.0)) * r_s
        b_flat = geo.safe_length(geo.cross(use_pos, use_dir))
        alpha_curved = jax.nn.sigmoid((b_crit - b_geo) / s_soft)
        alpha_flat = jax.nn.sigmoid((r_s - b_flat) / s_soft)
        # Straight rays (flat pixels + far-field continuations) use the flat
        # impact parameter; marched rays the conserved geodesic one.
        alpha_sh = jnp.where(needs_far, alpha_flat, alpha_curved)
        bg_scale = (1.0 - alpha_sh)[..., None]
    else:
        bg_scale = jnp.ones(batch + (1,), f32)

    bg_hard = flat_px | (march_px & (status != STATUS_CAPTURED))

    def composite(eff, rgba, hvalid, is_bh):
        nonlocal color, captured_shaded, open_
        take = eff & open_ & hvalid
        opaque_take = take & (rgba[..., 3] == 1.0)
        color = color + jnp.where(take[..., None], rgba, 0.0)
        captured_shaded = captured_shaded | (opaque_take & is_bh)
        open_ = open_ & ~opaque_take

    if not trilinear:
        # ---------------- atlas path (bilinear) ----------------
        # The tile-compacted level engine (see compose.py): full-batch
        # elementwise geometry, ONE merged texel-or-sky fetch per lane per
        # level, trailing levels tile-compacted to the (clustered) lanes
        # that still have work.
        from .compose import compose_atlas
        from .textures import build_atlas_cached

        # Texels are "frozen" (not a differentiation target) unless the
        # atlas is being built from TRACED texture data inside this very
        # trace (inverse rendering optimizing texels); a caller-provided
        # atlas was built outside the grad and is frozen by construction.
        import jax.core as _core

        frozen = atlas is not None or not (
            isinstance(background.data, _core.Tracer)
            or (tex is not None and isinstance(tex.data, _core.Tracer)))
        if atlas is None:
            atlas = build_atlas_cached(background, tex)
        bgu, bgv = equirect_uv(use_dir)
        cap_drop = march_px & (status == STATUS_CAPTURED)
        # Tile compaction's nonzero/gather/scatter are global ops: under a
        # device mesh (march sharded via shard_map, composition under the
        # SPMD partitioner) they would reshard through ICI — run the levels
        # full-frame there.  (sharding.make_sharded_render's fast path runs
        # this WHOLE function per-shard via ``precomputed`` inside one
        # shard_map, where the compaction is tile-local and fine.)
        c_atlas, open_, captured_shaded = compose_atlas(
            sc, tex, atlas, r_s,
            slots=slots, recs=recs, n_rec=n_rec, needs_far=needs_far,
            use_pos=use_pos, use_dir=use_dir, bgu=bgu, bgv=bgv,
            bg_hard=bg_hard, bg_scale=bg_scale, soft=soft,
            cap_drop=cap_drop, open_init=open_, test_ray=test_ray,
            compact_tiles=(compact_slots is not None and mesh is None),
            frozen_texels=frozen)
        color = color + c_atlas
    else:
        # ---------------- legacy path (trilinear) ----------------
        # Screen-space LOD needs the full 2-D pixel grid per sampling pass,
        # so each pass runs the full shade() machinery; compact_slots is
        # rejected above for trilinear.
        def make_pass(start, sdir, slen, rec, fold):
            def run(_):
                safe_dir = jnp.where(fold[..., None], use_dir,
                                     jnp.where(rec[..., None], sdir, unit_x))
                safe_start = jnp.where(fold[..., None], use_pos, start)
                window = jnp.where(fold, -1.0,
                                   jnp.where(rec, slen * 1.0001 + 1e-5, 1.0))
                hit = intersect_scene(safe_start, safe_dir, window, sc, r_s,
                                      test_ray=test_ray)
                rgba = shade(hit, -safe_dir, sc, tex, trilinear=trilinear)
                return rgba, hit.valid, hit.obj_type == OBJECT_TYPE_SPECIAL

            def empty(_):
                return (jnp.zeros(batch + (4,), f32),
                        jnp.zeros(batch, bool), jnp.zeros(batch, bool))

            return run, empty

        def maybe_pass(eff, run, empty):
            # skip_empty_slots=True runtime-skips slots nobody filled or
            # folded into (lax.cond executes one branch only under jit).
            # Default OFF: on TPU a cond branch receives the texture stack
            # as a branch OPERAND, knocking the gather off XLA's
            # constant-operand fast path (docs/tpu_cost_model.md section 3).
            if skip_empty_slots:
                return jax.lax.cond(jnp.any(eff), run, empty, None)
            return run(None)

        for k, ((start, sdir, slen), rec) in enumerate(zip(slots, recs)):
            fold_k = needs_far & (n_rec == k)
            eff = rec | fold_k
            run, empty = make_pass(start, sdir, slen, rec, fold_k)
            rgba, hvalid, is_bh = maybe_pass(eff, run, empty)
            composite(eff, rgba, hvalid, is_bh)

        # Residual far rays: every slot recorded AND far-field continuation
        # (rare), or FLAT mode where there are no slots at all to fold into.
        residual = needs_far & (n_rec >= len(slots))
        run, empty = make_pass(zeros3, zeros3, jnp.zeros(batch, f32),
                               jnp.zeros(batch, bool), residual)
        if cfg.raytrace_type == cam_mod.FLAT or (not slots):
            rgba, hvalid, is_bh = run(None)
        else:
            rgba, hvalid, is_bh = jax.lax.cond(jnp.any(residual), run, empty,
                                               None)
        composite(residual, rgba, hvalid, is_bh)

        # Background: every lane still open shows the sky — except captured
        # rays (capture is opaque black even when its slot was dropped by
        # overflow, so excluding STATUS_CAPTURED keeps the shadow opaque).
        march_bg = open_ & bg_hard
        bg = get_background(background, use_dir, trilinear=trilinear)
        if soft:
            captured_m = (captured_shaded
                          | (march_px & (status == STATUS_CAPTURED) & open_))
            bg_mask = march_bg | captured_m
            color = color + jnp.where(bg_mask[..., None], bg * bg_scale, 0.0)
        else:
            color = color + jnp.where(march_bg[..., None], bg, 0.0)

    img = base + color
    if overflow == "ignore":
        return img
    n_over = jnp.sum((nhits > float(n_slots)).astype(jnp.int32))
    if overflow == "return":
        return img, n_over
    if overflow == "warn":
        from .profiling import host_callbacks_supported

        if host_callbacks_supported():
            def _warn(n):
                jax.debug.print(
                    "render_fast: {n} rays exceeded n_slots={k} recording "
                    "slots (extra translucent hits dropped; raise n_slots)",
                    n=n, k=n_slots)
            jax.lax.cond(n_over > 0, _warn, lambda n: None, n_over)
        elif not isinstance(n_over, jax.core.Tracer):
            # Backend without host callbacks (e.g. the axon TPU tunnel,
            # where an embedded debug.print CRASHES the whole computation
            # at run time): warn host-side when called eagerly; under jit
            # the count is a tracer and the warning is skipped — use
            # overflow="return" there to observe it.
            import warnings

            n = int(n_over)
            if n:
                warnings.warn(
                    f"render_fast: {n} rays exceeded n_slots={n_slots} "
                    "recording slots (extra translucent hits dropped; "
                    "raise n_slots)")
        return img
    raise ValueError(f"unknown overflow mode {overflow!r}")


def render_fast_auto(
    sc: Scene,
    cam,
    cfg: RenderConfig,
    background: Texture,
    tex: Optional[TextureStack] = None,
    r_s=1.0,
    *,
    start_slots: int = 2,
    max_slots: int = 8,
    **kw,
):
    """Host-level slot escalation around :func:`render_fast`.

    Every recording slot costs an intersect+shade pass (plus kernel VMEM for
    its 7 output planes), but how many slots a frame actually NEEDS depends
    on the scene and view: most scenes never stack more than 2 translucent
    hits on one ray, while a lensed accretion-disk close-up can cross the
    disk plane 3+ times — a static bound from scene composition is unsound
    (the reference has no bound at all: frag:930-932 accumulates every
    non-opaque hit along the march).

    This helper renders with ``start_slots`` and, whenever the kernel's
    uncapped hit counter reports dropped recordings, doubles the slot count
    (capped at ``max_slots``) and re-renders.  Each distinct slot count is a
    separate trace/compile, so this is a HOST-level loop for interactive and
    animation use where the required count stabilizes after the first frame
    — not for use under jit (use ``overflow="return"`` and manage slots
    yourself there).

    Returns ``(image, n_slots_used)``; at ``max_slots`` the image may still
    carry dropped hits (the documented deviation) — check with
    ``overflow="return"`` if that matters.
    """
    if "n_slots" in kw or "overflow" in kw:
        raise TypeError("render_fast_auto manages n_slots/overflow itself")
    n = int(start_slots)
    while True:
        img, n_over = render_fast(sc, cam, cfg, background, tex, r_s,
                                  n_slots=n, overflow="return", **kw)
        if n >= int(max_slots) or int(jax.device_get(n_over)) == 0:
            return img, n
        n = min(2 * n, int(max_slots))

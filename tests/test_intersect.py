"""Each analytic intersection vs the float64 oracle on random rays
(SURVEY.md section 4 item 1)."""

import numpy as np
import jax.numpy as jnp

from schwarzschild_tpu import intersect as jint
from schwarzschild_tpu import scene as sc_mod
from schwarzschild_tpu.oracle import reference as oracle


def _random_frame(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _random_rays(rng, n, target=None, spread=3.0):
    origins = rng.uniform(-10, 10, size=(n, 3))
    dirs = rng.normal(size=(n, 3))
    if target is not None:
        # Aim half the rays at the neighborhood of the primitive so the hit
        # branch is well exercised.
        aimed = (np.asarray(target) + rng.normal(scale=spread, size=(n, 3))
                 - origins)
        half = rng.random(n) < 0.5
        dirs = np.where(half[:, None], aimed, dirs)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    max_lam = np.where(rng.random(n) < 0.5, -1.0, rng.uniform(1, 30, n))
    return origins, dirs, max_lam


def _check_candidates(cand, expect_hits, name, atol=2e-4):
    """cand: _Cand with one primitive (N=1); expect_hits: list of oracle Hit."""
    got_valid = np.asarray(cand.valid)[:, 0]
    exp_valid = np.array([h.is_hit for h in expect_hits])
    # At max_lambda/tangency boundaries f32 vs f64 may disagree — allow a tiny
    # number of flips but require bulk agreement.
    agree = got_valid == exp_valid
    assert agree.mean() > 0.97, f"{name}: valid mismatch {1 - agree.mean():.3f}"
    both = got_valid & exp_valid & agree
    assert both.sum() >= 10, f"{name}: too few hits to be meaningful"
    idx = np.nonzero(both)[0]
    np.testing.assert_allclose(
        np.asarray(cand.dist)[idx, 0], [expect_hits[i].dist for i in idx],
        rtol=2e-4, atol=atol, err_msg=f"{name}: dist")
    np.testing.assert_allclose(
        np.asarray(cand.point)[idx, 0], [expect_hits[i].point for i in idx],
        rtol=2e-3, atol=5e-3, err_msg=f"{name}: point")
    np.testing.assert_allclose(
        np.asarray(cand.uv)[idx, 0], [expect_hits[i].uv for i in idx],
        rtol=2e-3, atol=2e-3, err_msg=f"{name}: uv")
    ts = np.stack([np.stack([np.asarray(cand.tangent)[i, 0],
                             np.asarray(cand.bitangent)[i, 0],
                             np.asarray(cand.normal)[i, 0]], axis=1)
                   for i in idx])
    ots = np.stack([expect_hits[i].tangent_space for i in idx])
    np.testing.assert_allclose(ts, ots, rtol=2e-3, atol=3e-3,
                               err_msg=f"{name}: tangent space")


def test_sphere(rng):
    pos = np.array([1.0, -2.0, 0.5])
    o, d, ml = _random_rays(rng, 300, target=pos)
    axes = _random_frame(rng)
    r = 2.3
    cand = jint.sphere_candidates(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(ml, jnp.float32),
        jnp.asarray(pos[None], jnp.float32), jnp.asarray(axes[None], jnp.float32),
        jnp.asarray([r], jnp.float32), jnp.zeros(1, jnp.int32))
    exp = [oracle.sphere_intersect(o[i], d[i], pos, axes, r, ml[i])
           for i in range(len(o))]
    _check_candidates(cand, exp, "sphere")


def test_plane(rng):
    o, d, ml = _random_rays(rng, 300)
    pos = np.array([0.0, 1.0, 0.0])
    axes = _random_frame(rng)
    planes = sc_mod.PlanesSoA(
        pos=jnp.asarray(pos[None], jnp.float32),
        axes=jnp.asarray(axes[None], jnp.float32),
        texture_offset=jnp.zeros((1, 2), jnp.float32),
        texture_size=jnp.ones((1, 2), jnp.float32),
        repeat_texture=jnp.ones(1, bool),
        mat_idx=jnp.zeros(1, jnp.int32))
    cand = jint.plane_candidates(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(ml, jnp.float32), planes)
    exp = [oracle.plane_intersect(o[i], d[i], pos, axes, ml[i])
           for i in range(len(o))]
    _check_candidates(cand, exp, "plane", atol=1e-3)


def test_disk(rng):
    pos = np.array([0.5, 0.0, -1.0])
    o, d, ml = _random_rays(rng, 300, target=pos)
    axes = _random_frame(rng)
    r = 3.0
    disks = sc_mod.DisksSoA(
        pos=jnp.asarray(pos[None], jnp.float32),
        axes=jnp.asarray(axes[None], jnp.float32),
        radius=jnp.asarray([r], jnp.float32),
        mat_idx=jnp.zeros(1, jnp.int32))
    cand = jint.disk_candidates(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(ml, jnp.float32), disks)
    exp = [oracle.disk_intersect(o[i], d[i], pos, axes, r, ml[i])
           for i in range(len(o))]
    _check_candidates(cand, exp, "disk")


def test_hollow_disk(rng):
    pos = np.zeros(3)
    o, d, ml = _random_rays(rng, 300, target=pos, spread=4.0)
    axes = np.eye(3)
    hd = sc_mod.HollowDisksSoA(
        pos=jnp.asarray(pos[None], jnp.float32),
        axes=jnp.asarray(axes[None], jnp.float32),
        inner_radius=jnp.asarray([2.5], jnp.float32),
        outer_radius=jnp.asarray([5.0], jnp.float32),
        mat_idx=jnp.zeros(1, jnp.int32))
    cand = jint.hollow_disk_candidates(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(ml, jnp.float32), hd)
    exp = [oracle.hollow_disk_intersect(o[i], d[i], pos, axes, 2.5, 5.0, ml[i])
           for i in range(len(o))]
    _check_candidates(cand, exp, "hollow_disk")


def test_cylinder(rng):
    pos = np.array([0.0, -1.0, 2.0])
    o, d, ml = _random_rays(rng, 300, target=pos)
    axes = _random_frame(rng)
    h, r = 5.0, 1.5
    cand = jint.cylinder_candidates(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(ml, jnp.float32),
        jnp.asarray(pos[None], jnp.float32), jnp.asarray(axes[None], jnp.float32),
        jnp.asarray([h], jnp.float32), jnp.asarray([r], jnp.float32),
        jnp.zeros(1, jnp.int32))
    exp = [oracle.cylinder_intersect(o[i], d[i], pos, axes, h, r, ml[i])
           for i in range(len(o))]
    _check_candidates(cand, exp, "cylinder")


def test_rectangle(rng):
    pos = np.array([1.0, 0.0, -2.0])
    o, d, ml = _random_rays(rng, 300, target=pos, spread=1.5)
    axes = _random_frame(rng)
    w, h = 3.0, 2.0
    rects = sc_mod.RectanglesSoA(
        pos=jnp.asarray(pos[None], jnp.float32),
        axes=jnp.asarray(axes[None], jnp.float32),
        width=jnp.asarray([w], jnp.float32),
        height=jnp.asarray([h], jnp.float32),
        mat_idx=jnp.zeros(1, jnp.int32))
    cand = jint.rectangle_candidates(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(ml, jnp.float32), rects)
    exp = [oracle.rectangle_intersect(o[i], d[i], pos, axes, w, h, ml[i])
           for i in range(len(o))]
    _check_candidates(cand, exp, "rectangle")


def test_box(rng):
    pos = np.array([-1.0, -1.0, -1.0])
    o, d, ml = _random_rays(rng, 300, target=pos, spread=1.5)
    axes = _random_frame(rng)
    w, dp, h = 2.0, 1.5, 3.0
    fp, fa, fw, fh = sc_mod.box_faces(pos, axes, w, dp, h)
    boxes = sc_mod.BoxesSoA(
        face_pos=jnp.asarray(fp[None], jnp.float32),
        face_axes=jnp.asarray(fa[None], jnp.float32),
        face_width=jnp.asarray(fw[None], jnp.float32),
        face_height=jnp.asarray(fh[None], jnp.float32),
        atlas_offset=jnp.asarray(sc_mod._BOX_ATLAS_OFFSETS),
        mat_idx=jnp.zeros(1, jnp.int32))
    cand = jint.box_candidates(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(ml, jnp.float32), boxes)
    exp = [oracle.box_intersect(o[i], d[i], fp, fa, fw, fh, ml[i])
           for i in range(len(o))]
    got_valid = np.asarray(cand.valid)[:, 0]
    exp_valid = np.array([e.is_hit for e in exp])
    agree = got_valid == exp_valid
    assert agree.mean() > 0.97
    both = np.nonzero(got_valid & exp_valid & agree)[0]
    assert len(both) >= 10, "too few box hits to be meaningful"
    np.testing.assert_allclose(np.asarray(cand.dist)[both, 0],
                               [exp[i].dist for i in both], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cand.uv)[both, 0],
                               [exp[i].uv for i in both], rtol=2e-3, atol=2e-3)


def test_box_atlas_covers_all_faces(rng):
    """Rays aimed at each face center must map into the face's atlas cell
    (frag:667-692 layout)."""
    pos = np.zeros(3)
    axes = np.eye(3)
    fp, fa, fw, fh = sc_mod.box_faces(pos, axes, 1.0, 1.0, 1.0)
    centers = np.array([
        [0.5, -1.0, 0.5], [0.5, 2.0, 0.5],   # bot (from below), top
        [0.5, 0.5, 2.0], [0.5, 0.5, -1.0],   # front (z+), back (z-)
        [-1.0, 0.5, 0.5], [2.0, 0.5, 0.5],   # left, right
    ])
    targets = np.array([
        [0.5, 0.5, 0.5], [0.5, 0.5, 0.5], [0.5, 0.5, 0.5],
        [0.5, 0.5, 0.5], [0.5, 0.5, 0.5], [0.5, 0.5, 0.5],
    ])
    cells = [(1, 0), (1, 2), (1, 1), (3, 1), (0, 1), (2, 1)]
    for i in range(6):
        d = targets[i] - centers[i]
        d = d / np.linalg.norm(d)
        hit = oracle.box_intersect(centers[i], d, fp, fa, fw, fh)
        assert hit.is_hit, f"face {i}"
        cu, cv = cells[i]
        assert cu / 4.0 <= hit.uv[0] <= (cu + 1) / 4.0, f"face {i} u {hit.uv}"
        assert cv / 3.0 <= hit.uv[1] <= (cv + 1) / 3.0, f"face {i} v {hit.uv}"


def test_scene_tie_break_black_hole_first(rng):
    """A ray through the origin hits the horizon, not anything behind it."""
    sc = sc_mod.build_scene(
        [sc_mod.Sphere(pos=(0.0, 0.0, -5.0), radius=1.0)], [])
    o = jnp.asarray([[0.0, 0.0, 10.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = jint.intersect_scene(o, d, jnp.asarray([-1.0], jnp.float32), sc)
    assert bool(hit.valid[0])
    assert int(hit.obj_type[0]) == sc_mod.OBJECT_TYPE_SPECIAL

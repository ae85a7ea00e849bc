"""Feature tests: debug test ray, camera controller utilities, scene builder
quirks (SURVEY section 2 components that aren't pure math)."""

import numpy as np
import jax
import jax.numpy as jnp

import schwarzschild_tpu as st
from schwarzschild_tpu import configs, geometry as geo
from schwarzschild_tpu.features import calculate_test_ray
from schwarzschild_tpu.oracle import OracleScene, render_image

JR = jax.jit(st.render, static_argnames="cfg")


def test_test_ray_radial_shortcut():
    """A camera looking dead at the origin yields a radial test ray: exactly
    two points {origin, origin+dir} (main.cpp:104-106)."""
    cam = configs.demo_camera()  # looks exactly at the origin
    tr = calculate_test_ray(cam, capacity=101)
    assert int(tr.num_points) == 2
    pts = np.asarray(tr.points)
    np.testing.assert_allclose(pts[1], pts[0] + np.asarray(tr.flat_dir),
                               rtol=1e-6)


def test_test_ray_points_match_cpu_reference():
    """The CPU test-ray integrator (main.cpp:94-124): offset 1 ahead of the
    camera, RK4 in f32, stop on u<0 or u>1."""
    cam = st.look_at(st.make_camera((0.0, 2.0, 15.0)), (3.0, 0.0, 0.0))
    tr = calculate_test_ray(cam, capacity=101)
    n = int(tr.num_points)
    assert 3 <= n <= 101
    pts = np.asarray(tr.points)[:n]
    # First point is cam.pos + forward (TEST_RAY_OFFSET=1, main.cpp:71,96).
    np.testing.assert_allclose(
        pts[0], np.asarray(cam.pos) + np.asarray(cam.forward), rtol=1e-5)
    # All points (after the first) lie in the orbital plane through the origin.
    origin = pts[0]
    d = np.asarray(tr.flat_dir)
    nvec = origin / np.linalg.norm(origin)
    tvec = np.cross(np.cross(nvec, d), nvec)
    tvec /= np.linalg.norm(tvec)
    for p in pts:
        # in-plane: p = a*nvec + b*tvec
        res = p - nvec * np.dot(p, nvec) - tvec * np.dot(p, tvec)
        assert np.linalg.norm(res) < 1e-3


def test_test_ray_renders_red_and_green():
    """Rendering with the test ray visible must produce the pure red curved
    tube and green flat tube colors (frag:191-192, 367-368)."""
    cam = st.look_at(st.make_camera((0.0, 2.0, 15.0)), (3.0, 0.0, 0.0))
    tr = calculate_test_ray(cam, capacity=101)
    sc = st.empty_scene()
    bg = st.solid_color_texture((0.0, 0.0, 0.2, 1.0))
    # Look from the side so the tubes are visible.
    side_cam = st.look_at(
        st.make_camera((15.0, 3.0, 0.0)), (0.0, 0.0, 7.0))
    cfg = st.RenderConfig(width=64, height=48, percent_black=-1.0,
                          checkpoint_every=10)
    img = np.asarray(JR(sc, side_cam, cfg, bg, None, 1.0, tr))
    red = (img[..., 0] > 0.9) & (img[..., 1] < 0.1) & (img[..., 2] < 0.1)
    green = (img[..., 1] > 0.9) & (img[..., 0] < 0.1) & (img[..., 2] < 0.1)
    assert red.sum() > 0, "curved test ray not visible"
    assert green.sum() > 0, "flat test ray not visible"


def test_test_ray_parity_with_oracle():
    cam = st.look_at(st.make_camera((0.0, 2.0, 15.0)), (3.0, 0.0, 0.0))
    tr = calculate_test_ray(cam, capacity=101)
    sc = st.empty_scene()
    bg = configs.background_texture()
    side_cam = st.look_at(st.make_camera((12.0, 2.0, 3.0)), (0.0, 0.0, 7.0))
    cfg = st.RenderConfig(width=32, height=24, percent_black=-1.0,
                          checkpoint_every=10)
    img = np.asarray(JR(sc, side_cam, cfg, bg, None, 1.0, tr))
    osc = OracleScene.from_scene(sc, background=bg, test_ray=tr)
    oimg = render_image(osc, np.asarray(side_cam.pos), np.asarray(side_cam.axes),
                        float(side_cam.fov), 32, 24, percent_black=-1.0)
    diff = np.abs(img - oimg).max(-1)
    assert (diff < 2e-3).mean() > 0.97


def test_look_at_matches_reference():
    cam = st.make_camera((3.0, 4.0, 5.0))
    cam = st.look_at(cam)
    f = np.asarray(cam.forward)
    np.testing.assert_allclose(f, -np.array([3.0, 4.0, 5.0]) / np.sqrt(50.0),
                               rtol=1e-6)
    # right has no y component (cross with world up), frame orthonormal
    r = np.asarray(cam.right)
    assert abs(r[1]) < 1e-6
    a = np.asarray(cam.axes)
    np.testing.assert_allclose(a.T @ a, np.eye(3), atol=1e-6)


def test_rotate_vector_rodrigues():
    v = jnp.array([1.0, 0.0, 0.0])
    out = np.asarray(geo.rotate_vector(jnp.float32(np.pi / 2), v))
    np.testing.assert_allclose(out, [0.0, 0.0, -1.0], atol=1e-6)
    out2 = np.asarray(geo.rotate_vector(jnp.float32(np.pi / 2), v,
                                        jnp.array([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(out2, [0.0, 1.0, 0.0], atol=1e-6)


def test_gram_schmidt_keeps_up_direction():
    m = jnp.asarray(np.array([
        [1.0, 0.3, 0.2],
        [0.1, 2.0, 0.4],
        [0.0, 0.1, 1.0],
    ]))
    out = np.asarray(geo.gram_schmidt(m))
    # column 1 keeps its direction
    c1 = np.array([0.3, 2.0, 0.1])
    np.testing.assert_allclose(out[:, 1], c1 / np.linalg.norm(c1), rtol=1e-5)
    np.testing.assert_allclose(out.T @ out, np.eye(3), atol=1e-5)


def test_material_dedup_by_identity():
    m = st.Material()
    sc = st.build_scene([
        st.Sphere(material=m),
        st.Disk(material=m),
        st.Box(material=st.Material(texture_index=1)),
    ])
    assert sc.materials.color.shape[0] == 2
    assert int(sc.spheres.mat_idx[0]) == int(sc.disks.mat_idx[0]) == 0
    assert int(sc.boxes.mat_idx[0]) == 1


def test_quat_to_axes_matches_glm():
    # angleAxis(pi/4, normalize(1,1,1)) used by the demo disk (main.cpp:236).
    import math
    q = geo.angle_axis(jnp.float32(math.pi / 4),
                       jnp.asarray(np.ones(3) / np.sqrt(3), jnp.float32))
    m = np.asarray(geo.quat_to_axes(q))
    np.testing.assert_allclose(m.T @ m, np.eye(3), atol=1e-6)
    assert np.isclose(np.trace(m), 1 + 2 * np.cos(math.pi / 4), atol=1e-5)
    # rotation leaves the axis fixed
    ax = np.ones(3) / np.sqrt(3)
    np.testing.assert_allclose(m @ ax, ax, atol=1e-6)

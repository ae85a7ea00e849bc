"""Distributed-without-a-cluster tests on the 8-virtual-device CPU mesh
(SURVEY section 4 items 3-4: sharded-vs-single-device equality,
seed determinism across shardings)."""

import numpy as np
import jax
import pytest

import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.sharding import (
    frame_range_for_process,
    gather_image,
    image_sharding,
    make_mesh,
    make_sharded_render,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _setup():
    return (configs.demo_scene(), configs.demo_camera(),
            configs.background_texture(), configs.demo_texture_stack())


CFG = st.RenderConfig(width=32, height=32, percent_black=0.75,
                      noise_mode="hash", checkpoint_every=10)


def test_sharded_render_matches_single_device():
    sc, cam, bg, tex = _setup()
    single = np.asarray(jax.jit(st.render, static_argnames="cfg")(
        sc, cam, CFG, bg, tex))

    mesh = make_mesh(shape=(8, 1))
    img = make_sharded_render(mesh, CFG)(sc, cam, bg, tex)
    assert len(img.sharding.device_set) == 8
    np.testing.assert_array_equal(gather_image(img), single)


def test_2d_mesh_matches_and_seed_determinism():
    sc, cam, bg, tex = _setup()
    mesh_a = make_mesh(shape=(4, 2))
    mesh_b = make_mesh(shape=(2, 4))
    img_a = gather_image(make_sharded_render(mesh_a, CFG)(sc, cam, bg, tex))
    img_b = gather_image(make_sharded_render(mesh_b, CFG)(sc, cam, bg, tex))
    # Same seed => identical images across shardings (bit-equality).
    np.testing.assert_array_equal(img_a, img_b)


def test_sharded_gradient_psum():
    """Parameter gradients of a sharded loss are correct: XLA inserts the
    psum over image tiles; compare against the single-device gradient."""
    sc, cam, bg, tex = _setup()
    cfg = st.RenderConfig(width=16, height=16, percent_black=-1.0,
                          checkpoint_every=10)
    mesh = make_mesh(shape=(8, 1))
    from jax.sharding import NamedSharding, PartitionSpec as P

    def loss(r_s):
        return st.render(sc, cam, cfg, bg, tex, r_s=r_s).mean()

    g_single = float(jax.grad(loss)(1.0))

    sharded_loss = jax.jit(
        jax.grad(loss),
        in_shardings=NamedSharding(mesh, P()),
        out_shardings=NamedSharding(mesh, P()),
    )
    import jax.numpy as jnp

    g_sharded = float(sharded_loss(jnp.float32(1.0)))
    # f32 psum reduction order differs from the single-device sum.
    assert np.isclose(g_single, g_sharded, rtol=1e-3, atol=1e-6)


def test_sharded_fast_path_matches_single_device():
    """The Pallas fast path under shard_map (interpret mode on the CPU mesh)
    matches the single-device fast render (VERDICT round 1 item 1).

    Tolerance note: shard_map introduces partition boundaries that change
    XLA's fusion/FMA-contraction in the slot-shading composition, so the
    comparison is allclose at f32-contraction level (max observed 1.4e-5),
    not bit-equal like the pure-jnp path."""
    from schwarzschild_tpu.kernel_scene import render_fast

    sc, cam, bg, tex = _setup()
    single = np.asarray(render_fast(sc, cam, CFG, bg, tex, 1.0,
                                    interpret=True, overflow="ignore"))

    mesh = make_mesh(shape=(8, 1))
    img = make_sharded_render(mesh, CFG, renderer="fast",
                              interpret=True)(sc, cam, bg, tex)
    assert len(img.sharding.device_set) == 8
    np.testing.assert_allclose(gather_image(img), single, atol=5e-5)


def test_sharded_fast_path_2d_mesh():
    from schwarzschild_tpu.kernel_scene import render_fast

    sc, cam, bg, tex = _setup()
    single = np.asarray(render_fast(sc, cam, CFG, bg, tex, 1.0,
                                    interpret=True, overflow="ignore"))
    mesh = make_mesh(shape=(2, 4))
    img = make_sharded_render(mesh, CFG, renderer="fast",
                              interpret=True)(sc, cam, bg, tex)
    np.testing.assert_allclose(gather_image(img), single, atol=5e-5)


def test_sharded_march_bh_matches():
    """march_bh under shard_map bit-equals the single-device kernel."""
    from schwarzschild_tpu import camera as cam_mod
    from schwarzschild_tpu.kernel import march_bh

    _, cam, _, _ = _setup()
    cfg = st.RenderConfig(width=32, height=32, percent_black=-1.0)
    u_ndc, v_ndc = cam_mod.pixel_grid(cfg.width, cfg.height)
    origin, direction = cam_mod.generate_rays(cam, u_ndc, v_ndc,
                                              cfg.width, cfg.height)
    active = np.ones((cfg.height, cfg.width), bool)

    fd0, st0 = march_bh(origin, direction, active, 1.0, cfg, interpret=True)
    mesh = make_mesh(shape=(8, 1))
    fd1, st1 = march_bh(origin, direction, active, 1.0, cfg, interpret=True,
                        mesh=mesh)
    np.testing.assert_array_equal(np.asarray(fd0), np.asarray(fd1))
    np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))


def test_non_divisible_mesh_pad_and_crop():
    """Non-divisible image/mesh shapes render correctly (VERDICT r4 item 7):
    the jnp path shards unevenly via GSPMD; the fast path pads the
    per-pixel planes to tile-divisible shapes and crops the output."""
    from schwarzschild_tpu.kernel_scene import render_fast

    sc, cam, bg, tex = _setup()
    odd = st.RenderConfig(width=32, height=30, percent_black=0.75,
                          noise_mode="hash", checkpoint_every=10)
    mesh = make_mesh(shape=(8, 1))

    single = np.asarray(jax.jit(st.render, static_argnames="cfg")(
        sc, cam, odd, bg, tex))
    img = make_sharded_render(mesh, odd)(sc, cam, bg, tex)
    np.testing.assert_array_equal(gather_image(img), single)

    single_f = np.asarray(render_fast(sc, cam, odd, bg, tex, 1.0,
                                      interpret=True, overflow="ignore"))
    img_f = make_sharded_render(mesh, odd, renderer="fast",
                                interpret=True)(sc, cam, bg, tex)
    out = gather_image(img_f)
    assert out.shape == single_f.shape == (30, 32, 4)
    np.testing.assert_allclose(out, single_f, atol=5e-5)


def test_frame_range_partition():
    ranges = [list(frame_range_for_process(10, pid, 4)) for pid in range(4)]
    flat = [f for r in ranges for f in r]
    assert flat == list(range(10))
    assert max(len(r) for r in ranges) - min(len(r) for r in ranges) <= 3

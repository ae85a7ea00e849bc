"""Texture loader + bilinear sampler tests (SURVEY section 4 item 1:
'bilinear gather vs scipy')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from schwarzschild_tpu import textures as tx


def test_bilinear_matches_scipy_map_coordinates(rng):
    from scipy import ndimage

    h, w = 13, 17
    data = rng.random((h, w, 4)).astype(np.float32)
    tex = tx.Texture(data=jnp.asarray(data))
    u = rng.random(200).astype(np.float32)
    v = rng.random(200).astype(np.float32)
    got = np.asarray(tx.sample_texture(tex, jnp.asarray(u), jnp.asarray(v)))
    # GL convention: sample position in texel space is (u*w - 0.5, v*h - 0.5),
    # wrapped; scipy 'grid-wrap' with order=1 is the same bilinear.
    exp = np.stack([
        ndimage.map_coordinates(data[..., c], [v * h - 0.5, u * w - 0.5],
                                order=1, mode="grid-wrap")
        for c in range(4)
    ], axis=-1)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_bilinear_wraps_repeat():
    data = np.zeros((4, 4, 4), np.float32)
    data[0, 0] = 1.0  # single bright texel
    tex = tx.Texture(data=jnp.asarray(data))
    # Sampling at uv just over 1 wraps to the same texel as just over 0.
    a = np.asarray(tx.sample_texture(tex, jnp.float32(0.125), jnp.float32(0.125)))
    b = np.asarray(tx.sample_texture(tex, jnp.float32(1.125), jnp.float32(1.125)))
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert a[0] == 1.0  # texel center -> exact value


def test_opaque_alpha_survives_lerp(rng):
    """alpha==1 must stay exactly 1 through the lerp chain — the march's
    opaque-hit test is an exact comparison (frag:932)."""
    data = rng.random((8, 8, 4)).astype(np.float32)
    data[..., 3] = 1.0
    tex = tx.Texture(data=jnp.asarray(data))
    u = jnp.asarray(rng.random(500), jnp.float32)
    v = jnp.asarray(rng.random(500), jnp.float32)
    out = np.asarray(tx.sample_texture(tex, u, v))
    assert (out[..., 3] == 1.0).all()


def test_stack_padding_and_sizes():
    imgs = [np.full((4, 6, 3), 100, np.uint8), np.full((8, 3, 4), 200, np.uint8)]
    stack = tx.stack_textures(imgs)
    assert stack.data.shape == (2, 8, 6, 4)
    np.testing.assert_allclose(np.asarray(stack.sizes), [[6, 4], [3, 8]])
    np.testing.assert_allclose(np.asarray(stack.max_size), [6, 8])
    d = np.asarray(stack.data)
    # Valid region of texture 0: rows 0..3, cols 0..5 — alpha filled to 1.
    assert (d[0, :4, :6, 3] == 1.0).all()
    # Padded region: all zeros INCLUDING alpha (image_utils.cpp:89-98 default
    # value only applies to missing channels of valid texels).
    assert (d[0, 4:, :, :] == 0.0).all()
    assert (d[1, :, 3:, :] == 0.0).all()


def test_gl_y_flip():
    """Row 0 of the loaded texture is the image's BOTTOM row
    (stbi_set_flip_vertically_on_load, image_utils.cpp:22)."""
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, :, :] = 255  # top row of the image is white
    t = tx.from_array(img.astype(np.float64) / 255.0)
    d = np.asarray(t.data)
    assert (d[1, :, :3] == 1.0).all()  # white ended up in texture row 1 (top)
    assert (d[0, :, :3] == 0.0).all()


def test_sample_stack_indexing(rng):
    imgs = [np.full((4, 4, 3), 50, np.uint8), np.full((4, 4, 3), 250, np.uint8)]
    stack = tx.stack_textures(imgs)
    idx = jnp.asarray([0, 1, 0, 1], jnp.int32)
    u = jnp.full(4, 0.25, jnp.float32)
    v = jnp.full(4, 0.25, jnp.float32)
    out = np.asarray(tx.sample_stack(stack, idx, u, v))
    np.testing.assert_allclose(out[:, 0], [50 / 255, 250 / 255, 50 / 255, 250 / 255],
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Mipmaps (opt-in trilinear minification — the reference never samples mips:
# its min filter is GL_LINEAR, image_utils.cpp:17,113).
# ---------------------------------------------------------------------------


def test_build_mips_chain():
    data = jnp.ones((8, 16, 4), jnp.float32)
    mips = tx.build_mips(data)
    shapes = [m.shape for m in mips]
    assert shapes == [(4, 8, 4), (2, 4, 4), (1, 2, 4), (1, 1, 4)]
    for m in mips:
        np.testing.assert_allclose(np.asarray(m), 1.0)


def test_downsample_box_filter():
    """A 2x2 black/white checker averages to 0.5 at level 1."""
    base = np.zeros((4, 4, 4), np.float32)
    base[::2, ::2] = 1.0
    base[1::2, 1::2] = 1.0
    lvl1 = np.asarray(tx.downsample2(jnp.asarray(base)))
    np.testing.assert_allclose(lvl1, 0.5)


def test_trilinear_lod0_equals_bilinear(rng):
    data = jnp.asarray(rng.random((8, 8, 4)), jnp.float32)
    t = tx.with_mips(tx.Texture(data=data))
    u = jnp.asarray(rng.random((5, 7)), jnp.float32)
    v = jnp.asarray(rng.random((5, 7)), jnp.float32)
    a = np.asarray(tx.sample_texture(t, u, v))
    b = np.asarray(tx.sample_texture_trilinear(t, u, v, jnp.zeros((5, 7))))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_trilinear_high_lod_is_mean(rng):
    """At the deepest level the sample approaches the texture mean."""
    data = jnp.asarray(rng.random((16, 16, 4)), jnp.float32)
    t = tx.with_mips(tx.Texture(data=data))
    out = np.asarray(tx.sample_texture_trilinear(
        t, jnp.asarray([[0.3]]), jnp.asarray([[0.7]]),
        jnp.full((1, 1), 10.0)))
    np.testing.assert_allclose(out[0, 0], np.asarray(data).mean((0, 1)),
                               atol=1e-5)


def test_stack_trilinear_lod0_equals_bilinear(rng):
    imgs = [(rng.random((8, 8, 3)) * 255).astype(np.uint8),
            (rng.random((4, 6, 3)) * 255).astype(np.uint8)]
    stack = tx.stack_with_mips(tx.stack_textures(imgs))
    idx = jnp.asarray([[0, 1], [1, 0]], jnp.int32)
    u = jnp.asarray(rng.random((2, 2)), jnp.float32)
    v = jnp.asarray(rng.random((2, 2)), jnp.float32)
    a = np.asarray(tx.sample_stack(stack, idx, u, v))
    b = np.asarray(tx.sample_stack_trilinear(stack, idx, u, v,
                                             jnp.zeros((2, 2))))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_screen_space_lod_magnified_vs_minified():
    """A uv field advancing 4 texels/pixel => lod 2; 0.25 texel/pixel =>
    lod 0 (magnification clamps at the base level)."""
    H, W = 8, 8
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    lod_min = np.asarray(tx.screen_space_lod(jnp.asarray(x * 4.0),
                                             jnp.asarray(y * 4.0)))
    np.testing.assert_allclose(lod_min, 2.0, atol=1e-5)
    lod_mag = np.asarray(tx.screen_space_lod(jnp.asarray(x * 0.25),
                                             jnp.asarray(y * 0.25)))
    np.testing.assert_allclose(lod_mag, 0.0, atol=1e-5)


def test_trilinear_render_reduces_checker_aliasing():
    """Render the demo scene's checker sphere small; trilinear output must
    differ from bilinear (mips engaged) while bilinear stays the parity
    default."""
    import schwarzschild_tpu as st
    from schwarzschild_tpu import configs

    sc = configs.demo_scene()
    cam = configs.demo_camera()
    bg = configs.background_texture()
    tex = configs.demo_texture_stack()
    cfg_b = st.RenderConfig(width=48, height=32, percent_black=-1.0)
    cfg_t = st.RenderConfig(width=48, height=32, percent_black=-1.0,
                            texture_filter="trilinear")
    img_b = np.asarray(st.render(sc, cam, cfg_b, bg, tex))
    img_t = np.asarray(st.render(sc, cam, cfg_t, bg, tex))
    assert np.isfinite(img_t).all()
    assert (np.abs(img_b - img_t) > 1e-3).any()


def test_trilinear_texture_gradients_flow():
    """build_mips is differentiable: gradients reach the base texels through
    a trilinear sample."""
    data = jnp.asarray(np.random.RandomState(0).rand(8, 8, 4), jnp.float32)

    def loss(d):
        t = tx.Texture(data=d, mips=tx.build_mips(d))
        out = tx.sample_texture_trilinear(
            t, jnp.asarray([[0.4]]), jnp.asarray([[0.6]]),
            jnp.full((1, 1), 1.5))
        return jnp.sum(out)

    g = np.asarray(jax.grad(loss)(data))
    assert np.isfinite(g).all()
    assert (g != 0).any()


def test_shade_skips_normal_map_gathers_when_table_has_none():
    """When the (concrete) material table has no normal maps, shade() must
    not emit the normal-map texture gathers at all — render parity AND a
    strictly smaller jaxpr than the same scene with a normal map."""
    import schwarzschild_tpu as st
    from schwarzschild_tpu import configs
    from schwarzschild_tpu.intersect import intersect_scene
    from schwarzschild_tpu.shading import shade

    sc_nonm = configs.demo_scene()  # demo materials carry no normal maps
    tex = configs.demo_texture_stack()
    # Same scene with a normal map forced onto every material.
    mats_nm = sc_nonm.materials._replace(
        normal_map_index=jnp.zeros_like(sc_nonm.materials.normal_map_index))
    sc = sc_nonm._replace(materials=mats_nm)

    origin = jnp.tile(jnp.asarray([[0.0, 1.0, 12.0]], jnp.float32), (64, 1))
    t = jnp.linspace(-0.3, 0.3, 64)
    direction = jnp.stack(
        [t, -0.08 * jnp.ones_like(t), -jnp.ones_like(t)], axis=-1)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    window = jnp.full((64,), -1.0, jnp.float32)

    def rgba(scene):
        hit = intersect_scene(origin, direction, window, scene, 1.0)
        return shade(hit, -direction, scene, tex)

    def count_gathers(jaxpr):
        n = 0
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "gather":
                n += 1
            for v in eqn.params.values():
                for sub in jax.tree_util.tree_leaves(
                        v, is_leaf=lambda x: hasattr(x, "jaxpr")):
                    if hasattr(sub, "jaxpr"):
                        n += count_gathers(sub.jaxpr)
        return n

    n_nm = count_gathers(jax.make_jaxpr(lambda: rgba(sc))().jaxpr)
    n_nonm = count_gathers(jax.make_jaxpr(lambda: rgba(sc_nonm))().jaxpr)
    assert n_nonm < n_nm, (n_nonm, n_nm)

    # Parity: gating must not change the image for a no-normal-map scene
    # (mapped-normal lanes only exist when the table has an entry >= 0).
    # Force the ungated path by stubbing the concreteness probe.
    import schwarzschild_tpu.shading as sh

    gated = np.asarray(rgba(sc_nonm))
    orig = sh._concrete_none_negative
    sh._concrete_none_negative = lambda idx: False
    try:
        ungated = np.asarray(rgba(sc_nonm))
    finally:
        sh._concrete_none_negative = orig
    np.testing.assert_array_equal(gated, ungated)


def test_bf16_texture_storage_close_and_opaque_exact():
    """with_dtype/stack_with_dtype: bf16 texels sample within 8-bit-source
    tolerance of f32 (<= ~0.4%), exact-1.0 alphas stay EXACTLY 1.0 (the
    first-opaque break tests a == 1.0), and a full fast render stays within
    display tolerance."""
    import jax.numpy as jnp
    import schwarzschild_tpu as st
    from schwarzschild_tpu import configs
    from schwarzschild_tpu.kernel_scene import render_fast
    from schwarzschild_tpu.textures import (sample_stack, sample_texture,
                                            stack_with_dtype, with_dtype)

    bg = configs.background_texture()
    tex = configs.demo_texture_stack()
    bg16 = with_dtype(bg)
    tex16 = stack_with_dtype(tex)
    assert bg16.data.dtype == jnp.bfloat16

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(0, 1, (64,)), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 1, (64,)), jnp.float32)
    a = np.asarray(sample_texture(bg, u, v))
    b = np.asarray(sample_texture(bg16, u, v))
    assert b.dtype == np.float32  # lerp weights promote back to f32
    np.testing.assert_allclose(b, a, atol=5e-3)

    idx = jnp.zeros((64,), jnp.int32)
    a = np.asarray(sample_stack(tex, idx, u, v))
    b = np.asarray(sample_stack(tex16, idx, u, v))
    np.testing.assert_allclose(b, a, atol=5e-3)
    # demo layer 0 alpha is exactly 1 everywhere -> must survive exactly
    assert (b[..., 3] == 1.0).all() == (a[..., 3] == 1.0).all()

    sc = configs.demo_scene()
    cam = configs.demo_camera()
    cfg = st.RenderConfig(width=48, height=32, percent_black=-1.0,
                          checkpoint_every=0)
    f = np.asarray(render_fast(sc, cam, cfg, bg, tex, interpret=True,
                               overflow="ignore"))
    g = np.asarray(render_fast(sc, cam, cfg, bg16, tex16, interpret=True,
                               overflow="ignore"))
    d = np.abs(f - g)
    assert (d < 1 / 255).mean() > 0.98, d.max()


# ---------------------------------------------------------------------------
# Compacted samplers (VERDICT r2 weak #1: slot/background passes pay the
# per-index gather latency for every lane; these run the gather only for the
# lanes that want it).
# ---------------------------------------------------------------------------


def _rand_stack(rng, n=3, h=8, w=8):
    imgs = [(rng.random((h, w, 4)) * 255).astype(np.uint8) for _ in range(n)]
    return tx.stack_textures(imgs)


def test_sample_stack_compact_matches_full(rng):
    """Per-lane bit-identity with the full-batch sampler on wanted lanes,
    zeros elsewhere."""
    stack = _rand_stack(rng)
    shape = (6, 10)
    idx = jnp.asarray(rng.integers(0, 3, shape), jnp.int32)
    u = jnp.asarray(rng.random(shape), jnp.float32)
    v = jnp.asarray(rng.random(shape), jnp.float32)
    want = jnp.asarray(rng.random(shape) < 0.3)

    full = np.asarray(tx.sample_stack(stack, idx, u, v))
    comp = np.asarray(tx.sample_stack_compact(stack, idx, u, v, want, cap=32))
    w_np = np.asarray(want)
    np.testing.assert_array_equal(comp[w_np], full[w_np])
    assert (comp[~w_np] == 0.0).all()


def test_sample_stack_compact_overflow_fallback(rng):
    """Lanes beyond capacity take the full-batch fallback — nothing is
    dropped.  Tolerance is 1-ulp-scale, not exact: the fallback lives inside
    a lax.cond branch, which XLA may fuse (FMA-contract) differently from the
    inline sampler."""
    stack = _rand_stack(rng)
    shape = (4, 8)
    idx = jnp.zeros(shape, jnp.int32)
    u = jnp.asarray(rng.random(shape), jnp.float32)
    v = jnp.asarray(rng.random(shape), jnp.float32)
    want = jnp.ones(shape, bool)  # 32 active lanes >> cap=8

    full = np.asarray(tx.sample_stack(stack, idx, u, v))
    comp = np.asarray(tx.sample_stack_compact(stack, idx, u, v, want, cap=8))
    np.testing.assert_allclose(comp, full, rtol=3e-7, atol=3e-7)


def test_sample_texture_compact_matches_full(rng):
    data = rng.random((8, 8, 4)).astype(np.float32)
    t = tx.Texture(data=jnp.asarray(data))
    shape = (5, 7)
    u = jnp.asarray(rng.random(shape), jnp.float32)
    v = jnp.asarray(rng.random(shape), jnp.float32)
    want = jnp.asarray(rng.random(shape) < 0.4)

    full = np.asarray(tx.sample_texture(t, u, v))
    comp = np.asarray(tx.sample_texture_compact(t, u, v, want, cap=24))
    w_np = np.asarray(want)
    np.testing.assert_array_equal(comp[w_np], full[w_np])
    assert (comp[~w_np] == 0.0).all()


def test_sample_stack_compact_gradients_match(rng):
    """Texel-data gradients through the compacted path equal the full-batch
    sampler's on wanted lanes (the scatter-add transposes to a gather)."""
    stack = _rand_stack(rng, n=2, h=4, w=4)
    shape = (3, 4)
    idx = jnp.asarray(rng.integers(0, 2, shape), jnp.int32)
    u = jnp.asarray(rng.random(shape), jnp.float32)
    v = jnp.asarray(rng.random(shape), jnp.float32)
    want = jnp.asarray(rng.random(shape) < 0.5)

    def loss_full(data):
        s = stack._replace(data=data)
        out = tx.sample_stack(s, idx, u, v)
        return jnp.sum(jnp.where(want[..., None], out, 0.0) ** 2)

    def loss_comp(data):
        s = stack._replace(data=data)
        out = tx.sample_stack_compact(s, idx, u, v, want, cap=16)
        return jnp.sum(out ** 2)

    g_full = np.asarray(jax.grad(loss_full)(stack.data))
    g_comp = np.asarray(jax.grad(loss_comp)(stack.data))
    np.testing.assert_allclose(g_comp, g_full, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# Merged fetch atlas (background layer 0 + stack layers 1..T, one pair8
# gather per lane — the dense frame's single-fetch restructure).
# ---------------------------------------------------------------------------


def test_atlas_matches_sample_texture(rng):
    """Layer 0 reproduces the background sampler exactly, including REPEAT
    wrap at the background's own extent."""
    data = rng.random((6, 10, 4)).astype(np.float32)
    t = tx.Texture(data=jnp.asarray(data))
    atlas = tx.build_atlas(t)
    shape = (4, 9)
    # Include coords beyond [0,1] and near the wrap seam.
    u = jnp.asarray(rng.random(shape) * 2.0 - 0.5, jnp.float32)
    v = jnp.asarray(rng.random(shape) * 2.0 - 0.5, jnp.float32)
    ref = np.asarray(tx.sample_texture(t, u, v))
    got = np.asarray(tx.atlas_fetch(atlas, jnp.zeros(shape, jnp.int32), u, v))
    np.testing.assert_array_equal(got, ref)


def test_atlas_matches_sample_stack(rng):
    """Layers 1..T reproduce the stack sampler exactly — wrap at the PADDED
    (Wmax, Hmax) extent, zero padding texels included."""
    imgs = [(rng.random((5, 8, 4)) * 255).astype(np.uint8),
            (rng.random((8, 4, 4)) * 255).astype(np.uint8)]
    stack = tx.stack_textures(imgs)
    bg = tx.Texture(data=jnp.asarray(rng.random((6, 12, 4)).astype(np.float32)))
    atlas = tx.build_atlas(bg, stack)
    shape = (5, 6)
    idx = jnp.asarray(rng.integers(0, 2, shape), jnp.int32)
    u = jnp.asarray(rng.random(shape) * 1.5 - 0.25, jnp.float32)
    v = jnp.asarray(rng.random(shape) * 1.5 - 0.25, jnp.float32)
    ref = np.asarray(tx.sample_stack(stack, idx, u, v))
    got = np.asarray(tx.atlas_fetch(atlas, idx + 1, u, v))
    np.testing.assert_array_equal(got, ref)
    # and the background through the same atlas
    ref0 = np.asarray(tx.sample_texture(bg, u, v))
    got0 = np.asarray(tx.atlas_fetch(atlas, jnp.zeros(shape, jnp.int32), u, v))
    np.testing.assert_array_equal(got0, ref0)


def test_atlas_mixed_layers_per_lane(rng):
    """A single fetch serves bg lanes and stack lanes side by side."""
    imgs = [(rng.random((4, 4, 4)) * 255).astype(np.uint8)]
    stack = tx.stack_textures(imgs)
    bg = tx.Texture(data=jnp.asarray(rng.random((8, 8, 4)).astype(np.float32)))
    atlas = tx.build_atlas(bg, stack)
    u = jnp.asarray([0.1, 0.6, 0.9], jnp.float32)
    v = jnp.asarray([0.3, 0.2, 0.7], jnp.float32)
    layer = jnp.asarray([0, 1, 0], jnp.int32)
    got = np.asarray(tx.atlas_fetch(atlas, layer, u, v))
    np.testing.assert_array_equal(
        got[0], np.asarray(tx.sample_texture(bg, u[0], v[0])))
    np.testing.assert_array_equal(
        got[1], np.asarray(tx.sample_stack(stack, jnp.int32(0), u[1], v[1])))
    np.testing.assert_array_equal(
        got[2], np.asarray(tx.sample_texture(bg, u[2], v[2])))


def test_atlas_fetch_compact_matches_full(rng):
    imgs = [(rng.random((4, 6, 4)) * 255).astype(np.uint8)]
    stack = tx.stack_textures(imgs)
    bg = tx.Texture(data=jnp.asarray(rng.random((6, 6, 4)).astype(np.float32)))
    atlas = tx.build_atlas(bg, stack)
    shape = (6, 8)
    layer = jnp.asarray(rng.integers(0, 2, shape), jnp.int32)
    u = jnp.asarray(rng.random(shape), jnp.float32)
    v = jnp.asarray(rng.random(shape), jnp.float32)
    want = jnp.asarray(rng.random(shape) < 0.4)
    full = np.asarray(tx.atlas_fetch(atlas, layer, u, v))
    comp = np.asarray(tx.atlas_fetch_compact(atlas, layer, u, v, want, cap=32))
    w_np = np.asarray(want)
    np.testing.assert_array_equal(comp[w_np], full[w_np])
    assert (comp[~w_np] == 0.0).all()


def test_atlas_gradients_flow_to_background(rng):
    """The atlas build + fetch is differentiable end-to-end w.r.t. the source
    texel data (inverse rendering's texture-optimization path)."""
    data = jnp.asarray(rng.random((4, 4, 4)).astype(np.float32))
    u = jnp.asarray(rng.random((7,)), jnp.float32)
    v = jnp.asarray(rng.random((7,)), jnp.float32)

    def loss_atlas(d):
        atlas = tx.build_atlas(tx.Texture(data=d))
        return jnp.sum(tx.atlas_fetch(atlas, jnp.zeros((7,), jnp.int32),
                                      u, v) ** 2)

    def loss_direct(d):
        return jnp.sum(tx.sample_texture(tx.Texture(data=d), u, v) ** 2)

    g_a = np.asarray(jax.grad(loss_atlas)(data))
    g_d = np.asarray(jax.grad(loss_direct)(data))
    np.testing.assert_allclose(g_a, g_d, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# Atlas memory accounting (VERDICT r3 item 4 / weak 7: the r03 OOM was found
# on-chip at round end; these pin the budget at build time).
# ---------------------------------------------------------------------------


def test_atlas_nbytes_exact(rng):
    imgs = [(rng.random((5, 8, 4)) * 255).astype(np.uint8)]
    stack = tx.stack_textures(imgs)
    bg = tx.Texture(data=jnp.asarray(rng.random((6, 12, 4)).astype(np.float32)))
    atlas = tx.build_atlas(bg, stack)
    assert atlas.data.nbytes == tx.atlas_nbytes(bg, stack)


def test_atlas_packs_layers_at_own_extent(rng):
    """A large background must NOT balloon small stack layers (the r03
    design padded every layer to the global max extent).  Quadrow packing
    is exactly 4x the per-layer texel payload (x-pad < one 8-texel group
    per row)."""
    bg = tx.Texture(data=jnp.zeros((256, 512, 4), jnp.float32))
    stack = tx.stack_textures([(np.zeros((8, 8, 3))).astype(np.uint8)])
    n = tx.atlas_nbytes(bg, stack)
    per_layer = 4 * 4 * 4  # quad floats * channels * f32 bytes per texel
    exact = (256 * 512 + 8 * 8) * per_layer
    assert n == exact, (n, exact)


def test_atlas_bytes_guard_raises_and_bf16_escape(monkeypatch):
    bg = tx.Texture(data=jnp.zeros((64, 64, 4), jnp.float32))
    monkeypatch.setattr(tx, "ATLAS_MAX_BYTES", 1000)
    with pytest.raises(ValueError, match="bfloat16"):
        tx.build_atlas(bg)
    monkeypatch.setattr(tx, "ATLAS_MAX_BYTES", tx.atlas_nbytes(bg, dtype=jnp.bfloat16))
    tx.build_atlas(bg, dtype=jnp.bfloat16)  # exactly at budget: fine


def test_atlas_bf16_close_to_f32(rng):
    data = rng.random((16, 24, 4)).astype(np.float32)
    bg = tx.Texture(data=jnp.asarray(data))
    a32 = tx.build_atlas(bg)
    a16 = tx.build_atlas(bg, dtype=jnp.bfloat16)
    assert a16.data.nbytes == a32.data.nbytes // 2
    u = jnp.asarray(rng.random((64,)), jnp.float32)
    v = jnp.asarray(rng.random((64,)), jnp.float32)
    lay = jnp.zeros((64,), jnp.int32)
    f32 = np.asarray(tx.atlas_fetch(a32, lay, u, v))
    f16 = np.asarray(tx.atlas_fetch(a16, lay, u, v))
    assert f16.dtype == np.float32  # lerp promotes back
    np.testing.assert_allclose(f16, f32, atol=4e-3)  # 8-bit-significand texels


def test_atlas_8k_budget_static():
    """The 8k background (8192x4096, main.cpp:57-63) atlas fits HBM sanely
    in bf16 and per-layer packing keeps the 2k planet stack unaffected."""
    bg8k = tx.Texture(
        data=jax.ShapeDtypeStruct((4096, 8192, 4), jnp.float32))  # shape only
    n_bf16 = tx.atlas_nbytes(bg8k, dtype=jnp.bfloat16)
    assert n_bf16 == 4096 * 8192 * 16 * 2  # 1.07 GB
    assert n_bf16 < tx.ATLAS_MAX_BYTES
    # cached-build path honors the same guard
    n_f32 = tx.atlas_nbytes(bg8k, dtype=jnp.float32)
    assert n_f32 == 2 * n_bf16


@pytest.mark.skipif(
    not __import__("pathlib").Path(
        "/root/reference/assets/textures/background/8k.jpg").exists(),
    reason="8k asset not present")
def test_atlas_8k_real_asset_smoke():
    """Load the real 8k background (main.cpp:57-63), build the bf16 quadrow
    atlas, and fetch through it — the memory-safe 8k path end to end."""
    from schwarzschild_tpu import configs

    bg8 = tx.load_texture(
        "/root/reference/assets/textures/background/8k.jpg")
    assert bg8.data.shape[:2] == (4096, 8192)
    n = tx.atlas_nbytes(bg8, dtype=jnp.bfloat16)
    assert n <= 1.1e9  # the VERDICT r3 memory-sanity line
    atlas = tx.build_atlas(bg8, dtype=jnp.bfloat16)
    assert atlas.data.nbytes == n
    u = jnp.asarray(np.linspace(0.01, 0.99, 64), jnp.float32)
    v = jnp.asarray(np.linspace(0.01, 0.99, 64), jnp.float32)
    got = np.asarray(tx.atlas_fetch(atlas, jnp.zeros((64,), jnp.int32), u, v))
    ref = np.asarray(tx.sample_texture(bg8, u, v))
    np.testing.assert_allclose(got, ref, atol=5e-3)

"""Texture loader + bilinear sampler tests (SURVEY section 4 item 1:
'bilinear gather vs scipy')."""

import numpy as np
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

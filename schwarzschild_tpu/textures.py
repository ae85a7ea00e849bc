"""Texture loading and differentiable bilinear sampling.

Replaces /root/reference/src/lib/image_utils/image_utils.cpp + the GLSL
``texture()`` calls (black_hole.frag:403,411,836).  Semantics preserved:

  * every image is flipped vertically on load (stbi_set_flip_vertically_on_load
    is set once in loadTexture, image_utils.cpp:22, and stays set for the
    texture-array loads) — so texture row 0 is the BOTTOM row of the image;
  * the texture array pads every image to the common max width/height; padded
    texels are (0, 0, 0, 0) — the "(c==3)?255:0" default only applies to
    missing channels of valid texels (image_utils.cpp:89-98);
  * per-texture true sizes are uploaded so shaders rescale UVs by
    ``texture_sizes[i]/max_texture_size`` (black_hole.frag:384);
  * sampling is GL_LINEAR with GL_REPEAT wrap on both axes (base mip level —
    the reference generates mipmaps but the shader samples at implicit LOD in a
    loop, and our renderer has no screen-space derivatives; bilinear at level 0
    is the parity target defined by the float64 oracle).

The sampler is plain gather + lerp, hence differentiable w.r.t. the texel data
— this is the "differentiable bilinear HBM gather" of the north star.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


class Texture(NamedTuple):
    """A single 2D RGBA texture: data (H, W, 4) float32 in [0, 1],
    row 0 = bottom (GL convention after the load-time flip).

    ``mips``: optional tuple of downsampled levels (level 1 = half res, ...)
    for trilinear minification — see :func:`build_mips`.  Empty = bilinear
    level-0 only, which is EXACT reference parity: the reference's min filter
    is GL_LINEAR for both the background (image_utils.cpp:17) and the texture
    array (cpp:113), so its glGenerateMipmap call (cpp:31) is dead — GL never
    samples mip levels under a non-mipmap min filter.  Trilinear here is an
    opt-in quality improvement beyond the reference."""

    data: jnp.ndarray
    mips: tuple = ()


class TextureStack(NamedTuple):
    """Padded texture array + per-texture true sizes
    (the ``sampler2DArray`` + ``texture_sizes[]`` + ``max_texture_size``
    uniforms, black_hole.frag:67-70).  ``mips`` as in :class:`Texture`."""

    data: jnp.ndarray  # (T, Hmax, Wmax, 4) float32
    sizes: jnp.ndarray  # (T, 2) float32 — (width, height)
    max_size: jnp.ndarray  # (2,) float32 — (Wmax, Hmax)
    mips: tuple = ()


def load_image(path) -> np.ndarray:
    """Decode an image file to (H, W, C) uint8 with row 0 = top."""
    from PIL import Image

    with Image.open(path) as im:
        if im.mode not in ("RGB", "RGBA", "L"):
            im = im.convert("RGBA" if "A" in im.mode else "RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, axis=-1)
    return arr


def _to_gl_rgba_f32(arr: np.ndarray) -> np.ndarray:
    """uint8 (H, W, C) top-down -> float32 (H, W, 4) bottom-up in [0, 1]."""
    arr = arr[::-1]  # y-flip (image_utils.cpp:22)
    h, w, c = arr.shape
    out = np.zeros((h, w, 4), np.float32)
    out[..., :c] = arr.astype(np.float32) / 255.0
    if c < 4:
        out[..., 3] = 1.0
    return out


def load_texture(path) -> Texture:
    """Single 2D texture (image_utils.cpp:7-40)."""
    return Texture(data=jnp.asarray(_to_gl_rgba_f32(load_image(path))))


def from_array(arr) -> Texture:
    """Texture from an (H, W, 3|4) float array already in [0, 1], row 0 = top
    (flipped here to GL convention)."""
    arr = np.asarray(arr, np.float32)[::-1]
    if arr.shape[-1] == 3:
        arr = np.concatenate([arr, np.ones(arr.shape[:-1] + (1,), np.float32)], -1)
    return Texture(data=jnp.asarray(arr))


def load_texture_array(paths: Sequence[str]) -> TextureStack:
    """Padded texture stack (image_utils.cpp:42-117)."""
    raws = [load_image(p) for p in paths]
    return stack_textures(raws)


def stack_textures(raw_images: Sequence[np.ndarray]) -> TextureStack:
    """Pack top-down uint8 (H, W, C) images into a padded GL-convention stack."""
    max_h = max(im.shape[0] for im in raw_images)
    max_w = max(im.shape[1] for im in raw_images)
    n = len(raw_images)
    data = np.zeros((n, max_h, max_w, 4), np.float32)  # padding = (0,0,0,0)
    sizes = np.zeros((n, 2), np.float32)
    for i, im in enumerate(raw_images):
        gl = _to_gl_rgba_f32(im)
        h, w, _ = gl.shape
        data[i, :h, :w] = gl
        sizes[i] = (w, h)
    return TextureStack(
        data=jnp.asarray(data),
        sizes=jnp.asarray(sizes),
        max_size=jnp.asarray(np.array([max_w, max_h], np.float32)),
    )


def _wrap_pad(data_cm):
    """Append one wrap row and column (REPEAT) so any (y0, x0) with
    y0 < H, x0 < W can fetch its 2x2 bilinear footprint as ONE gather
    slice.  Input/output are CHANNEL-MAJOR: (..., 4, H, W) -> (..., 4,
    H+1, W+1).  Cheap bandwidth-bound copy; under jit XLA CSEs the pad
    across a renderer's multiple sampling passes of the same texture."""
    d = jnp.concatenate([data_cm, data_cm[..., :1, :]], axis=-2)
    return jnp.concatenate([d, d[..., :, :1]], axis=-1)


def _patch_gather(padded_cm, y0i, x0i, layer=None):
    """Fetch the 2x2x4 bilinear footprint at (y0, x0) with a single
    lax.gather (one index vector per lane instead of four separate gathers —
    TPU gathers are per-index latency-bound, so this is ~3-4x cheaper than
    the naive four-corner fetch).  ``padded_cm`` is CHANNEL-MAJOR
    (4, H+1, W+1) from :func:`_wrap_pad`, or (T, 4, H+1, W+1) with
    ``layer`` indexing the stack axis.  Returns (..., 2, 2, 4) = [y, x]
    corners, channel-minor for the lerp.

    Two TPU-specific choices (docs/tpu_cost_model.md section 1):
      * the LAYERED gather form — 3 index components with the leading
        slice dim collapsed — lowers to a fast vectorized fetch (6.9 ms
        for 512^2 lanes on a 1601x1201 stack on v5e), while the rank-3
        2-index form hits a pathological serialized path (539 ms for the
        same work on a 2k background — 22x WORSE than four separate
        corner gathers);
      * CHANNEL-MAJOR operand layout: with channels minor, XLA tiles the
        (..., 4) axis into 128 lanes — 42.7x HBM padding, 8.01 GB for the
        6-layer 2048x1024 planets stack, an on-chip OOM at 1024^2 (r4).
        Channel-major pads ~1.07x and measures the same speed (5.86 vs
        5.79 ms per 262k lanes on v5e)."""
    batch = y0i.shape
    if layer is None:
        padded_cm = padded_cm[None]
        layer = jnp.zeros(batch, jnp.int32)
    c = padded_cm.shape[-3]
    idx = jnp.stack(
        [jnp.broadcast_to(layer, batch), y0i, x0i], axis=-1).reshape(-1, 3)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 2, 3))
    out = jax.lax.gather(
        padded_cm, idx, dnums, slice_sizes=(1, c, 2, 2),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return jnp.moveaxis(out, 1, -1).reshape(batch + (2, 2, c))


def _bilinear_gather(data, u, v):
    """GL_LINEAR + GL_REPEAT sample of ``data`` (H, W, 4) at normalized
    (u, v); u, v broadcast over any batch shape.  Follows the GL convention:
    texel centers at (i + 0.5)/W."""
    h, w = data.shape[-3], data.shape[-2]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)

    c = _patch_gather(_wrap_pad(jnp.moveaxis(data, -1, -3)), y0i, x0i)
    c00, c10 = c[..., 0, 0, :], c[..., 0, 1, :]
    c01, c11 = c[..., 1, 0, :], c[..., 1, 1, :]
    # lerp chains keep exact endpoints (1 stays exactly 1 for opaque alphas).
    top = c00 + fx * (c10 - c00)
    bot = c01 + fx * (c11 - c01)
    return top + fy * (bot - top)


def sample_texture(tex: Texture, u, v):
    """``texture(background_texture, uv)`` equivalent."""
    return _bilinear_gather(tex.data, u, v)


def sample_stack(stack: TextureStack, index, u, v):
    """``texture(textures, vec3(uv, index))`` equivalent.

    ``index`` is a traced int array broadcastable with u/v; indices < 0 are
    clamped to 0 (callers mask the result, matching the shader's
    ``texture_index >= 0`` guards at black_hole.frag:383,409)."""
    idx = jnp.clip(index, 0, stack.data.shape[0] - 1)
    h, w = stack.data.shape[1], stack.data.shape[2]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)

    c = _patch_gather(_wrap_pad(jnp.moveaxis(stack.data, -1, -3)), y0i, x0i,
                      layer=idx)
    c00, c10 = c[..., 0, 0, :], c[..., 0, 1, :]
    c01, c11 = c[..., 1, 0, :], c[..., 1, 1, :]
    top = c00 + fx * (c10 - c00)
    bot = c01 + fx * (c11 - c01)
    return top + fy * (bot - top)


def _compact_rows(cols, want, cap):
    """Pack the per-lane columns of active (``want``) lanes into ``cap`` rows.

    TPU gathers are per-index latency-bound (docs/tpu_cost_model.md section
    1), so a texture pass over a batch where only a few % of lanes actually
    sample pays the full batch's index count.  This gathers the active
    lanes' inputs as ONE row gather from a packed table, so the caller can
    sample at ``cap`` lanes and scatter back.

    Returns (rows (cap, F), idx (cap,), cvalid (cap,), dropped (batch,)):
    ``idx`` indexes the flat batch (fill value = batch size, which jax's
    default scatter mode DROPS), ``cvalid`` marks real rows, ``dropped``
    marks active lanes beyond capacity (callers run an exact fallback).
    """
    flat_want = want.reshape(-1)
    bsz = flat_want.shape[0]
    tab = jnp.concatenate(
        [c.reshape(bsz, -1).astype(jnp.float32) for c in cols], axis=-1)
    idx = jnp.nonzero(flat_want, size=cap, fill_value=bsz)[0]
    n_want = jnp.sum(flat_want.astype(jnp.int32))
    cvalid = jnp.arange(cap, dtype=jnp.int32) < n_want
    rows = tab[idx]
    rank = jnp.cumsum(flat_want.astype(jnp.int32)) - 1
    dropped = (flat_want & (rank >= cap)).reshape(want.shape)
    return rows, idx, cvalid, dropped


def sample_stack_compact(stack: TextureStack, index, u, v, want, cap):
    """:func:`sample_stack`, but the gather runs only for ``want`` lanes,
    compacted into ``cap`` rows (others return 0).  Identical math per lane
    to the full-batch sampler — the lerp runs on the same inputs — including
    gradients to ``stack.data`` (the scatter-add transposes to a gather).

    Lanes beyond capacity take a full-batch fallback under a ``lax.cond``
    that fires only on overflow (rare by construction: callers size ``cap``
    from the scene's expected textured coverage; a fired cond costs ~2.3x an
    inline pass — docs/tpu_cost_model.md section 3 — but never drops lanes).
    Overflow lanes may differ from the inline sampler by ~1 ulp: XLA fuses
    (FMA-contracts) the cond branch differently.
    """
    batch = u.shape
    rows, idx, cvalid, dropped = _compact_rows(
        [index, u, v], want, cap)
    c_idx = rows[:, 0].astype(jnp.int32)
    sampled = sample_stack(stack, jnp.where(cvalid, c_idx, 0),
                           jnp.where(cvalid, rows[:, 1], 0.0),
                           jnp.where(cvalid, rows[:, 2], 0.0))
    sampled = jnp.where(cvalid[:, None], sampled, 0.0)
    bsz = int(np.prod(batch))
    out = jnp.zeros((bsz, 4), jnp.float32).at[idx].add(sampled)
    out = out.reshape(batch + (4,))

    def full(_):
        return sample_stack(stack, index, u, v)

    def none(_):
        return jnp.zeros(batch + (4,), jnp.float32)

    fb = jax.lax.cond(jnp.any(dropped), full, none, None)
    return jnp.where(dropped[..., None], fb, out)


def sample_texture_compact(tex: Texture, u, v, want, cap):
    """:func:`sample_texture` compacted to ``want`` lanes (see
    :func:`sample_stack_compact`); the background-pass analog."""
    batch = u.shape
    rows, idx, cvalid, dropped = _compact_rows([u, v], want, cap)
    sampled = sample_texture(tex, jnp.where(cvalid, rows[:, 0], 0.0),
                             jnp.where(cvalid, rows[:, 1], 0.0))
    sampled = jnp.where(cvalid[:, None], sampled, 0.0)
    bsz = int(np.prod(batch))
    out = jnp.zeros((bsz, 4), jnp.float32).at[idx].add(sampled)
    out = out.reshape(batch + (4,))

    def full(_):
        return sample_texture(tex, u, v)

    def none(_):
        return jnp.zeros(batch + (4,), jnp.float32)

    fb = jax.lax.cond(jnp.any(dropped), full, none, None)
    return jnp.where(dropped[..., None], fb, out)


# ---------------------------------------------------------------------------
# Merged fetch atlas: background + texture stack in ONE gather operand.
#
# Motivation (VERDICT r2 weak #1): a dense 512^2 frame pays one full-batch
# texture gather for the slot-0 shading pass AND one for the background —
# ~2x 262k index rows at the ~19-25 ns/row XLA:TPU gather latency.  Per lane
# the frame needs only ONE fetch (its hit's texel OR its sky texel), so the
# two operands are merged into one layered atlas and the fetch becomes one
# gather with a per-lane layer index.
#
# Fetch form — the QUADROW layout (measured on v5e,
# benchmarks/gather_layout3.py, 262k lanes over a 2k background): a flat
# (G, 128) sheet where each 128-lane row holds 8 quads of 16 floats
# [c00 c10 c01 c11] (the full 2x2 bilinear footprint of one texel origin),
# fetched as ONE (1, 128) whole-row gather at group index
# g = base(l) + y0 * gpr(l) + (x0 >> 3), quad selected in-register by an
# 8-wide one-hot contraction: 3.28 ms f32 / 2.83 ms bf16 per 262k-index
# pass.  History of the two forms it replaces:
#   * pair8 (r02): (L, Hp+1, Wp, 8) slice (1,2,1,8) — 3.97 ms, but the
#     trailing dim of 8 is lane-padded to 128 by the TPU (8, 128) tiling:
#     16x HBM blowup (225 MB atlas -> 3.52 GB -> chip OOM);
#   * r03 flat8: (L, Hp+1, Wp*8) slice (1,2,8) at DYNAMIC minor start
#     x0*8 — memory-sane but 555 ms per pass (XLA:TPU serializes gathers
#     whose minor-dim start is per-index dynamic; this was the r03
#     frame-regression, BENCH_r03 837 ms/frame).
# Quadrow has a static minor start (whole 128 rows), zero tile padding
# ((G, 128) IS the native f32 tile shape), and one gather per fetch.
# ---------------------------------------------------------------------------


class FetchAtlas(NamedTuple):
    """Layered quadrow bilinear operand: layer 0 = the background, layers
    1..T = the texture stack (so ``stack_index + 1`` addresses a stack
    texture and 0 the sky).

    ``data``: (G, 128) — each row holds 8 quads of 16 values
    [c00 c10 c01 c11] x 4 channels; quad (l, y, x) lives at row
    ``base[l] + y * gpr[l] + (x >> 3)``, lane group ``x & 7``.  Layers pack
    at their OWN extents (width padded up to a multiple of 8; pad quads are
    zero and never fetched) — an 8k background no longer balloons every
    other layer to its extent (VERDICT r3 item 4).  The x/y REPEAT
    neighbors are baked into each quad at build time, so no wrap rows/cols
    exist at all.  dtype f32 (exact, the parity default) or bf16 (opt-in:
    half the HBM, measured slightly faster; <=0.4% texel error on 8-bit
    sources).

    ``wrap``: (L, 2) f32 — per-layer (wrapW, wrapH) REPEAT extents.  These
    reproduce the existing samplers exactly: the background wraps at its own
    (W, H) (:func:`sample_texture`), stack layers wrap at the PADDED
    (Wmax, Hmax) of the stack (:func:`sample_stack` — GL REPEAT over the
    padded array texture, reference-faithful).

    ``base``: (L,) int32 row offset of each layer in the sheet.
    ``gpr``: (L,) int32 groups (rows) per texel row = ceil(wrapW / 8).
    """

    data: jnp.ndarray
    wrap: jnp.ndarray
    base: jnp.ndarray
    gpr: jnp.ndarray


def _quad_rows(src, wrap_h, wrap_w):
    """(H, W, 4) -> (wrap_h * ceil(wrap_w/8), 128) quadrow sheet rows for
    one layer (see :class:`FetchAtlas`).  jnp ops only — differentiable
    w.r.t. ``src`` for traced (inverse-rendering) builds."""
    s = src[:wrap_h, :wrap_w]
    xp = jnp.roll(s, -1, axis=1)
    yp = jnp.roll(s, -1, axis=0)
    xyp = jnp.roll(xp, -1, axis=0)
    quads = jnp.concatenate([s, xp, yp, xyp], axis=-1)  # (h, w, 16)
    wp = -(-wrap_w // 8) * 8
    if wp != wrap_w:
        quads = jnp.pad(quads, ((0, 0), (0, wp - wrap_w), (0, 0)))
    return quads.reshape(wrap_h * (wp // 8), 128)


def _atlas_layers(background, stack):
    """The (src, wrap_h, wrap_w) layer list shared by both builders."""
    bh, bw = background.data.shape[-3], background.data.shape[-2]
    layers = [(background.data, bh, bw)]
    if stack is not None:
        sh, sw = stack.data.shape[1], stack.data.shape[2]
        layers += [(stack.data[i], sh, sw) for i in range(stack.data.shape[0])]
    return layers


def _atlas_tables(layers):
    """Per-layer (wrap, base, gpr) numpy tables from the layer extents."""
    wrap = np.asarray([[w, h] for _, h, w in layers], np.float32)
    gpr = np.asarray([-(-w // 8) for _, _, w in layers], np.int32)
    rows = np.asarray([h for _, h, _ in layers], np.int64) * gpr
    base = np.concatenate([[0], np.cumsum(rows)[:-1]]).astype(np.int32)
    return wrap, base, gpr, int(rows.sum())


def atlas_nbytes(background: Texture,
                 stack: Optional["TextureStack"] = None,
                 dtype=jnp.float32) -> int:
    """HBM bytes the quadrow atlas for these sources will occupy (exact:
    (G, 128) is the native tile shape, no hidden padding)."""
    _, _, _, total_rows = _atlas_tables(_atlas_layers(background, stack))
    return total_rows * 128 * jnp.dtype(dtype).itemsize


# Refuse to build an atlas past this HBM budget (VERDICT r3 weak #7: the
# r03 OOM was discovered on-chip at round end; fail loudly at build time
# instead).  Overridable via env for big-HBM parts.
ATLAS_MAX_BYTES = int(float(os.environ.get("SCHW_ATLAS_MAX_BYTES", 4e9)))


def _check_atlas_bytes(nbytes):
    if nbytes > ATLAS_MAX_BYTES:
        raise ValueError(
            f"fetch atlas would be {nbytes / 1e9:.2f} GB "
            f"(> SCHW_ATLAS_MAX_BYTES={ATLAS_MAX_BYTES / 1e9:.2f} GB); "
            "use dtype=jnp.bfloat16 (halves it; <=0.4% texel error on "
            "8-bit sources) or smaller textures")


def build_atlas(background: Texture,
                stack: Optional["TextureStack"] = None,
                dtype=jnp.float32) -> FetchAtlas:
    """Build the merged fetch atlas (see :class:`FetchAtlas`).

    With concrete inputs this executes eagerly at trace time, so the atlas
    rides the jitted renderer as a CONSTANT gather operand (the fast path —
    docs/tpu_cost_model.md section 2).  With traced texel data (inverse
    rendering optimizing a texture) it traces into the graph: ~2.3x slower
    fetches but correct and differentiable.
    """
    layers = _atlas_layers(background, stack)
    wrap, base, gpr, total_rows = _atlas_tables(layers)
    _check_atlas_bytes(total_rows * 128 * jnp.dtype(dtype).itemsize)
    sheets = [_quad_rows(src.astype(jnp.float32), h, w).astype(dtype)
              for src, h, w in layers]
    return FetchAtlas(data=jnp.concatenate(sheets, axis=0),
                      wrap=jnp.asarray(wrap), base=jnp.asarray(base),
                      gpr=jnp.asarray(gpr))


_ATLAS_CACHE = []
_ATLAS_CACHE_MAX = 4


def build_atlas_cached(background: Texture,
                       stack: Optional["TextureStack"] = None,
                       dtype=jnp.float32) -> FetchAtlas:
    """:func:`build_atlas` memoized on the IDENTITY of the source arrays.

    Why identity-memoized: a renderer traced under jit sees concrete
    (closed-over) texture arrays, and ops on concrete values execute at
    trace time -- but every TRACE rebuilds the ~hundreds-of-MB atlas and,
    measured on v5e, the resulting operand does not always reach XLA's
    constant-operand gather fast path (docs/tpu_cost_model.md section 2):
    render_fast ran 18.9 ms with an inline build vs 12.2 ms with a
    process-lifetime prebuilt atlas.  Traced inputs (inverse rendering
    optimizing texels, shard_map-passed stacks) bypass the cache and build
    inline -- correct and differentiable, just off the fast path.
    """
    import jax.core

    bg_d = background.data
    st_d = stack.data if stack is not None else None
    if isinstance(bg_d, jax.core.Tracer) or isinstance(st_d, jax.core.Tracer):
        return build_atlas(background, stack, dtype)
    np_dtype = np.dtype(dtype)
    for i, (b, s, dt, atlas) in enumerate(_ATLAS_CACHE):
        if b is bg_d and s is st_d and dt == np_dtype:
            if i:
                _ATLAS_CACHE.insert(0, _ATLAS_CACHE.pop(i))
            return atlas
    # Build in NUMPY: jnp ops on concrete arrays (including the per-layer
    # stack indexing in _atlas_layers) still TRACE inside jit — rebuilding
    # the atlas every frame and leaking tracers into the cache; the numpy
    # path runs on the host exactly once and uploads one real device
    # constant.
    bg_np = np.asarray(bg_d, np.float32)
    layers = [(bg_np, bg_np.shape[0], bg_np.shape[1])]
    if stack is not None:
        st_np = np.asarray(st_d, np.float32)
        sh, sw = st_np.shape[1], st_np.shape[2]
        layers += [(st_np[i], sh, sw) for i in range(st_np.shape[0])]
    wrap, base, gpr, total_rows = _atlas_tables(layers)
    _check_atlas_bytes(total_rows * 128 * np_dtype.itemsize)
    data = np.zeros((total_rows, 128), np_dtype)
    for (srcl, h, w), b0, g in zip(layers, base, gpr):
        s = srcl[:h, :w]
        quads = np.concatenate(
            [s, np.roll(s, -1, axis=1), np.roll(s, -1, axis=0),
             np.roll(np.roll(s, -1, axis=1), -1, axis=0)], axis=-1)
        if g * 8 != w:
            quads = np.pad(quads, ((0, 0), (0, g * 8 - w), (0, 0)))
        data[b0:b0 + h * g] = quads.reshape(h * g, 128)
    # Upload ONCE as a real device array under ensure_compile_time_eval():
    # a plain jnp conversion inside a caller's trace would be a per-trace
    # tracer (leaking through the cache), and a raw NUMPY constant gets
    # serialized as an HLO literal — hundreds of MB through this
    # environment's remote-compile tunnel (HTTP 413 on the grad program).
    # A concrete device array closure rides as a compiled-program parameter:
    # the constant-operand gather fast path without the serialization.
    with jax.ensure_compile_time_eval():
        atlas = FetchAtlas(data=jnp.asarray(data), wrap=jnp.asarray(wrap),
                           base=jnp.asarray(base), gpr=jnp.asarray(gpr))
    _ATLAS_CACHE.insert(0, (bg_d, st_d, np_dtype, atlas))
    del _ATLAS_CACHE[_ATLAS_CACHE_MAX:]
    return atlas


def _layer_tables(atlas: FetchAtlas, layer):
    """Per-lane (wrapW, wrapH, base, gpr) via an unrolled select chain (the
    layer table is tiny; a real gather would pay per-index latency)."""
    wr, bs, gp = atlas.wrap, atlas.base, atlas.gpr
    out_w = jnp.broadcast_to(wr[0, 0], layer.shape)
    out_h = jnp.broadcast_to(wr[0, 1], layer.shape)
    out_b = jnp.broadcast_to(bs[0], layer.shape)
    out_g = jnp.broadcast_to(gp[0], layer.shape)
    for j in range(1, wr.shape[0]):
        sel = layer == j
        out_w = jnp.where(sel, wr[j, 0], out_w)
        out_h = jnp.where(sel, wr[j, 1], out_h)
        out_b = jnp.where(sel, bs[j], out_b)
        out_g = jnp.where(sel, gp[j], out_g)
    return out_w, out_h, out_b, out_g


def atlas_fetch(atlas: FetchAtlas, layer, u, v):
    """Bilinear GL_REPEAT sample of ``layer`` at (u, v) — one whole-row
    (1, 128) quadrow gather per lane plus an in-register one-hot quad
    select.  Per lane bit-compatible with :func:`sample_texture` (layer 0)
    / :func:`sample_stack` (layer i+1, caller passes the same rescaled uv)
    when the atlas is f32: identical texel values through the identical
    lerp."""
    batch = u.shape
    layer = jnp.clip(layer, 0, atlas.wrap.shape[0] - 1)
    w, h, base, gpr = _layer_tables(atlas, layer)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    # mod against the per-lane float wrap, then int (wraps are exact small
    # ints in f32; matches the int mod of the per-operand samplers).
    x0i = jnp.mod(x0, w).astype(jnp.int32)
    y0i = jnp.mod(y0, h).astype(jnp.int32)
    g = (base + y0i * gpr + (x0i >> 3)).reshape(-1, 1)
    q = (x0i & 7).reshape(-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    rows = jax.lax.gather(
        atlas.data, g, dnums, slice_sizes=(1, 128),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).astype(jnp.float32).reshape(-1, 8, 16)
    onehot = (q[:, None] == jnp.arange(8, dtype=jnp.int32)[None]
              ).astype(jnp.float32)
    quad = jnp.einsum("nqf,nq->nf", rows, onehot).reshape(batch + (4, 4))
    c00, c10 = quad[..., 0, :], quad[..., 1, :]
    c01, c11 = quad[..., 2, :], quad[..., 3, :]
    top = c00 + fx * (c10 - c00)
    bot = c01 + fx * (c11 - c01)
    return top + fy * (bot - top)


@jax.custom_vjp
def _atlas_fetch_frozen(atlas: FetchAtlas, layer, u, v):
    return atlas_fetch(atlas, layer, u, v)


def _aff_fwd(atlas, layer, u, v):
    batch = u.shape
    layer_c = jnp.clip(layer, 0, atlas.wrap.shape[0] - 1)
    w, h, base, gpr = _layer_tables(atlas, layer_c)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0, w).astype(jnp.int32)
    y0i = jnp.mod(y0, h).astype(jnp.int32)
    g = (base + y0i * gpr + (x0i >> 3)).reshape(-1, 1)
    q = (x0i & 7).reshape(-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    rows = jax.lax.gather(
        atlas.data, g, dnums, slice_sizes=(1, 128),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).astype(jnp.float32).reshape(-1, 8, 16)
    onehot = (q[:, None] == jnp.arange(8, dtype=jnp.int32)[None]
              ).astype(jnp.float32)
    quad = jnp.einsum("nqf,nq->nf", rows, onehot).reshape(batch + (4, 4))
    c00, c10 = quad[..., 0, :], quad[..., 1, :]
    c01, c11 = quad[..., 2, :], quad[..., 3, :]
    top = c00 + fx * (c10 - c00)
    bot = c01 + fx * (c11 - c01)
    out = top + fy * (bot - top)
    # Residuals: the two lerp derivative planes + the per-lane texel scales
    # — 10 f32 planes, no gather and no branch machinery in the transpose.
    # atlas/layer ride along (by reference) so bwd can emit the right-shaped
    # zero cotangents; the zeros_like(data) is dead code the moment the
    # caller doesn't differentiate the atlas, and XLA DCEs it.
    d_dfx = (c10 - c00) + fy * ((c11 - c01) - (c10 - c00))
    d_dfy = bot - top
    return out, (atlas, layer, d_dfx, d_dfy, w, h)


def _zero_ct(x):
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


def _aff_bwd(res, ct):
    atlas, layer, d_dfx, d_dfy, w, h = res
    d_u = jnp.sum(ct * d_dfx, axis=-1) * w
    d_v = jnp.sum(ct * d_dfy, axis=-1) * h
    return (jax.tree_util.tree_map(_zero_ct, atlas), _zero_ct(layer),
            d_u, d_v)


_atlas_fetch_frozen.defvjp(_aff_fwd, _aff_bwd)


def atlas_fetch_frozen(atlas: FetchAtlas, layer, u, v):
    """:func:`atlas_fetch` with a custom VJP that treats the TEXELS as
    constants: gradients flow to (u, v) only, through saved lerp-derivative
    residuals — no gather and no `lax.cond` branch machinery appears in the
    transpose.

    Why this exists (round-4 profiling): under jax.grad, each compose
    level's tile-compaction `lax.cond` cost ~5.2 ms — AD through the cond
    dragged the full-frame fetch into the backward program (the generic
    fetch transpose re-traverses the gather+one-hot graph as a cond branch
    operand, off the constant-operand fast path).  With this wrapper the
    512^2 demo grad dropped 45.5 -> 27.9 ms on v5e.

    Correct ONLY when the atlas is a constant w.r.t. the differentiated
    parameters — true whenever the caller prebuilt it outside the grad
    (the ``atlas=`` argument path) or from concrete textures.  Inverse
    rendering that optimizes TEXELS builds a traced atlas and must use
    :func:`atlas_fetch` (render_fast selects automatically)."""
    return _atlas_fetch_frozen(atlas, layer, u, v)


def atlas_fetch_compact(atlas: FetchAtlas, layer, u, v, want, cap):
    """:func:`atlas_fetch` over ``want`` lanes only, compacted into ``cap``
    rows (zeros elsewhere); full-batch lax.cond fallback on capacity overflow
    (see :func:`sample_stack_compact` for the trade-offs)."""
    batch = u.shape
    rows, idx, cvalid, dropped = _compact_rows([layer, u, v], want, cap)
    c_layer = rows[:, 0].astype(jnp.int32)
    sampled = atlas_fetch(atlas, jnp.where(cvalid, c_layer, 0),
                          jnp.where(cvalid, rows[:, 1], 0.0),
                          jnp.where(cvalid, rows[:, 2], 0.0))
    sampled = jnp.where(cvalid[:, None], sampled, 0.0)
    bsz = int(np.prod(batch))
    out = jnp.zeros((bsz, 4), jnp.float32).at[idx].add(sampled)
    out = out.reshape(batch + (4,))

    def full(_):
        return atlas_fetch(atlas, layer, u, v)

    def none(_):
        return jnp.zeros(batch + (4,), jnp.float32)

    fb = jax.lax.cond(jnp.any(dropped), full, none, None)
    return jnp.where(dropped[..., None], fb, out)


def with_dtype(tex: Texture, dtype=jnp.bfloat16) -> Texture:
    """Texel-storage precision knob: bf16 texels gather ~1.5x faster on TPU
    (half the slice bytes per index of the latency-bound patch gather) at
    <= 0.2% per-texel error (8-bit significand; source PNGs are 8-bit
    anyway).  The bilinear/trilinear lerp weights stay f32, so sampled
    results promote back to f32 and EXACT 1.0 alphas stay exact (1.0 is
    representable in bf16), preserving the first-opaque break and the
    provable-opacity analysis.  Opt-in: f32 remains the oracle-parity
    default."""
    return tex._replace(data=tex.data.astype(dtype),
                        mips=tuple(m.astype(dtype) for m in tex.mips))


def stack_with_dtype(stack: TextureStack, dtype=jnp.bfloat16) -> TextureStack:
    """:func:`with_dtype` for a :class:`TextureStack` (sizes stay f32)."""
    return stack._replace(data=stack.data.astype(dtype),
                          mips=tuple(m.astype(dtype) for m in stack.mips))


def solid_color_texture(rgba, size=4) -> Texture:
    """Tiny constant texture — handy for tests."""
    rgba = np.asarray(rgba, np.float32)
    return Texture(data=jnp.broadcast_to(jnp.asarray(rgba), (size, size, 4)))


# ---------------------------------------------------------------------------
# Mipmaps (opt-in, beyond-reference — see the Texture docstring for why the
# reference never actually samples its mipmaps).
# ---------------------------------------------------------------------------


def downsample2(data):
    """One mip step: 2x2 box filter with floor halving (odd trailing
    row/column dropped, like GL's floor(size/2) level sizing).  Works on
    (..., H, W, 4); differentiable w.r.t. ``data``."""
    h, w = data.shape[-3], data.shape[-2]
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    d = data[..., : h2 * 2, : w2 * 2, :] if h >= 2 and w >= 2 else data
    if h < 2 or w < 2:
        return d[..., :h2, :w2, :]
    d = d.reshape(d.shape[:-3] + (h2, 2, w2, 2, 4))
    return d.mean(axis=(-4, -2))


def build_mips(data, max_levels: int = 16) -> tuple:
    """Full mip chain below the base level: (half, quarter, ...) down to 1x1.
    Pure jnp — callable inside jit, so an optimized texture's pyramid stays
    differentiable w.r.t. the base texels."""
    mips = []
    cur = data
    while (cur.shape[-3] > 1 or cur.shape[-2] > 1) and len(mips) < max_levels:
        cur = downsample2(cur)
        mips.append(cur)
    return tuple(mips)


def with_mips(tex: Texture) -> Texture:
    return tex._replace(mips=build_mips(tex.data))


def stack_with_mips(stack: TextureStack) -> TextureStack:
    return stack._replace(mips=build_mips(stack.data))


def _flat_pyramid(levels):
    """Flatten (level list of (..., h_l, w_l, 4)) into one gatherable buffer
    (..., sum(h_l*w_l), 4) + static per-level offset/size tables, so a
    trilinear sample costs 8 gathers total instead of 4 per level."""
    offsets, widths, heights = [], [], []
    bufs = []
    off = 0
    for lv in levels:
        h, w = lv.shape[-3], lv.shape[-2]
        offsets.append(off)
        widths.append(w)
        heights.append(h)
        off += h * w
        bufs.append(lv.reshape(lv.shape[:-3] + (h * w, 4)))
    buf = jnp.concatenate(bufs, axis=-2)
    return (buf, jnp.asarray(offsets, jnp.int32), jnp.asarray(widths, jnp.int32),
            jnp.asarray(heights, jnp.int32))


def _bilinear_flat(buf, off, w, h, u, v, layer=None):
    """Bilinear REPEAT sample from a flattened level.  ``off``/``w``/``h``
    are per-pixel int arrays (the selected level's table entries); ``layer``
    indexes the stack axis when ``buf`` is (T, N, 4)."""
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    y1i = jnp.mod(y0i + 1, h)

    def at(yi, xi):
        idx = off + yi * w + xi
        if layer is None:
            return buf[idx]
        return buf[layer, idx]

    c00 = at(y0i, x0i)
    c10 = at(y0i, x1i)
    c01 = at(y1i, x0i)
    c11 = at(y1i, x1i)
    top = c00 + fx * (c10 - c00)
    bot = c01 + fx * (c11 - c01)
    return top + fy * (bot - top)


def _trilinear(levels, u, v, lod, layer=None):
    """Trilinear blend between the two mip levels bracketing ``lod``
    (0 = base).  ``levels`` = (base, mip1, ...)."""
    n = len(levels)
    buf, offs, ws, hs = _flat_pyramid(levels)
    lod = jnp.clip(lod, 0.0, float(n - 1))
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n - 1)
    f = (lod - l0.astype(jnp.float32))[..., None]
    a = _bilinear_flat(buf, offs[l0], ws[l0], hs[l0], u, v, layer)
    b = _bilinear_flat(buf, offs[l1], ws[l1], hs[l1], u, v, layer)
    return a + f * (b - a)


def sample_texture_trilinear(tex: Texture, u, v, lod):
    """LOD-aware sample; equals :func:`sample_texture` at lod == 0."""
    if not tex.mips:
        return sample_texture(tex, u, v)
    return _trilinear((tex.data,) + tuple(tex.mips), u, v, lod)


def sample_stack_trilinear(stack: TextureStack, index, u, v, lod):
    """LOD-aware stack sample; equals :func:`sample_stack` at lod == 0."""
    if not stack.mips:
        return sample_stack(stack, index, u, v)
    idx = jnp.clip(index, 0, stack.data.shape[0] - 1)
    return _trilinear((stack.data,) + tuple(stack.mips), u, v, lod, layer=idx)


def screen_space_lod(tx, ty, valid=None, key=None):
    """GL-style implicit LOD from screen-space texel-coordinate derivatives.

    ``tx``/``ty``: the sample position in LEVEL-0 TEXELS, shaped (H, W) over
    the image grid.  Per screen axis the footprint is the L1 texel step to
    the nearest USABLE neighbor — forward or backward, whichever is smaller
    (robust across REPEAT seams) — then GL's max-axis rule:
    lod = log2(max footprint).

    ``valid``/``key``: optional (H, W) masks — a neighbor is usable only when
    both lanes are valid and carry the same key (same hit object).  This is
    the analog of GL quad derivatives, where helper lanes shade the SAME
    primitive; without it, derivatives across object silhouettes produce
    garbage LOD.  Lanes with no usable neighbor on an axis fall back to
    footprint 0 (base level) on that axis.
    """
    INF = jnp.float32(np.inf)

    def step(axis, shift):
        dtx = jnp.abs(jnp.roll(tx, shift, axis) - tx)
        dty = jnp.abs(jnp.roll(ty, shift, axis) - ty)
        d = dtx + dty
        if valid is not None:
            ok = valid & jnp.roll(valid, shift, axis)
            if key is not None:
                ok = ok & (key == jnp.roll(key, shift, axis))
            d = jnp.where(ok, d, INF)
        return d

    def axis_footprint(axis):
        d = jnp.minimum(step(axis, -1), step(axis, 1))
        return jnp.where(jnp.isinf(d), 0.0, d)

    footprint = jnp.maximum(axis_footprint(0), axis_footprint(1))
    return jnp.maximum(jnp.log2(jnp.maximum(footprint, 1e-8)), 0.0)

"""Phong shading, UV transforms, normal maps, and the equirect background.

Replaces black_hole.frag:365-438 (calculate_lighting) and 829-837 (get_bg),
fully vectorized and branchless over ray batches.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from . import geometry as geo
from .intersect import Hit
from .scene import (
    OBJECT_TYPE_PLANE,
    OBJECT_TYPE_SPECIAL,
    OBJECT_TYPE_TEST_RAY_CURVED,
    OBJECT_TYPE_TEST_RAY_FLAT,
    Scene,
)
from .textures import (
    Texture,
    TextureStack,
    sample_stack,
    sample_stack_trilinear,
    sample_texture,
    sample_texture_trilinear,
    screen_space_lod,
)

TEST_RAY_CURVED_COLOR = (1.0, 0.0, 0.0, 1.0)  # frag:191
TEST_RAY_FLAT_COLOR = (0.0, 1.0, 0.0, 1.0)  # frag:192


def _gather(soa_field, idx, _max_select=16):
    """Per-lane table lookup.  TPU HLO gathers are per-index latency-bound
    (the dominant cost of the shading pass in round 2 profiling); for the
    small tables here (materials, texture sizes) an unrolled select chain
    fuses into one elementwise pass and is exact for every dtype.  Large
    tables fall back to a real gather."""
    n = soa_field.shape[0]
    if n > _max_select:
        return soa_field[idx]
    out = jnp.broadcast_to(soa_field[0], idx.shape + soa_field.shape[1:])
    for j in range(1, n):
        sel = idx == j
        if soa_field.ndim > 1:
            sel = sel[..., None]
        out = jnp.where(sel, soa_field[j], out)
    return out


def _concrete_none_negative(idx) -> bool:
    """True iff ``idx`` is available at trace time AND every entry is < 0
    (e.g. 'no material uses a normal map').  Traced arrays return False —
    the caller must then do the work dynamically."""
    try:
        import numpy as np

        return bool((np.asarray(idx) < 0).all())
    except Exception:
        return False


class TexelRequest(NamedTuple):
    """A batch of hits' texture-fetch request (see :func:`texel_request`)."""

    u: jnp.ndarray  # (...,) sample u for sample_stack / the fetch atlas
    v: jnp.ndarray  # (...,)
    index: jnp.ndarray  # (...,) int32 — stack texture index
    use_tex: jnp.ndarray  # (...,) bool — base color comes from the texture
    uv: jnp.ndarray  # (..., 2) post-swap/invert uv (normal-map input)
    cont_u: jnp.ndarray  # (...,) continuous (pre-mod) coords for LOD
    cont_v: jnp.ndarray  # (...,)


def texel_request(hit: Hit, sc: Scene, tex: TextureStack) -> TexelRequest:
    """The texture-fetch REQUEST of a batch of hits, without fetching.

    Replicates shade()'s uv pipeline (swap/invert frag:373-380, size rescale
    frag:384, plane tiling window frag:387-400): ``(u, v, index)`` are the
    exact arguments shade() passes to :func:`textures.sample_stack` and
    ``use_tex`` masks lanes whose base color comes from the texture.  Callers
    fetch through whatever machinery fits the pass (full-batch merged atlas,
    compacted fetch) and hand the texel to :func:`shade_from_base`;
    ``shade(...)`` is the reference composition of the two.
    """
    m = sc.materials
    mi = jnp.clip(hit.mat_idx, 0, m.color.shape[0] - 1)
    texture_index = _gather(m.texture_index, mi)
    invert_uv_x = _gather(m.invert_uv_x, mi)
    invert_uv_y = _gather(m.invert_uv_y, mi)
    swap_uvs = _gather(m.swap_uvs, mi)

    # UV transforms (frag:373-380): first swap, then invert; inversion uses
    # the plane's texture_size for planes, 1 otherwise.
    uv = hit.uv
    uv = jnp.where(swap_uvs[..., None], uv[..., ::-1], uv)
    is_plane = hit.obj_type == OBJECT_TYPE_PLANE
    inv_extent = jnp.where(
        is_plane[..., None], hit.plane_tex_size,
        jnp.ones_like(hit.plane_tex_size))
    ux = jnp.where(invert_uv_x, inv_extent[..., 0] - uv[..., 0], uv[..., 0])
    uy = jnp.where(invert_uv_y, inv_extent[..., 1] - uv[..., 1], uv[..., 1])
    uv = jnp.stack([ux, uy], axis=-1)

    tex_sizes = _gather(tex.sizes,
                        jnp.clip(texture_index, 0, tex.sizes.shape[0] - 1))
    rescaled_uv = uv * tex_sizes / tex.max_size
    # Plane texture tiling window (frag:387-400).
    plane_uv_src = rescaled_uv - hit.plane_tex_offset
    plane_window_uv = plane_uv_src / jnp.maximum(hit.plane_tex_size, 1e-12)
    plane_tiled = jnp.mod(plane_uv_src, hit.plane_tex_size) / jnp.maximum(
        hit.plane_tex_size, 1e-12)
    in_window = (
        (plane_window_uv[..., 0] >= 0.0)
        & (plane_window_uv[..., 0] <= 1.0)
        & (plane_window_uv[..., 1] >= 0.0)
        & (plane_window_uv[..., 1] <= 1.0)
    )
    render_color = jnp.where(is_plane, hit.plane_repeat | in_window, True)
    sample_uv = jnp.where(is_plane[..., None], plane_tiled, rescaled_uv)
    use_tex = (texture_index >= 0) & render_color
    # Continuous (pre-mod) texel coordinates — the implicit-LOD input for
    # trilinear minification.
    cont_uv = jnp.where(
        is_plane[..., None],
        plane_uv_src / jnp.maximum(hit.plane_tex_size, 1e-12),
        rescaled_uv)
    return TexelRequest(sample_uv[..., 0], sample_uv[..., 1], texture_index,
                        use_tex, uv, cont_uv[..., 0], cont_uv[..., 1])


def shade_from_base(hit: Hit, view_dir, sc: Scene, base_color) -> jnp.ndarray:
    """Phong lighting + special-type overrides given an already-resolved
    ``base_color`` (material color or fetched texel) — shade() minus the
    texture machinery, with NO gathers beyond the small material tables.
    Normal maps are the caller's job (supply a pre-mapped normal by replacing
    ``hit.normal``? no — normal maps need the tangent frame applied AFTER
    flip_normals, so callers needing them use shade() or fetch the nm texel
    and pass it via ``nm_rgb``)."""
    return _shade_lit(hit, view_dir, sc, base_color, nm_rgb=None)


def _shade_lit(hit: Hit, view_dir, sc: Scene, base_color, nm_rgb):
    """Shared lighting core: flip/cull, optional normal-map application
    (``nm_rgb`` = raw rgb in [0,1] or None), ambient + per-light Phong,
    special-type overrides (frag:365-438)."""
    m = sc.materials
    mi = jnp.clip(hit.mat_idx, 0, m.color.shape[0] - 1)
    ambient = _gather(m.ambient, mi)
    diffuse_k = _gather(m.diffuse, mi)
    specular_k = _gather(m.specular, mi)
    shininess = _gather(m.shininess, mi)
    double_sided = _gather(m.double_sided_normals, mi)
    flip_normals = _gather(m.flip_normals, mi)

    normal = jnp.where(flip_normals[..., None], -hit.normal, hit.normal)
    culled = (~double_sided) & (geo.dot(normal, view_dir) < 0.0)

    if nm_rgb is not None:
        normal_map_index = _gather(m.normal_map_index, mi)
        ts_normal = (
            nm_rgb[..., 0:1] * hit.tangent
            + nm_rgb[..., 1:2] * hit.bitangent
            + nm_rgb[..., 2:3] * normal
        )
        mapped = geo.safe_normalize(ts_normal)
        normal = jnp.where((normal_map_index >= 0)[..., None], mapped, normal)

    final_rgb = ambient[..., None] * base_color[..., :3]  # frag:406

    lt = sc.lights
    for i in range(lt.pos.shape[0]):
        lpos = lt.pos[i]
        to_light = lpos - hit.point
        distance = geo.safe_length(to_light)
        light_dir = to_light / distance[..., None]
        attenuation = 1.0 / (
            lt.attenuation_constant[i]
            + lt.attenuation_linear[i] * distance
            + lt.attenuation_quadratic[i] * distance * distance
        )
        diff = jnp.maximum(geo.dot(normal, light_dir), 0.0)
        diffuse = (diffuse_k[..., None] * diff[..., None] * lt.color[i]
                   * base_color[..., :3])

        reflect_dir = geo.reflect(-light_dir, normal)
        spec_dot = jnp.maximum(geo.dot(view_dir, reflect_dir), 0.0)
        spec = jnp.where(
            spec_dot > 0.0, jnp.maximum(spec_dot, 1e-30) ** shininess, 0.0
        )
        specular = specular_k[..., None] * spec[..., None] * lt.color[i]

        final_rgb = final_rgb + (diffuse + specular) * (
            attenuation * lt.intensity[i]
        )[..., None]

    lit = jnp.concatenate([final_rgb, base_color[..., 3:4]], axis=-1)
    lit = jnp.where(culled[..., None], jnp.zeros_like(lit), lit)

    out = lit
    out = jnp.where(
        (hit.obj_type == OBJECT_TYPE_SPECIAL)[..., None],
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        out,
    )
    out = jnp.where(
        (hit.obj_type == OBJECT_TYPE_TEST_RAY_CURVED)[..., None],
        jnp.array(TEST_RAY_CURVED_COLOR, jnp.float32),
        out,
    )
    out = jnp.where(
        (hit.obj_type == OBJECT_TYPE_TEST_RAY_FLAT)[..., None],
        jnp.array(TEST_RAY_FLAT_COLOR, jnp.float32),
        out,
    )
    return out


def shade(
    hit: Hit,
    view_dir,
    sc: Scene,
    tex: Optional[TextureStack] = None,
    trilinear: bool = False,
) -> jnp.ndarray:
    """Lighting for a batch of hits; returns RGBA (..., 4).

    ``view_dir`` points from the surface towards the camera (-ray.dir,
    frag:818).  Result is only meaningful where ``hit.valid``; callers mask.

    ``trilinear``: LOD-aware texture minification (requires ``tex.mips`` and
    an (H, W) image-grid batch for the screen-space derivatives).  False =
    level-0 bilinear, the reference's actual behavior (its GL_LINEAR min
    filter never samples mips — image_utils.cpp:17,113).

    Composition of :func:`texel_request` + samplers + :func:`_shade_lit`;
    the fast renderer fetches the same requests through the merged atlas
    instead (kernel_scene.render_fast).
    """
    m = sc.materials
    mi = jnp.clip(hit.mat_idx, 0, m.color.shape[0] - 1)
    color = _gather(m.color, mi)
    base_color = color
    nm_rgb = None
    if tex is not None:
        req = texel_request(hit, sc, tex)
        use_mips = trilinear and len(tex.mips) > 0
        if use_mips:
            # Implicit-LOD analog: derivatives of the CONTINUOUS (pre-mod)
            # texel coordinates over the image grid, restricted to
            # same-object neighbors (the GL quad-helper-lane analog).
            same_key = hit.obj_type * 65536 + mi
            lod = screen_space_lod(req.cont_u * tex.max_size[0],
                                   req.cont_v * tex.max_size[1],
                                   valid=hit.valid, key=same_key)
            sampled = sample_stack_trilinear(tex, req.index, req.u, req.v,
                                             lod)
        else:
            sampled = sample_stack(tex, req.index, req.u, req.v)
        base_color = jnp.where(req.use_tex[..., None], sampled, color)

        # Normal map (frag:408-413): note the reference uses the RAW rgb in
        # [0,1] (no *2-1 decode) — reproduced faithfully.  When the material
        # table is concrete (sc closed over, the common case) and no material
        # has a normal map, skip the gathers entirely — TPU gathers are the
        # expensive part of this pass.
        if not _concrete_none_negative(m.normal_map_index):
            normal_map_index = _gather(m.normal_map_index, mi)
            nm_sizes = _gather(
                tex.sizes,
                jnp.clip(normal_map_index, 0, tex.sizes.shape[0] - 1))
            nm_uv = req.uv * nm_sizes / tex.max_size
            if use_mips:
                nm_lod = screen_space_lod(nm_uv[..., 0] * tex.max_size[0],
                                          nm_uv[..., 1] * tex.max_size[1],
                                          valid=hit.valid,
                                          key=hit.obj_type * 65536 + mi)
                nm_rgb = sample_stack_trilinear(
                    tex, normal_map_index, nm_uv[..., 0], nm_uv[..., 1],
                    nm_lod)[..., :3]
            else:
                nm_rgb = sample_stack(tex, normal_map_index, nm_uv[..., 0],
                                      nm_uv[..., 1])[..., :3]
    return _shade_lit(hit, view_dir, sc, base_color, nm_rgb)


def equirect_uv(direction):
    """Equirectangular (u, v) of a unit direction (frag:829-835): longitude
    from atan(z, x), latitude from asin(y).  Factored out so the fast
    renderer can fetch the sky through the merged atlas with the exact same
    coordinates :func:`get_background` samples at."""
    u = jnp.arctan2(direction[..., 2], direction[..., 0]) / jnp.pi
    u = jnp.where(u < 0.0, u + 2.0, u) * 0.5
    # 1e-7 clip margin keeps asin' finite for exactly-polar directions.
    v = jnp.arcsin(jnp.clip(direction[..., 1], -1.0 + 1e-7, 1.0 - 1e-7)) / jnp.pi + 0.5
    return u, v


def get_background(bg: Texture, direction, trilinear: bool = False) -> jnp.ndarray:
    """Equirectangular sky sample of a unit direction (frag:829-837).

    ``trilinear``: LOD-aware minification over the image grid (opt-in,
    beyond-reference — see shade())."""
    u, v = equirect_uv(direction)
    if trilinear and len(bg.mips) > 0:
        h, w = bg.data.shape[-3], bg.data.shape[-2]
        lod = screen_space_lod(u * w, v * h)
        return sample_texture_trilinear(bg, u, v, lod)
    return sample_texture(bg, u, v)


# Crosshair overlay constants (frag:25-28).
CROSSHAIR_LENGTH = 10.0
CROSSHAIR_WIDTH = 2.0
CROSSHAIR_SPACE = 5.0
CROSSHAIR_COLOR = (0.5, 0.5, 0.5, 0.5)


def crosshair_mask(u, v, width, height):
    """Pixel-space crosshair test (frag:845-855); u, v are the NDC coords."""
    px = jnp.abs(u * width / 2.0)
    py = jnp.abs(v * height / 2.0)
    vertical = (
        (px < CROSSHAIR_WIDTH / 2.0)
        & (py > CROSSHAIR_SPACE)
        & (py < CROSSHAIR_LENGTH + CROSSHAIR_SPACE)
    )
    horizontal = (
        (py < CROSSHAIR_WIDTH / 2.0)
        & (px > CROSSHAIR_SPACE)
        & (px < CROSSHAIR_LENGTH + CROSSHAIR_SPACE)
    )
    return vertical | horizontal

"""Slot composition for the fast renderer: the tile-compacted level engine.

The composition problem (black_hole.frag:930-935): per lane, shade its
recorded hit segments in order, accumulate additively, stop at the first
opaque hit, and add the background if nothing opaque terminated the ray.

The TPU cost model (docs/tpu_cost_model.md) dictates the shape of the
solution, all numbers measured on v5e at 512^2 (262k lanes):

  * intersect + Phong arithmetic over the FULL frame is free (~0.05 ms —
    elementwise VPU work), so every level runs its geometry full-batch;
  * a texture/sky fetch costs ~15 ns per index row (3.9 ms full-batch via
    the pair8 merged atlas, textures.FetchAtlas) — fetch count is the ONLY
    thing worth optimizing;
  * per-LANE compaction cannot win: jnp.nonzero alone costs 2.4 ms and the
    row gather/scatter ride computed operands (2.3x gather penalty) — a
    compacted fetch measured 5.1-7.3 ms, WORSE than full batch;
  * per-TILE compaction is nearly free: indices are tile ids (a few
    thousand), slices are whole (8, 128) tiles, so the gather/scatter are
    bandwidth-bound (~0.1 ms for a 40%-of-frame domain).

So: LEVEL k composes each lane's k-th contribution (slot k, the folded
far-field/flat ray at the lane's first free slot, or the residual far ray
once every slot is taken) with ONE merged fetch per lane — its hit texel if
the hit is textured, else its sky texel, consumed immediately when the
lane's contributions end at this level.  Level 0 runs on the full frame;
levels 1.. run on the tiles that still have pending lanes (trailing work
clusters: accretion-disk crossings form arcs), gathered into a dense
domain, with a full-frame lax.cond fallback if a level's pending tiles
exceed its static capacity (never in shipped scenes; the cond costs nothing
unfired).  A final cleanup level pays the sky debt of lanes whose last
fetch was a texel (translucent textured paths) and, with a soft horizon,
of captured lanes whose recording slot was dropped.

Exactly the same per-lane math and composition order as the legacy
render() twin — parity-tested in tests/test_kernel_scene.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import intersect_scene
from .scene import OBJECT_TYPE_SPECIAL, Scene
from .shading import _concrete_none_negative, _gather, _shade_lit, texel_request
from .textures import FetchAtlas, atlas_fetch, atlas_fetch_frozen

# Tile shape for the trailing-domain compaction: one native f32 vector tile.
TILE_H, TILE_W = 8, 128



def _tileize(x, nth, ntw):
    """(H, W[, C]) -> (nth*ntw, TILE_H, TILE_W[, C])."""
    lead = (nth, TILE_H, ntw, TILE_W)
    x = x.reshape(lead + x.shape[2:])
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape((nth * ntw, TILE_H, TILE_W) + x.shape[4:])


def _untileize(t, nth, ntw):
    """Inverse of :func:`_tileize`."""
    x = t.reshape((nth, ntw, TILE_H, TILE_W) + t.shape[3:])
    x = jnp.moveaxis(x, 1, 2)
    return x.reshape((nth * TILE_H, ntw * TILE_W) + x.shape[4:])


def _pack_planes(P, keys):
    """Stack the named planes into ONE (H, W, F) f32 array (bools/ints ride
    as f32 — the values are small exact integers) plus the recipe to unpack.
    One packed array = one tileize + one tile gather + one scatter instead
    of dozens of tiny kernels (each standalone transpose/gather costs fixed
    launch overhead that dwarfed the actual trailing work, measured round 3:
    ~6 ms of fixed cost across the trailing levels before packing)."""
    cols = []
    recipe = []
    ofs = 0
    for k in keys:
        x = P[k]
        c = 1 if x.ndim == 2 else x.shape[-1]
        cols.append(x.astype(jnp.float32).reshape(x.shape[:2] + (c,)))
        recipe.append((k, ofs, c, x.dtype, x.ndim))
        ofs += c
    return jnp.concatenate(cols, axis=-1), recipe


def _unpack_planes(packed, recipe):
    out = {}
    for k, ofs, c, dtype, ndim in recipe:
        x = packed[..., ofs:ofs + c]
        if ndim == 2:
            x = x[..., 0]
        out[k] = x.astype(dtype)
    return out


def _gather_tiles(P, idx, nth, ntw):
    """Pull the tiles ``idx`` out of the planes of ``P`` into a dense
    (capT*TILE_H, TILE_W)-shaped domain — packed into one array, one gather.
    Out-of-range ids (the nonzero fill value) clamp — the resulting garbage
    rows are dropped again at scatter time."""
    capt = idx.shape[0]
    packed, recipe = _pack_planes(P, list(P))
    rows = _tileize(packed, nth, ntw)[idx]
    dom = rows.reshape((capt * TILE_H, TILE_W) + rows.shape[3:])
    return _unpack_planes(dom, recipe)


def _scatter_tiles(P_full, P_dom, keys, idx, nth, ntw):
    """Write the domain's tiles of the named planes back over the full frame
    — packed into one array, one scatter (out-of-range ids drop — jax's
    default scatter mode under jit)."""
    capt = idx.shape[0]
    full_packed, recipe = _pack_planes(P_full, keys)
    dom_packed, _ = _pack_planes(P_dom, keys)
    rows = dom_packed.reshape((capt, TILE_H, TILE_W) + dom_packed.shape[2:])
    full_t = _tileize(full_packed, nth, ntw).at[idx].set(rows)
    return _unpack_planes(_untileize(full_t, nth, ntw), recipe)


def _tile_any(mask, nth, ntw):
    """Per-tile any() of a (H, W) bool mask -> (n_tiles,) bool."""
    return jnp.any(_tileize(mask, nth, ntw), axis=(1, 2))


def compose_atlas(
    sc: Scene,
    tex,
    atlas: FetchAtlas,
    r_s,
    *,
    slots,
    recs,
    n_rec,
    needs_far,
    use_pos,
    use_dir,
    bgu,
    bgv,
    bg_hard,
    bg_scale,
    soft: bool,
    cap_drop,
    open_init,
    test_ray=None,
    compact_tiles: bool = True,
    max_levels: Optional[int] = None,
    return_pend: bool = False,
    frozen_texels: bool = False,
):
    """Run all composition levels; returns (color, open, captured_shaded).

    ``frozen_texels``: fetch through :func:`textures.atlas_fetch_frozen`
    (custom-VJP, texels treated as constants) — set by render_fast whenever
    the atlas cannot be a differentiation target; cuts the grad program's
    per-level cond cost (see atlas_fetch_frozen's docstring).

    The returned ``color`` already includes every background contribution
    (scaled by ``bg_scale`` — pass ones when the horizon is hard).
    ``cap_drop`` marks lanes captured by the kernel whose capture slot was
    dropped by overflow (status CAPTURED while still open) — with a soft
    horizon they are still owed scaled background on top of their black.
    """
    f32 = jnp.float32
    fetch = atlas_fetch_frozen if frozen_texels else atlas_fetch
    if frozen_texels:
        # Cut the atlas out of the differentiated graph entirely: without
        # this, every level's cond transpose emits an atlas-SIZED zero
        # cotangent as a cond output (profiled: 5 x 0.58 ms of 381 MB zero
        # broadcasts per 512^2 grad on v5e).
        atlas = jax.tree_util.tree_map(jax.lax.stop_gradient, atlas)
    batch = bgu.shape
    n_slots = len(slots)
    m = sc.materials
    have_stack = tex is not None
    nm_on = have_stack and not _concrete_none_negative(m.normal_map_index)
    unit_x = jnp.array([1.0, 0.0, 0.0], f32)

    # Each lane's LAST contribution level: slot n_rec-1, or the far fold at
    # level n_rec (the residual level n_slots when every slot is taken).
    # -1 = no contributions at all (pure background lane).
    last = jnp.where(needs_far, jnp.minimum(n_rec, n_slots), n_rec - 1)

    P = dict(
        color=jnp.zeros(batch + (4,), f32),
        open=open_init,
        captured=jnp.zeros(batch, bool),
        bg_done=jnp.zeros(batch, bool),
        n_rec=n_rec,
        last=last,
        needs_far=needs_far,
        bg_hard=bg_hard,
        bg_scale=bg_scale,
        use_pos=use_pos,
        use_dir=use_dir,
        bgu=bgu,
        bgv=bgv,
    )
    if soft:
        P["cap_drop"] = cap_drop
    for k, (start, sdir, slen) in enumerate(slots):
        P[f"s{k}"] = start
        P[f"d{k}"] = sdir
        P[f"l{k}"] = slen

    def level_body(P, k):
        """One composition level over whatever rectangular domain P holds."""
        b = P["bgu"].shape
        open_ = P["open"]
        if k <= n_slots:
            if k < n_slots:
                rec = P[f"l{k}"] > 0.0
                fold = P["needs_far"] & (P["n_rec"] == k)
                start, sdir, slen = P[f"s{k}"], P[f"d{k}"], P[f"l{k}"]
            else:
                rec = jnp.zeros(b, bool)
                fold = P["needs_far"] & (P["n_rec"] >= n_slots)
                start = jnp.zeros(b + (3,), f32)
                sdir = start
                slen = jnp.zeros(b, f32)
            eff = rec | fold
            # Unrecorded lanes carry zero vectors; a zero direction sends
            # NaNs through the BACKWARD pass of intersect (0*inf through the
            # where), so substitute a harmless unit ray.  Folded lanes shoot
            # the unbounded far ray (window -1).  Recorded windows inflate
            # slightly: the kernel's f32 lambda and this recomputation
            # differ by ~1 ulp and a recorded hit must not fall off the end
            # of its own segment.
            safe_dir = jnp.where(fold[..., None], P["use_dir"],
                                 jnp.where(rec[..., None], sdir, unit_x))
            safe_start = jnp.where(fold[..., None], P["use_pos"], start)
            window = jnp.where(fold, -1.0,
                               jnp.where(rec, slen * 1.0001 + 1e-5, 1.0))
            hit = intersect_scene(safe_start, safe_dir, window, sc, r_s,
                                  test_ray=test_ray)
            regular = hit.obj_type >= 0  # texel actually consumed by shade
            mi = jnp.clip(hit.mat_idx, 0, m.color.shape[0] - 1)
            base_col = _gather(m.color, mi)
            if have_stack:
                req = texel_request(hit, sc, tex)
                texel_want = (eff & open_ & hit.valid & req.use_tex
                              & regular)
                layer = jnp.where(texel_want, req.index + 1, 0)
                fu = jnp.where(texel_want, req.u, P["bgu"])
                fv = jnp.where(texel_want, req.v, P["bgv"])
            else:
                texel_want = jnp.zeros(b, bool)
                layer = jnp.zeros(b, jnp.int32)
                fu, fv = P["bgu"], P["bgv"]
            # THE merged fetch: this lane's hit texel, or its sky texel.
            fetched = fetch(atlas, layer, fu, fv)
            base_col = jnp.where(texel_want[..., None], fetched, base_col)

            nm_rgb = None
            if nm_on:
                nm_idx = _gather(m.normal_map_index, mi)
                nm_want = eff & open_ & hit.valid & (nm_idx >= 0) & regular
                nm_sizes = _gather(
                    tex.sizes, jnp.clip(nm_idx, 0, tex.sizes.shape[0] - 1))
                nm_uv = req.uv * nm_sizes / tex.max_size
                nm_fetched = fetch(
                    atlas, jnp.where(nm_want, nm_idx + 1, 0),
                    jnp.where(nm_want, nm_uv[..., 0], 0.0),
                    jnp.where(nm_want, nm_uv[..., 1], 0.0))
                # Raw rgb in [0,1], reference-faithful (frag:408-413); lanes
                # outside nm_want carry zeros -> a zero tangent-space normal
                # through safe_normalize, masked out by take below.
                nm_rgb = jnp.where(nm_want[..., None], nm_fetched[..., :3],
                                   0.0)

            rgba = _shade_lit(hit, -safe_dir, sc, base_col, nm_rgb)
            take = eff & open_ & hit.valid
            opaque_take = take & (rgba[..., 3] == 1.0)
            color = P["color"] + jnp.where(take[..., None], rgba, 0.0)
            captured_new = opaque_take & (hit.obj_type == OBJECT_TYPE_SPECIAL)
            captured = P["captured"] | captured_new
            open_ = open_ & ~opaque_take

            # Lanes whose contributions end at this level and whose merged
            # fetch was the sky consume it NOW; textured-translucent lanes
            # (fetch was the texel) pay their sky debt at the cleanup level.
            bg_now = (open_ & (P["last"] <= k) & P["bg_hard"]
                      & ~P["bg_done"] & ~texel_want)
            if soft:
                # A fresh capture is opaque black + scaled sky on top; its
                # fetch was the sky (the horizon is never textured).
                bg_now = bg_now | (captured_new & ~texel_want
                                   & ~P["bg_done"])
            color = color + jnp.where(bg_now[..., None],
                                      fetched * P["bg_scale"], 0.0)
            return {**P, "color": color, "open": open_, "captured": captured,
                    "bg_done": P["bg_done"] | bg_now}

        # Cleanup level: pure background for everyone still owed one.
        want = open_ & P["bg_hard"] & ~P["bg_done"]
        if soft:
            want = want | ((P["captured"] | (P["cap_drop"] & open_))
                           & ~P["bg_done"])
        bg_fetched = fetch(atlas, jnp.zeros(b, jnp.int32), P["bgu"],
                           P["bgv"])
        color = P["color"] + jnp.where(want[..., None],
                                       bg_fetched * P["bg_scale"], 0.0)
        return {**P, "color": color, "bg_done": P["bg_done"] | want}

    def pending(P, k):
        """Full-frame mask of lanes level k must touch."""
        open_ = P["open"]
        bg_pend = open_ & P["bg_hard"] & ~P["bg_done"] & (P["last"] <= k)
        if k < n_slots:
            eff = (P[f"l{k}"] > 0.0) | (P["needs_far"] & (P["n_rec"] == k))
        elif k == n_slots:
            eff = P["needs_far"] & (P["n_rec"] >= n_slots)
        else:
            eff = jnp.zeros_like(open_)
            if soft:
                bg_pend = bg_pend | ((P["captured"]
                                      | (P["cap_drop"] & open_))
                                     & ~P["bg_done"])
        return (open_ & eff) | bg_pend

    # Level 0 always runs on the full frame (nearly every lane has a
    # contribution or a sky fetch there).
    P = level_body(P, 0)
    pend_counts = []

    H, W = batch
    can_tile = (compact_tiles and H % TILE_H == 0 and W % TILE_W == 0
                and H * W >= 4 * TILE_H * TILE_W)
    nth, ntw = (H // TILE_H, W // TILE_W) if can_tile else (0, 0)
    nt = nth * ntw
    # Static per-level tile capacities.  Measured on the demo scene at 512^2
    # (dense): level-1 pending = 38/256 tiles, level-2 = 6/256, deeper = 0 —
    # trailing work clusters in the disk-overlap arcs.  A level whose
    # pending tiles exceed its capacity falls back to the full frame under a
    # lax.cond (exact, just slower; unfired it costs nothing).
    mutated = ("color", "open", "captured", "bg_done")

    def level_keys(k):
        keys = ["color", "open", "captured", "bg_done", "bg_hard",
                "bg_scale", "bgu", "bgv"]
        if soft:
            keys.append("cap_drop")
        if k <= n_slots:
            keys += ["n_rec", "last", "needs_far", "use_pos", "use_dir"]
            if k < n_slots:
                keys += [f"s{k}", f"d{k}", f"l{k}"]
        return keys

    n_levels = n_slots + 2 if max_levels is None else max_levels
    for k in range(1, n_levels):
        if not can_tile:
            P = level_body(P, k)
            continue
        capt = max(nt // (4 if k == 1 else 16 if k == 2 else 32), 4)
        pend = pending(P, k)
        tpend = _tile_any(pend, nth, ntw)
        n_pend = jnp.sum(tpend.astype(jnp.int32))
        idx = jnp.nonzero(tpend, size=capt, fill_value=nt)[0]
        dom = _gather_tiles({key: P[key] for key in level_keys(k)}, idx,
                            nth, ntw)
        dom = level_body(dom, k)
        P_comp = dict(P)
        P_comp.update(_scatter_tiles(P, dom, mutated, idx, nth, ntw))

        def full_branch(P):
            # remat: the cond's AD residuals are the UNION of both branches'
            # residuals, so the (almost-never-taken) full-frame branch's
            # intersect/shade/fetch intermediates ballast every grad call —
            # profiled at ~5.2 ms per level on v5e at 512^2.  Under
            # jax.checkpoint its residuals collapse to the operand P (already
            # live) and the backward recomputes the branch only if it was
            # actually taken.
            out = jax.checkpoint(lambda q: level_body(q, k))(P)
            return tuple(out[key] for key in mutated)

        def comp_branch(P):
            return tuple(P_comp[key] for key in mutated)

        outs = jax.lax.cond(n_pend > capt, full_branch, comp_branch, P)
        pend_counts.append((n_pend, capt))
        P = dict(P)
        for key, val in zip(mutated, outs):
            P[key] = val

    if return_pend:
        return (P["color"], P["open"], P["captured"],
                jnp.asarray([c for c, _ in pend_counts]),
                tuple(c for _, c in pend_counts))
    return P["color"], P["open"], P["captured"]

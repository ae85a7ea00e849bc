"""Device-mesh parallelism: pixel-tile sharding, multihost init and gather.

The reference's only parallelism is the GPU rasterizer running the fragment
shader per pixel (one glDrawElements, main.cpp:319).  The TPU-native analog
(SURVEY.md section 2.2): shard the image H x W over a ``jax.sharding.Mesh`` of
all chips; scene/texture parameters stay replicated; XLA's SPMD partitioner
propagates the sharding through the whole jitted render (the pixel grid is an
iota — it partitions for free), inserting collectives only where needed
(e.g. psum of parameter gradients in inverse rendering).  No hand-written
transport: everything rides ICI/DCN through ``NamedSharding`` + jit.

Mesh conventions:
  * axis "x" shards image rows (the leading image axis);
  * axis "y" (optional) shards image columns;
  * for multi-host pods, rows ride the slower DCN boundary and columns stay
    intra-host so halo-free tile gathers ride ICI.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import RenderConfig
from .render import render


def initialize_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-process init (jax.distributed); no-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(devices=None, shape: Optional[tuple] = None,
              axis_names=("x", "y")) -> Mesh:
    """Build a mesh over ``devices`` (default: all).

    ``shape`` defaults to (n, 1): all devices shard image rows.  Pass e.g.
    (hosts, per_host) on a pod slice so rows split across hosts and columns
    across chips.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names[: len(shape)])


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(H, W, 4) image: rows over 'x', cols over 'y', channels replicated."""
    axes = mesh.axis_names
    spec = P(axes[0], axes[1] if len(axes) > 1 else None, None)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _img_axes(mesh: Mesh):
    """(row_axis, col_axis_or_None) names for image partitioning."""
    axes = mesh.axis_names
    return axes[0], (axes[1] if len(axes) > 1 else None)


def shard_march(mesh: Mesh, march_fn):
    """Wrap a Pallas march (``kernel.march_bh`` / ``kernel_scene.march_scene``
    partial) in ``jax.shard_map`` over the image mesh.

    Pixel tiles are embarrassingly parallel (no halos), so each device runs
    the kernel on its local (H/mx, W/my) tile — this is what makes the fast
    path scale: ``pallas_call`` does not partition under plain jit SPMD
    (VERDICT round 1), but under shard_map every device launches its own
    kernel on its shard.  The wrapped function takes
    (origin (H,W,3), direction (H,W,3), active (H,W), r_s, *replicated_args)
    and must return a pytree whose array leaves are all (H,W)- or
    (H,W,3)-shaped.
    """
    row, col = _img_axes(mesh)
    p2 = P(row, col)
    p3 = P(row, col, None)

    def specs_like(tree):
        return jax.tree.map(
            lambda x: p3 if getattr(x, "ndim", 0) == 3 else p2, tree)

    def wrapped(origin, direction, active, r_s, *rep_args):
        # out_specs must be a concrete pytree of PartitionSpecs matching the
        # output structure; derive it from the abstract output shapes.
        shapes = jax.eval_shape(march_fn, origin, direction, active, r_s,
                                *rep_args)
        inner = jax.shard_map(
            march_fn, mesh=mesh,
            in_specs=(p3, p3, p2) + (P(),) * (1 + len(rep_args)),
            out_specs=specs_like(shapes),
            # pallas_call out_shapes carry no varying-mesh-axes annotation;
            # skip the vma check (tiles are independent, nothing collective).
            check_vma=False,
        )
        return inner(origin, direction, active, r_s, *rep_args)

    return wrapped


def make_sharded_render(mesh: Mesh, cfg: RenderConfig, renderer: str = "jnp",
                        n_slots: int = 4, interpret: bool = False):
    """Jit a renderer with the output image sharded over the mesh.

    ``renderer``:
      * "jnp": the differentiable twin (``render.render``) — XLA's SPMD
        partitioner shards the whole march along image tiles;
      * "fast": the full-scene Pallas path (``kernel_scene.render_fast``) with
        the march wrapped in shard_map (each device launches the kernel on its
        local tile) and the slot shading partitioned by SPMD.

    The scene/camera/textures arrive replicated.  Image dimensions need NOT
    divide the mesh: the jnp path shards non-divisible dims natively (GSPMD
    pads internally) and the fast path pads the precomputed per-pixel planes
    up to the next multiple and crops the output (padded lanes carry rnd=0
    and inert rays; their pixels are discarded) — VERDICT r4 item 7b.
    ``interpret`` runs the Pallas kernel in interpreter mode (CPU testing).
    """
    rows = mesh.shape[mesh.axis_names[0]]
    cols = mesh.shape[mesh.axis_names[1]] if len(mesh.axis_names) > 1 else 1
    # Fast path: pad planes to tile-divisible sizes, crop after.
    pad_h = (-cfg.height) % rows
    pad_w = (-cfg.width) % cols

    out_sh = image_sharding(mesh)
    rep = replicated(mesh)

    if renderer == "jnp":
        def _render(sc, cam, background, tex, r_s):
            img = render(sc, cam, cfg, background, tex, r_s)
            if pad_h or pad_w:
                # out_shardings needs divisible dims: ship the image padded
                # (black rows/cols), crop in the wrapper below.
                import jax.numpy as jnp

                img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
            return img
    elif renderer == "fast" and cfg.texture_filter == "trilinear":
        # Trilinear LOD takes screen-space derivatives (cross-tile
        # neighbors): march rides shard_map, shading stays under the SPMD
        # partitioner, which handles the rolls with collective permutes.
        # This legacy path has no pad-and-crop: shard_map needs equal tiles.
        if pad_h or pad_w:
            raise ValueError(
                f"trilinear fast path: image {cfg.height}x{cfg.width} must "
                f"divide mesh {rows}x{cols}")
        from .kernel_scene import render_fast

        def _render(sc, cam, background, tex, r_s):
            return render_fast(sc, cam, cfg, background, tex, r_s,
                               n_slots=n_slots, interpret=interpret,
                               overflow="ignore", mesh=mesh)
    elif renderer == "fast":
        # The WHOLE fast pipeline runs tile-local inside ONE shard_map —
        # kernel launch, compacted slot passes, background composite — so
        # nothing depends on the SPMD partitioner's choices and the sparse-
        # slot compaction (a global nonzero/gather, unpartitionable) works
        # per shard.  Absolute-pixel-coordinate quantities (pixel grid,
        # rays, the noise hash) are computed OUTSIDE on the full grid; they
        # are pure iota math the partitioner shards for free.
        from . import camera as cam_mod
        from .kernel_scene import noise_field, render_fast

        row, col = _img_axes(mesh)
        p2 = P(row, col)
        p3 = P(row, col, None)

        def _core(o, d, u, v, rnd, sc, background, tex, r_s, atlas):
            return render_fast(
                sc, None, cfg, background, tex, r_s, n_slots=n_slots,
                interpret=interpret, overflow="ignore",
                precomputed=dict(origin=o, direction=d, u_ndc=u, v_ndc=v,
                                 rnd=rnd), atlas=atlas)

        def _render(sc, cam, background, tex, r_s, atlas):
            import jax.numpy as jnp

            u, v = cam_mod.pixel_grid(cfg.width, cfg.height)
            o, d = cam_mod.generate_rays(cam, u, v, cfg.width, cfg.height)
            rnd = noise_field(cfg, u, v)
            if pad_h or pad_w:
                # Grid quantities are computed on the ORIGINAL H x W grid
                # (noise hashes and crosshair math stay bit-identical to the
                # unsharded render), then padded to mesh-divisible shapes.
                # Padded lanes get rnd = 0: with noise on they are skipped;
                # with noise off they march inert unit-x rays (the safe_*
                # guards keep zero-origin rays finite) — either way their
                # pixels are cropped below.
                widths2 = ((0, pad_h), (0, pad_w))
                d0 = jnp.pad(d[..., 0], widths2, constant_values=1.0)
                o = jnp.pad(o, widths2 + ((0, 0),))
                d = jnp.pad(d, widths2 + ((0, 0),)).at[..., 0].set(d0)
                u = jnp.pad(u, widths2)
                v = jnp.pad(v, widths2)
                rnd = jnp.pad(rnd, widths2)
            inner = jax.shard_map(
                _core, mesh=mesh,
                in_specs=(p3, p3, p2, p2, p2, P(), P(), P(), P(), P()),
                out_specs=p3,
                check_vma=False,
            )
            # Padded rows/cols stay in the jit output (out_shardings needs
            # divisible dims); the wrapper crops.
            return inner(o, d, u, v, rnd, sc, background, tex, r_s, atlas)
    else:
        raise ValueError(f"unknown renderer {renderer!r}")

    # The fetch atlas rides as a REPLICATED jit argument (not a closure
    # constant, not an in-trace build): built once on the host from the
    # concrete textures at call time (identity-cached), it stays on the
    # gather fast path per shard and off the remote-compile request body
    # (see render_fast's ``atlas`` docstring).
    takes_atlas = renderer == "fast" and cfg.texture_filter != "trilinear"
    n_args = 6 if takes_atlas else 5
    fn = jax.jit(_render, in_shardings=(rep,) * n_args, out_shardings=out_sh)

    def sharded_render(sc, cam, background, tex=None, r_s=1.0):
        import jax.numpy as jnp

        args = (sc, cam, background, tex, jnp.asarray(r_s, jnp.float32))
        if takes_atlas:
            from .textures import build_atlas_cached

            args += (build_atlas_cached(background, tex),)
        img = fn(*args)
        if pad_h or pad_w:
            img = img[:cfg.height, :cfg.width]
        return img

    return sharded_render


def gather_image(img) -> np.ndarray:
    """Assemble a (possibly sharded) device image on the host.

    Single-process: device_get handles cross-device gathering.  Multi-host:
    process_allgather at the edge only (SURVEY section 5 'distributed
    communication backend')."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(img, tiled=True))
    return np.asarray(jax.device_get(img))


def frame_range_for_process(n_frames: int, process_id=None, n_processes=None):
    """Frame-parallel animation driver (SURVEY section 2.2 PP row): each host
    renders a contiguous slab of the trajectory's frames."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if n_processes is None else n_processes
    per = -(-n_frames // n)
    lo = min(pid * per, n_frames)
    hi = min(lo + per, n_frames)
    return range(lo, hi)

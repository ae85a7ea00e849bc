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


def make_sharded_render(mesh: Mesh, cfg: RenderConfig):
    """Jit the renderer with the output image sharded over the mesh.

    The scene/camera/textures arrive replicated; XLA partitions the entire
    march along image tiles.  ``cfg.height`` must divide by the row-axis size
    (and width by the column axis) so tiles are equal.
    """
    rows = mesh.shape[mesh.axis_names[0]]
    cols = mesh.shape[mesh.axis_names[1]] if len(mesh.axis_names) > 1 else 1
    if cfg.height % rows or cfg.width % cols:
        raise ValueError(
            f"image {cfg.height}x{cfg.width} not divisible by mesh {rows}x{cols}")

    out_sh = image_sharding(mesh)
    rep = replicated(mesh)

    def _render(sc, cam, background, tex, r_s):
        return render(sc, cam, cfg, background, tex, r_s)

    fn = jax.jit(
        _render,
        in_shardings=(rep, rep, rep, rep, rep),
        out_shardings=out_sh,
    )

    def sharded_render(sc, cam, background, tex=None, r_s=1.0):
        import jax.numpy as jnp

        return fn(sc, cam, background, tex, jnp.asarray(r_s, jnp.float32))

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

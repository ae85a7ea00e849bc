"""Animation driver: hyperbolic-flyby frame rendering (BASELINE config 4).

Replaces the interactive frame loop + key-H trajectory controller
(main.cpp:303-435, 404-410) with a batch renderer: the camera pose is a pure
function of frame time (camera.hyperbolic_trajectory), frames are written as
PNG files, and on a multi-host pod each host renders its own contiguous slab
of frames (frame parallelism — SURVEY section 2.2 PP row).  Killed runs are
resumable: a frame file that already exists is skipped (idempotent per-frame
outputs, SURVEY section 5 'failure detection').
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional, Sequence

import jax
import numpy as np

from . import camera as cam_mod
from .config import RenderConfig
from .metrics import FrameTimer, MetricsLogger
from .render import render, to_uint8
from .sharding import frame_range_for_process


def render_trajectory(
    sc,
    cfg: RenderConfig,
    background,
    tex=None,
    times: Optional[Sequence[float]] = None,
    n_frames: int = 60,
    initial_distance: float = 30.0,
    closest_distance: float = 10.0,
    r_s: float = 1.0,
    out_dir: Optional[str] = None,
    logger: Optional[MetricsLogger] = None,
    overwrite: bool = False,
    all_frames_local: bool = False,
    renderer: str = "jnp",
    prefetch: int = 2,
    png_compress_level: int = 1,
    measure_device_ms: bool = False,
    encode_workers: int = 2,
):
    """Render the hyperbolic flyby.

    times: normalized trajectory times in [0, 1] (default: n_frames uniform —
    the reference sweeps t in [0, 1] over HYPERBOLIC_TRAJECTORY_DURATION
    seconds, main.cpp:408-410).  Returns the list of (frame_index, image|path).

    ``renderer="fast"`` drives the Pallas full-scene kernel
    (kernel_scene.render_fast) — the production path for animation configs.

    ``prefetch`` keeps that many frames in flight ahead of the blocking host
    fetch (device compute overlaps transfer + PNG encode — the frame-loop
    analog of the reference's free-running draw calls, main.cpp:303-435);
    0 = fully serial, per-frame timings non-overlapping.

    ``png_compress_level``: zlib level for the PNG encoder (0-9).  Default 1:
    at 1080p the encode is host-CPU-bound and level 1 is several times faster
    than PIL's default 6 for ~15-30% larger files — the right trade for
    animation frames that feed a video encoder anyway.  Pass 6+ for archival
    stills.

    ``measure_device_ms``: measure pure device time per frame ONCE up front
    (dependent-chain slope, docs/tpu_cost_model.md section 5 — naive
    per-frame device timing is meaningless through the async tunnel) and
    stamp it into every frame event as ``device_ms_est``, separating the
    device / transfer+encode split in the artifact (VERDICT r4 item 5).
    Costs two extra compiles.

    ``encode_workers`` > 0 offloads PNG encoding to that many worker threads
    (PIL's zlib compress releases the GIL), so frame i's encode overlaps
    frame i+1's fetch and the device computing i+2; per-frame ``png_ms`` is
    logged as separate "png" events when the futures drain.  0 = encode
    inline in the fetch loop (the round-4 behavior).
    """
    if times is None:
        times = np.linspace(0.0, 1.0, n_frames)
    times = np.asarray(times, np.float64)
    logger = logger or MetricsLogger()
    out = []

    out_path = Path(out_dir) if out_dir else None
    # Frames headed for PNG files quantize to uint8 ON DEVICE (render.to_uint8
    # — the exact save_png conversion), so the host transfer moves 3 bytes per
    # pixel instead of 16: a 1080p frame is 6.2 MB instead of 33 MB, which is
    # the difference between the device->host link and the renderer being the
    # animation bottleneck.  Callers keeping frames in memory (out_dir=None)
    # still get the float image.
    quantize = out_path is not None

    if renderer == "fast":
        from .kernel_scene import render_fast
        from .textures import build_atlas_cached

        # Mosaic only exists on TPU; anywhere else (CPU CI, smoke runs) the
        # kernel must run under the Pallas interpreter.
        interpret = jax.default_backend() != "tpu"

        def _fast(sc, cam, background, tex, r_s, atlas):
            img = render_fast(sc, cam, cfg, background, tex, r_s,
                              overflow="ignore", interpret=interpret,
                              atlas=atlas)
            return to_uint8(img) if quantize else img

        _jit_fast = jax.jit(_fast)

        def jit_render(sc, cam, _cfg, background, tex, r_s):
            # Atlas built ONCE on the host and passed as a jit ARGUMENT:
            # background/tex are jit args here (tracers inside), so the
            # in-renderer build would trace a computed-operand gather (2.3x
            # slower) — and a closure constant this big breaks this
            # environment's remote-compile request limit (render_fast
            # docstring).
            atlas = build_atlas_cached(background, tex)
            return _jit_fast(sc, cam, background, tex, r_s, atlas)
    elif renderer == "jnp":
        if quantize:
            def _jnp(sc, cam, cfg, background, tex, r_s):
                return to_uint8(render(sc, cam, cfg, background, tex, r_s))

            jit_render = jax.jit(_jnp, static_argnames="cfg")
        else:
            jit_render = jax.jit(render, static_argnames="cfg")
    else:
        raise ValueError(f"unknown renderer {renderer!r}")
    base_cam = cam_mod.make_camera((0.0, 2.0, 15.0))

    if all_frames_local:
        frame_ids = range(len(times))
    else:
        frame_ids = frame_range_for_process(len(times))

    if out_path:
        out_path.mkdir(parents=True, exist_ok=True)

    device_ms_est = None
    if measure_device_ms:
        # Pure device time per frame, measured once (dependent-chain slope —
        # naive per-frame timing through the async tunnel is meaningless;
        # docs/tpu_cost_model.md section 5).  Uses the first frame's camera;
        # frame cost along the trajectory varies only mildly.
        import jax.numpy as jnp

        cam_m = cam_mod.hyperbolic_trajectory(
            base_cam, initial_distance, closest_distance, float(times[0]))
        if renderer == "fast":
            from .kernel_scene import render_fast as _rf
            from .textures import build_atlas_cached as _bac

            atlas_m = _bac(background, tex)
            interp_m = jax.default_backend() != "tpu"

            def one(r):
                return jnp.mean(_rf(sc, cam_m, cfg, background, tex, r,
                                    overflow="ignore", interpret=interp_m,
                                    atlas=atlas_m))
        else:
            def one(r):
                return jnp.mean(render(sc, cam_m, cfg, background, tex, r))

        def mk(chain):
            @jax.jit
            def chained(r0):
                def body(r, _):
                    return r + 1e-9 * one(r), None

                return jax.lax.scan(body, r0, None, length=chain)[0]

            return chained

        totals = {}
        for chain in (3, 9):
            fch = mk(chain)
            float(fch(np.float32(1.0)))
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                float(fch(np.float32(1.0 + 1e-5 * i)))
                best = min(best, time.perf_counter() - t0)
            totals[chain] = best
        device_ms_est = (totals[9] - totals[3]) / 6.0 * 1e3
        logger.log("device_ms_estimate", device_ms=device_ms_est,
                   method="dependent-chain slope, frame-0 camera")

    # Pipeline: dispatch up to ``prefetch`` frames ahead of the blocking host
    # fetch, so PNG encode + the device->host transfer of frame i overlap the
    # device computing frames i+1..i+prefetch (JAX dispatch is async; only
    # np.asarray blocks).  With prefetch > 0 each frame's logged ``seconds``
    # is dispatch-to-materialize LATENCY (overlapping neighbours), not
    # throughput — total wall / n_frames is the throughput; set prefetch=0
    # for non-overlapping per-frame timings.
    pending = []  # (idx, png_path_or_None, device_img, running FrameTimer)

    executor = None
    encode_futures = []
    if encode_workers and out_path:
        from concurrent.futures import ThreadPoolExecutor

        executor = ThreadPoolExecutor(max_workers=encode_workers)

    def _encode(idx_, f_, img):
        t0 = time.perf_counter()
        from PIL import Image

        # Already uint8 RGB (quantized on device).
        Image.fromarray(img).save(f_, compress_level=png_compress_level)
        return idx_, (time.perf_counter() - t0) * 1e3

    def _drain_one():
        idx_, f_, dimg, timer = pending.pop(0)
        # Host fetch as the barrier: through the axon tunnel
        # block_until_ready can return before the device finishes, but a
        # full transfer cannot.
        t0 = time.perf_counter()
        img = np.asarray(dimg)
        timer.add_fields(host_fetch_ms=(time.perf_counter() - t0) * 1e3)
        if device_ms_est is not None:
            timer.add_fields(device_ms_est=device_ms_est)
        timer.__exit__(None, None, None)
        if f_ is not None:
            if executor is not None:
                # Encode off-thread (PIL's zlib releases the GIL): overlaps
                # the next frame's fetch and the device pipeline.
                encode_futures.append(executor.submit(_encode, idx_, f_,
                                                      img))
            else:
                _, png_ms = _encode(idx_, f_, img)
                logger.log("png", frame=idx_, png_ms=png_ms)
            out.append((idx_, str(f_)))
        else:
            out.append((idx_, img))

    for idx in frame_ids:
        f = None
        if out_path:
            f = out_path / f"frame_{idx:05d}.png"
            if f.exists() and not overwrite:
                while pending:  # keep ``out`` in frame order
                    _drain_one()
                out.append((idx, str(f)))
                logger.log("frame_skipped", frame=idx)
                continue
        cam = cam_mod.hyperbolic_trajectory(
            base_cam, initial_distance, closest_distance, float(times[idx]))
        timer = FrameTimer(logger, idx, cfg.width * cfg.height, cfg.max_steps)
        timer.__enter__()
        pending.append((idx, f, jit_render(sc, cam, cfg, background, tex,
                                           r_s), timer))
        if len(pending) > max(0, prefetch):
            _drain_one()
    while pending:
        _drain_one()
    if executor is not None:
        for fut in encode_futures:
            idx_, png_ms = fut.result()
            logger.log("png", frame=idx_, png_ms=png_ms)
        executor.shutdown()
    return out


def write_video(frame_paths: Sequence[str], out_path: str, fps: int = 24,
                **writer_kw):
    """Assemble PNG frames into a video if imageio+a matching backend are
    available; otherwise raise with a clear message (frames remain usable as
    files).  GIF output works everywhere (Pillow backend); mp4 needs ffmpeg.
    ``writer_kw`` passes through to ``imageio.get_writer`` (e.g. ``loop=0``
    for an endlessly repeating GIF)."""
    try:
        import imageio.v2 as imageio
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "imageio not available; frames are on disk as PNGs") from e
    with imageio.get_writer(out_path, fps=fps, **writer_kw) as w:
        for p in frame_paths:
            w.append_data(imageio.imread(p))

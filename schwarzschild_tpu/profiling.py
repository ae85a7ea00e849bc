"""Profiling + runtime-validation utilities (SURVEY section 5: 'tracing /
profiling' and the functional analog of 'race detection / sanitizers').

The reference has neither (a 'TODO: clocks' comment, main.cpp:2, and two
mutex-guarded singletons are all it ships); here:

  * :func:`trace` wraps a region in a jax.profiler trace viewable in
    TensorBoard/XProf;
  * :func:`device_time` measures pure device time of a jitted thunk with the
    dependent-chain-slope method (robust against async dispatch queues whose
    block_until_ready returns early — see bench.py);
  * :func:`debug_mode` enables jax NaN-checking + strict rank promotion, the
    functional-world replacement for thread sanitizers;
  * :func:`validate_scene` asserts scene invariants (orthonormal frames,
    positive radii, material indices in range) before a long run.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from .scene import Scene


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(thunk, chains=(2, 8), trials=3):
    """Pure device seconds per invocation of ``thunk(r: f32 scalar) -> f32``.

    Chains data-dependent invocations inside one jit and reports the slope
    between two chain lengths, removing dispatch latency and queue effects.
    """

    def mk(chain):
        @jax.jit
        def chained(r0):
            def body(r, _):
                return r + 1e-7 * thunk(r), None

            r, _ = jax.lax.scan(body, r0, None, length=chain)
            return r

        return chained

    totals = []
    for chain in chains:
        f = mk(chain)
        float(f(jnp.float32(1.0)))  # compile
        best = float("inf")
        for i in range(trials):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-5 * i)))
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    return (totals[1] - totals[0]) / (chains[1] - chains[0])


_HOST_CALLBACKS_SUPPORTED = None


def host_callbacks_supported() -> bool:
    """Whether the default backend can run host callbacks
    (``jax.debug.print`` / ``io_callback``).

    Some PJRT plugins cannot (e.g. the tunneled axon TPU backend raises
    ``UNIMPLEMENTED: axon_pjrt does not support host send/recv callbacks``
    at RUN time, crashing whatever computation embedded the print).  Probed
    once by executing a tiny jitted debug.print and caching the outcome, so
    callers can fall back to callback-free behavior.
    """
    global _HOST_CALLBACKS_SUPPORTED
    if _HOST_CALLBACKS_SUPPORTED is None:
        try:
            jax.jit(lambda x: jax.debug.print("", ordered=False) or x)(
                jnp.float32(0.0)).block_until_ready()
            jax.effects_barrier()
            _HOST_CALLBACKS_SUPPORTED = True
        except Exception:
            _HOST_CALLBACKS_SUPPORTED = False
    return _HOST_CALLBACKS_SUPPORTED


@contextlib.contextmanager
def debug_mode():
    """NaN checking + strict rank promotion for the enclosed block."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_numpy_rank_promotion", "raise")
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
        jax.config.update("jax_numpy_rank_promotion", "allow")


def validate_scene(sc: Scene, atol=1e-4):
    """Assert scene invariants; raises ValueError with a precise message."""
    n_mat = sc.materials.color.shape[0]

    def check_axes(name, axes):
        a = np.asarray(axes)
        if a.size == 0:
            return
        gram = np.einsum("...ij,...ik->...jk", a, a)
        eye = np.eye(3)
        err = np.abs(gram - eye).max()
        if err > atol:
            raise ValueError(f"{name}: axes not orthonormal (err {err:.2e})")

    def check_mat(name, idx):
        i = np.asarray(idx)
        if i.size and (i.min() < 0 or i.max() >= n_mat):
            raise ValueError(f"{name}: material index out of range")

    check_axes("spheres", sc.spheres.axes)
    check_axes("planes", sc.planes.axes)
    check_axes("disks", sc.disks.axes)
    check_axes("hollow_disks", sc.hollow_disks.axes)
    check_axes("cylinders", sc.cylinders.axes)
    check_axes("rectangles", sc.rectangles.axes)
    check_axes("boxes", sc.boxes.face_axes)
    for name in ("spheres", "planes", "disks", "hollow_disks", "cylinders",
                 "rectangles", "boxes"):
        check_mat(name, getattr(sc, name).mat_idx)

    if np.asarray(sc.spheres.radius).size and np.asarray(sc.spheres.radius).min() <= 0:
        raise ValueError("spheres: non-positive radius")
    hd = sc.hollow_disks
    if np.asarray(hd.inner_radius).size:
        inner = np.asarray(hd.inner_radius)
        outer = np.asarray(hd.outer_radius)
        if (inner < 0).any() or (outer <= inner).any():
            raise ValueError("hollow_disks: need 0 <= inner < outer")
    return True

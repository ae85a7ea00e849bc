"""Compilation management — the closest analog of the reference's
shader_utils (loadShaderSource/compileShader, shader_utils.cpp:7-32).

XLA is the shader compiler here; these helpers give the same two affordances
the reference had: compile up front (with errors surfaced at a defined point,
not mid-frame) and reuse compiled artifacts across runs.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax


def enable_persistent_cache(directory: str = "~/.cache/schwarzschild_tpu_xla"):
    """Persist compiled executables across processes (the analog of shipping
    precompiled shader binaries)."""
    path = Path(directory).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


def aot_compile(fn, *example_args, static_argnames=None, **example_kwargs):
    """Ahead-of-time trace + lower + compile; returns (compiled, stats).

    Compile errors surface here — the moral equivalent of compileShader's
    error log — instead of on the first frame.
    """
    jitted = jax.jit(fn, static_argnames=static_argnames)
    t0 = time.perf_counter()
    lowered = jitted.lower(*example_args, **example_kwargs)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    stats = {
        "lower_seconds": t_lower,
        "compile_seconds": t_compile,
    }
    try:
        mem = compiled.memory_analysis()
        if mem is not None:
            stats["output_bytes"] = getattr(mem, "output_size_in_bytes", None)
            stats["temp_bytes"] = getattr(mem, "temp_size_in_bytes", None)
    except Exception:
        pass
    return compiled, stats

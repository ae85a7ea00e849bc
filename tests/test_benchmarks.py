"""Benchmarks as tests (SURVEY section 4 item 5, VERDICT round 1 item 5).

Two layers:
  * mechanics — the scaling harness and bench chains run end-to-end on the
    virtual CPU mesh every CI run (wall-clock numbers are meaningless there,
    only the machinery is asserted);
  * thresholds — the real-chip BASELINE numbers (>= 1e9 RK4 steps/s/chip for
    both the horizon+sky and full-scene kernels).  Running the TPU bench
    takes minutes through the axon tunnel, so the threshold test runs the
    bench subprocess only when SCHW_TPU_BENCH=1 (the round driver's
    BENCH_r{N}.json is the standing artifact); if a bench artifact is checked
    in, its numbers are asserted unconditionally.
"""

import json
import os
import pathlib
import subprocess
import sys

import jax
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_scaling_harness_mechanics():
    """The scaling harness measures every mesh size and reports efficiency
    (CPU-mesh wall clock is shared-core noise; only mechanics checked)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 (virtual) devices")
    sys.path.insert(0, str(REPO))
    from benchmarks.scaling import run

    res = run([1, 2], image_size=32)
    assert set(res) == {1, 2}
    for n, r in res.items():
        assert r["s_per_frame"] > 0
        assert r["rays_per_s"] > 0
    assert res[1]["efficiency_vs_1"] == 1.0


def test_scaling_harness_fast_renderer_mechanics():
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 (virtual) devices")
    sys.path.insert(0, str(REPO))
    from benchmarks.scaling import run

    res = run([2], image_size=32, renderer="fast", interpret=True)
    assert res[2]["rays_per_s"] > 0


def _latest_bench_artifact():
    arts = sorted(REPO.glob("BENCH_r*.json"))
    return arts[-1] if arts else None


def test_bench_thresholds():
    """BASELINE regression gate: >= 1e9 geodesic RK4 steps/s/chip.

    Asserts on the latest checked-in BENCH_r*.json artifact; with
    SCHW_TPU_BENCH=1 it instead runs bench.py live on the real chip."""
    if os.environ.get("SCHW_TPU_BENCH") == "1":
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = ""
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py")], env=env, cwd=REPO,
            capture_output=True, text=True, timeout=3000)
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        data = json.loads(line)
    else:
        art = _latest_bench_artifact()
        if art is None:
            pytest.skip("no BENCH artifact and SCHW_TPU_BENCH not set")
        data = json.loads(art.read_text())
        if isinstance(data, list):
            data = data[-1]
        data = data.get("parsed", data)  # driver artifacts wrap the line

    assert data["value"] >= 1e9, f"horizon+sky kernel regressed: {data}"
    # Budget-skipped workloads omit their keys entirely (ADVICE r2); guard
    # with .get so a skipped run skips the threshold instead of TypeError.
    if data.get("scene_steps_per_s_per_chip") is not None:
        assert data["scene_steps_per_s_per_chip"] >= 1e9, \
            f"full-scene kernel regressed: {data}"

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


def check_bench_data(data, *, gate_frame=True, gate_r5=True):
    """The regression gate proper (VERDICT r3 weak #3: a 20x frame regression
    and a budget-skipped grad workload passed CI green).  Raises
    AssertionError on any regression:

      * horizon+sky and full-scene kernels >= 1e9 RK4 steps/s/chip;
      * frame_ms_end_to_end present and <= max(2x scene march, 15 ms)
        (the reference renders 1280x720 live, main.cpp:25-26,319 — a 512^2
        dense frame slower than 15 ms is not "real-time");
      * interactive_720p_fps present and >= 30;
      * grad_512 present — the budget must never silently drop the workload
        with an explicit round target (VERDICT r3 weak #6);
      * round >= 5 (``gate_r5``): EXECUTED (not nominal) step throughput —
        future wins must come from real speed, not from marching less
        (VERDICT r4 item 1; r5 measures ~7.4e9 bh / ~2.5e9 scene executed
        lane-steps/s on v5e) — plus the grad <= 2x forward-frame ratio
        (VERDICT r4 item 3) and the 8k-atlas bytes ceiling (bf16 quadrow =
        8192*4096*4 rows*4 ch*2 B ~ 1.07 GB; 1.3e9 caps accidental f32).
    """
    assert data["value"] >= 1e9, f"horizon+sky kernel regressed: {data}"
    if gate_r5:
        ex = data.get("executed_steps_per_s")
        assert ex is not None, f"executed-step accounting missing: {data}"
        assert ex >= 3e9, f"executed-step throughput regressed: {ex:.3g}"
        sex = data.get("scene_executed_steps_per_s")
        if sex is not None:
            assert sex >= 1e9, \
                f"scene executed-step throughput regressed: {sex:.3g}"
        gr = data.get("grad_vs_forward_frame")
        if gr is not None:
            assert gr <= 2.0, \
                f"grad step is {gr:.2f}x a forward frame (target <= 2x)"
        ab = data.get("bg8k_atlas_bytes")
        if ab is not None:
            assert ab <= 1.3e9, f"8k atlas ballooned: {ab} bytes > 1.3e9"
    # Budget-skipped workloads omit their keys entirely (ADVICE r2); guard
    # with .get so a skipped run skips the threshold instead of TypeError.
    if data.get("scene_steps_per_s_per_chip") is not None:
        assert data["scene_steps_per_s_per_chip"] >= 1e9, \
            f"full-scene kernel regressed: {data}"
    if not gate_frame:
        return
    frame = data.get("frame_ms_end_to_end")
    assert frame is not None, f"frame workload skipped: {data}"
    scene = data.get("scene_march_ms_per_frame")
    limit = max(2.0 * scene, 15.0) if scene else 15.0
    assert frame <= limit, \
        f"end-to-end frame regressed: {frame:.1f} ms > {limit:.1f} ms"
    fps = data.get("interactive_720p_fps")
    assert fps is not None, f"interactive workload skipped: {data}"
    assert fps >= 30.0, f"interactive 720p regressed: {fps:.1f} fps < 30"
    assert data.get("grad_ms_512") is not None, \
        f"grad_512 skipped (budget must not drop targeted metrics): {data}"
    ge = data.get("grad_effective_steps_per_s")
    if ge is not None:
        # Round-2 item 3's throughput target; r4 measures 1.33e9 on v5e.
        assert ge >= 5e8, f"grad throughput regressed: {ge:.3g} < 5e8"
    tfps = data.get("interactive_720p_tile_fps")
    if tfps is not None:
        # The production tile-coherent interactive path; r4 measures 133.
        assert tfps >= 60.0, \
            f"tile-coherent 720p regressed: {tfps:.1f} fps < 60"


def test_gate_catches_r03_regression():
    """The r03 driver artifact (837 ms frame, 0.31 fps, grad skipped) MUST
    fail the gate — this pins the gate's teeth (VERDICT r3 item 2: 'Done = a
    rerun of r03's bench fails the suite')."""
    art = REPO / "BENCH_r03.json"
    if not art.exists():
        pytest.skip("r03 artifact not checked in")
    data = json.loads(art.read_text())
    data = data.get("parsed", data)
    with pytest.raises(AssertionError):
        check_bench_data(data, gate_r5=False)


def test_bench_thresholds():
    """BASELINE regression gate on the latest checked-in BENCH_r*.json
    artifact; with SCHW_TPU_BENCH=1 it instead runs bench.py live on the
    real chip.  Frame-level thresholds apply to artifacts from round >= 4
    (the pre-gate r03 snapshot is archival — see
    test_gate_catches_r03_regression, which asserts it WOULD fail)."""
    if os.environ.get("SCHW_TPU_BENCH") == "1":
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = ""
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py")], env=env, cwd=REPO,
            capture_output=True, text=True, timeout=3000)
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        data = json.loads(line)
        check_bench_data(data)
        return

    art = _latest_bench_artifact()
    if art is None:
        pytest.skip("no BENCH artifact and SCHW_TPU_BENCH not set")
    data = json.loads(art.read_text())
    if isinstance(data, list):
        data = data[-1]
    data = data.get("parsed", data)  # driver artifacts wrap the line
    round_no = int(art.stem.split("_r")[-1])
    check_bench_data(data, gate_frame=round_no >= 4, gate_r5=round_no >= 5)

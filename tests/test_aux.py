"""Auxiliary subsystems: metrics, profiling/validation, animation driver."""

import json

import numpy as np
import pytest

import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.animation import render_trajectory
from schwarzschild_tpu.metrics import FrameTimer, MetricsLogger
from schwarzschild_tpu.profiling import device_time, validate_scene


def test_metrics_logger_jsonl(tmp_path):
    path = tmp_path / "m.jsonl"
    log = MetricsLogger(path)
    log.log("frame", frame=0, seconds=0.5)
    with FrameTimer(log, frame=1, n_rays=100, max_steps=10) as ft:
        ft.add_fields(host_fetch_ms=1.5)
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["event"] == "frame" and lines[0]["frame"] == 0
    assert lines[1]["rk4_steps_nominal"] == 1000
    assert lines[1]["host_fetch_ms"] == 1.5
    log.to_csv(tmp_path / "m.csv")
    assert (tmp_path / "m.csv").read_text().count("\n") >= 3


def test_validate_scene_catches_bad_axes():
    sc = configs.demo_scene()
    assert validate_scene(sc)
    bad = sc._replace(spheres=sc.spheres._replace(
        axes=sc.spheres.axes * 2.0))
    with pytest.raises(ValueError, match="orthonormal"):
        validate_scene(bad)


def test_validate_scene_catches_bad_hollow_disk():
    sc = st.build_scene([st.HollowDisk(inner_radius=5.0, outer_radius=2.0)])
    with pytest.raises(ValueError, match="inner"):
        validate_scene(sc)


def test_device_time_positive():
    import jax.numpy as jnp

    t = device_time(lambda r: jnp.sum(jnp.ones((64, 64)) * r), chains=(2, 4),
                    trials=1)
    assert np.isfinite(t)


def test_render_trajectory_resumable(tmp_path):
    sc = st.empty_scene()
    cfg = st.RenderConfig(width=24, height=16, max_steps=10,
                          percent_black=-1.0, checkpoint_every=5)
    bg = st.solid_color_texture((0.3, 0.2, 0.1, 1.0))
    log = MetricsLogger()
    out = render_trajectory(sc, cfg, bg, n_frames=3, out_dir=tmp_path,
                            logger=log, all_frames_local=True)
    assert len(out) == 3
    assert all((tmp_path / f"frame_{i:05d}.png").exists() for i in range(3))
    # Second run skips all frames (idempotent).
    log2 = MetricsLogger()
    out2 = render_trajectory(sc, cfg, bg, n_frames=3, out_dir=tmp_path,
                             logger=log2, all_frames_local=True)
    assert sum(1 for r in log2.records if r["event"] == "frame_skipped") == 3


def test_import_initializes_no_backend():
    """Importing the package must not create device arrays: backend init at
    import time hangs every tool (incl. CPU-only test runs) when the TPU
    tunnel is unreachable, and robs callers of jax.config.update-based
    platform selection."""
    import subprocess
    import sys

    code = (
        "import jax, schwarzschild_tpu\n"
        "from schwarzschild_tpu import configs\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, list(xb._backends)\n"
        "print('clean')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "clean" in out.stdout


def test_render_trajectory_fast_path(tmp_path):
    """renderer="fast" works off-TPU: the driver auto-selects the Pallas
    interpreter when the backend has no Mosaic."""
    sc = st.empty_scene()
    cfg = st.RenderConfig(width=24, height=16, max_steps=10,
                          percent_black=-1.0, checkpoint_every=0)
    bg = st.solid_color_texture((0.3, 0.2, 0.1, 1.0))
    out = render_trajectory(sc, cfg, bg, n_frames=1, out_dir=tmp_path,
                            all_frames_local=True, renderer="fast")
    assert (tmp_path / "frame_00000.png").exists()
    assert len(out) == 1


def test_render_trajectory_prefetch_identical(tmp_path):
    """The prefetch pipeline changes scheduling only: frames, ordering, and
    PNG bytes match the fully-serial loop, including when skipped (resume)
    frames interleave with rendered ones."""
    sc = st.empty_scene()
    cfg = st.RenderConfig(width=24, height=16, max_steps=10,
                          percent_black=-1.0, checkpoint_every=5)
    bg = st.solid_color_texture((0.3, 0.2, 0.1, 1.0))
    a = render_trajectory(sc, cfg, bg, n_frames=4, out_dir=tmp_path / "p0",
                          all_frames_local=True, prefetch=0)
    b = render_trajectory(sc, cfg, bg, n_frames=4, out_dir=tmp_path / "p3",
                          all_frames_local=True, prefetch=3)
    assert [i for i, _ in a] == [i for i, _ in b] == [0, 1, 2, 3]
    for (_, pa), (_, pb) in zip(a, b):
        assert open(pa, "rb").read() == open(pb, "rb").read()
    # Resume with a hole: frame 1 deleted, 0/2/3 kept -> only 1 re-renders,
    # output stays in frame order.
    (tmp_path / "p3" / "frame_00001.png").unlink()
    log = MetricsLogger()
    c = render_trajectory(sc, cfg, bg, n_frames=4, out_dir=tmp_path / "p3",
                          all_frames_local=True, prefetch=3, logger=log)
    assert [i for i, _ in c] == [0, 1, 2, 3]
    assert sum(1 for r in log.records if r["event"] == "frame_skipped") == 3
    assert open(c[1][1], "rb").read() == open(a[1][1], "rb").read()


def test_write_video_gif(tmp_path):
    """GIF assembly works without ffmpeg (Pillow backend) and forwards
    writer kwargs such as loop=0 for endless repetition."""
    pytest.importorskip("imageio")
    from schwarzschild_tpu.animation import write_video

    sc = st.empty_scene()
    cfg = st.RenderConfig(width=24, height=16, max_steps=10,
                          percent_black=-1.0, checkpoint_every=5)
    bg = st.solid_color_texture((0.3, 0.2, 0.1, 1.0))
    out = render_trajectory(sc, cfg, bg, n_frames=2, out_dir=tmp_path,
                            all_frames_local=True)
    gif = tmp_path / "anim.gif"
    write_video([p for _, p in out], gif, fps=12, loop=0)
    assert gif.exists() and gif.stat().st_size > 0


def test_transform_pytree():
    from schwarzschild_tpu.geometry import make_transform

    t = make_transform((1.0, 2.0, 3.0))
    np.testing.assert_allclose(np.asarray(t.forward), [0, 0, 1])
    t2 = t.with_up_from_forward_right()
    np.testing.assert_allclose(np.asarray(t2.up), [0, 1, 0], atol=1e-6)


def test_render_trajectory_device_quantize_identical(tmp_path):
    """Frames headed for PNGs quantize to uint8 ON DEVICE (4x smaller host
    transfer); the file bytes must equal the host-side save_png conversion
    of the float frame."""
    from PIL import Image
    import jax

    sc = st.empty_scene()
    cfg = st.RenderConfig(width=24, height=16, max_steps=10,
                          percent_black=-1.0, checkpoint_every=5)
    bg = st.solid_color_texture((0.3, 0.2, 0.1, 1.0))
    out = render_trajectory(sc, cfg, bg, n_frames=1, out_dir=tmp_path,
                            all_frames_local=True)
    frames = render_trajectory(sc, cfg, bg, n_frames=1,
                               all_frames_local=True)  # float path
    ref_png = tmp_path / "ref.png"
    st.save_png(frames[0][1], ref_png)
    a = np.asarray(Image.open(out[0][1]))
    b = np.asarray(Image.open(ref_png))
    np.testing.assert_array_equal(a, b)

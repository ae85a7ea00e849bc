"""Viewer core: key decoding, camera transitions, flyby, ANSI encoder.

The interactive surface the reference exposes through GLFW callbacks
(/root/reference/src/lib/Input/input.cpp:17-53, main.cpp:352-365 mode keys,
main.cpp:404-410 key-H flyby) mapped onto pure functions — testable
without a TTY or a TPU.
"""
import numpy as np

from schwarzschild_tpu import camera as cam_mod
from schwarzschild_tpu import viewer


def test_move_keys_translate_along_camera_frame():
    s = viewer.initial_state()
    fwd = np.asarray(s.cam.forward)
    right = np.asarray(s.cam.right)
    p0 = np.asarray(s.cam.pos)
    s2 = viewer.apply_key(s, "w")
    np.testing.assert_allclose(np.asarray(s2.cam.pos),
                               p0 + viewer.MOVE_STEP * fwd, rtol=1e-6)
    s3 = viewer.apply_key(s, "d")
    np.testing.assert_allclose(np.asarray(s3.cam.pos),
                               p0 + viewer.MOVE_STEP * right, rtol=1e-6)
    # Opposite keys cancel.
    s4 = viewer.apply_key(viewer.apply_key(s, "w"), "s")
    np.testing.assert_allclose(np.asarray(s4.cam.pos), p0, atol=1e-5)


def test_arrow_keys_rotate_and_preserve_orthonormality():
    s = viewer.initial_state()
    for k in ("left", "up", "right", "right", "down", "left"):
        s = viewer.apply_key(s, k)
    axes = np.asarray(s.cam.axes)
    np.testing.assert_allclose(axes.T @ axes, np.eye(3), atol=1e-5)
    # The camera convention (make_camera: up = cross(right, forward)) is a
    # det=-1 frame; rotation must preserve that handedness, not flip it.
    det0 = float(np.linalg.det(np.asarray(viewer.initial_state().cam.axes)))
    assert abs(np.linalg.det(axes) - det0) < 1e-5


def test_mode_fov_testray_quit_keys():
    s = viewer.initial_state()
    assert viewer.apply_key(s, "3").raytrace_type == cam_mod.HALF_WIDTH
    assert viewer.apply_key(s, "1").raytrace_type == cam_mod.CURVED
    f0 = float(s.cam.fov)
    assert float(viewer.apply_key(s, "+").cam.fov) == f0 - viewer.FOV_STEP
    assert float(viewer.apply_key(s, "-").cam.fov) == f0 + viewer.FOV_STEP
    assert viewer.apply_key(s, "r").test_ray
    assert not viewer.apply_key(viewer.apply_key(s, "r"), "r").test_ray
    assert viewer.apply_key(s, "q").quit
    assert viewer.apply_key(s, "esc").quit
    # Unknown keys are no-ops.
    assert viewer.apply_key(s, "?") == s


def test_flyby_follows_trajectory_then_releases():
    s = viewer.apply_key(viewer.initial_state(), "h")
    assert s.flyby_t == 0.0
    s = viewer.advance_flyby(s, 0.5 * cam_mod.HYPERBOLIC_TRAJECTORY_DURATION)
    assert abs(s.flyby_t - 0.5) < 1e-9
    base = cam_mod.make_camera((0.0, 2.0, 15.0))
    expect = cam_mod.hyperbolic_trajectory(base, 30.0, 10.0, 0.5)
    np.testing.assert_allclose(np.asarray(s.cam.pos),
                               np.asarray(expect.pos), rtol=1e-6)
    s = viewer.advance_flyby(s, cam_mod.HYPERBOLIC_TRAJECTORY_DURATION)
    assert s.flyby_t is None
    # Any movement key also cancels the flyby (free flight resumes).
    s2 = viewer.apply_key(viewer.apply_key(viewer.initial_state(), "h"), "w")
    assert s2.flyby_t is None


def test_decode_keys_arrows_and_escape():
    assert viewer.decode_keys(b"wasd") == ["w", "a", "s", "d"]
    assert viewer.decode_keys(b"\x1b[A\x1b[B\x1b[C\x1b[D") == [
        "up", "down", "right", "left"]
    assert viewer.decode_keys(b"\x1b") == ["esc"]
    assert viewer.decode_keys(b"W") == ["w"]


def test_ansi_frame_encodes_half_blocks():
    img = np.zeros((4, 3, 4), np.float32)
    img[0] = [1.0, 0.0, 0.0, 1.0]  # top row red
    img[1] = [0.0, 0.0, 1.0, 1.0]  # second row blue
    out = viewer.ansi_frame(img, status="hud")
    assert out.startswith("\x1b[H")
    assert "\x1b[38;2;255;0;0m" in out  # red foreground (upper pixel)
    assert "\x1b[48;2;0;0;255m" in out  # blue background (lower pixel)
    assert out.count("▀") == 6  # 2 char rows x 3 cols
    assert out.rstrip().endswith("hud")
    # Run-length: a constant row emits one SGR pair, not one per cell.
    assert out.count("\x1b[38;2;255;0;0m") == 1


def test_hud_mentions_mode_and_fps():
    s = viewer.initial_state()
    line = viewer.hud(s, 10.0)
    assert "CURVED" in line and "100 FPS" in line

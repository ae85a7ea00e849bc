"""Multi-host logic tested with jax.distributed subprocesses on localhost
(SURVEY section 4 item 3)."""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n, process_id=pid)
    sys.path.insert(0, __REPO__)
    import numpy as np
    import jax.numpy as jnp
    import schwarzschild_tpu as st
    from schwarzschild_tpu import configs
    from schwarzschild_tpu.sharding import frame_range_for_process, gather_image

    assert jax.process_count() == n
    # Frame-parallel split covers all frames exactly once across processes.
    mine = list(frame_range_for_process(6))
    # Render this process's frames of a tiny flyby and report a checksum.
    cfg = st.RenderConfig(width=16, height=8, max_steps=5, percent_black=-1.0,
                          checkpoint_every=0)
    sc = st.empty_scene()
    bg = st.solid_color_texture((0.2, 0.3, 0.4, 1.0))
    total = 0.0
    for f in mine:
        cam = st.hyperbolic_trajectory(st.make_camera((0.0, 2.0, 15.0)),
                                       30.0, 10.0, f / 5.0)
        img = st.render(sc, cam, cfg, bg)
        total += float(jnp.sum(img))
    # All-reduce the checksum across processes via a psum.
    from jax.experimental import multihost_utils
    s = multihost_utils.process_allgather(jnp.float32(total))
    print("FRAMES", pid, sorted(mine), float(np.sum(np.asarray(s))), flush=True)
""")


def _run_distributed(tmp_path, n_procs):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("__REPO__", repr(str(os.getcwd()))))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # virtual-device flag breaks distributed init

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(n_procs), port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env, text=True)
        for pid in range(n_procs)
    ]
    outs = []
    for p in procs:
        try:
            # Generous: 4 workers compiling concurrently on a loaded CI box.
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    lines = [l for o in outs for l in o.splitlines() if l.startswith("FRAMES")]
    assert len(lines) == n_procs
    frames = []
    sums = set()
    for l in lines:
        parts = l.split()
        frames.extend(eval(" ".join(parts[2:-1])))
        sums.add(parts[-1])
    assert sorted(frames) == list(range(6))
    assert len(sums) == 1  # every process sees the same global checksum


@pytest.mark.skipif(os.environ.get("SCHW_SKIP_MULTIHOST") == "1",
                    reason="explicitly disabled")
def test_two_process_distributed_frame_split(tmp_path):
    _run_distributed(tmp_path, 2)


@pytest.mark.skipif(os.environ.get("SCHW_SKIP_MULTIHOST") == "1",
                    reason="explicitly disabled")
def test_four_process_distributed_frame_split(tmp_path):
    """BASELINE's host count (4); with 6 frames over 4 processes the last
    process gets ZERO frames — the allgather/frame-split edge case VERDICT
    round 1 item 8 asks for."""
    _run_distributed(tmp_path, 4)

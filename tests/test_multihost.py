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


_INVERSE_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n, process_id=pid)
    sys.path.insert(0, __REPO__)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import schwarzschild_tpu as st
    from schwarzschild_tpu.inverse import default_optimizer, init_params, realize
    from schwarzschild_tpu.render import render

    assert jax.process_count() == n
    devs = jax.devices()
    assert len(devs) == n  # one CPU device per process
    mesh = Mesh(np.array(devs), ("rows",))
    sh = NamedSharding(mesh, P("rows"))

    H, W = 16, 32
    cfg = st.RenderConfig(width=W, height=H, max_steps=5, percent_black=-1.0,
                          checkpoint_every=0)
    sc = st.empty_scene()
    bg = st.solid_color_texture((0.2, 0.3, 0.4, 1.0))

    # The TARGET is sharded across processes from process-local rows
    # (each host contributes only its own slab, as a real multi-host data
    # pipeline would).
    cam_true = st.make_camera((0.0, 1.0, 12.0))
    target_np = np.asarray(render(sc, cam_true, cfg, bg, None, 1.2))
    rows_per = H // n
    local = target_np[pid * rows_per:(pid + 1) * rows_per]
    target = jax.make_array_from_process_local_data(sh, local, (H, W, 4))

    # One inverse train step: image compute sharded by rows via a sharding
    # constraint; the replicated-parameter gradients are psum'd by the SPMD
    # partitioner (the XLA-collectives comm backend, SURVEY section 2.2).
    # The multi-process-sharded target MUST ride as a jit argument (closing
    # over a non-addressable global array is an error).
    params = init_params(st.make_camera((0.0, 1.0, 12.0)), 0.9, None, None)
    opt = default_optimizer(5e-2)
    opt_state = opt.init(params)

    import optax

    @jax.jit
    def train(params, opt_state, target):
        def loss_fn(params):
            cam, r_s, _ = realize(params, None, None)
            img = render(sc, cam, cfg, bg, None, r_s)
            img = jax.lax.with_sharding_constraint(img, sh)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, loss

    params, opt_state, loss = train(params, opt_state, target)

    leaves = np.concatenate([np.asarray(jax.device_get(x)).ravel()
                             for x in jax.tree_util.tree_leaves(params)
                             if x is not None])
    assert np.isfinite(leaves).all(), "non-finite params after train step"
    from jax.experimental import multihost_utils
    allp = np.asarray(multihost_utils.process_allgather(jnp.asarray(leaves)))
    # Every process must hold bit-identical post-step parameters.
    assert allp.shape == (n, leaves.size)
    assert (allp == allp[0]).all(), "params diverged across processes"
    print("INVERSE", pid, float(loss), float(np.sum(leaves)), flush=True)
""")


def _run_distributed_inverse(tmp_path, n_procs):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "inv_worker.py"
    script.write_text(_INVERSE_WORKER.replace("__REPO__", repr(str(os.getcwd()))))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(n_procs), port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(n_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed inverse workers timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    lines = [l for o in outs for l in o.splitlines() if l.startswith("INVERSE")]
    assert len(lines) == n_procs
    # Same loss and same parameter checksum reported by every process.
    tails = {" ".join(l.split()[2:]) for l in lines}
    assert len(tails) == 1, lines


@pytest.mark.skipif(os.environ.get("SCHW_SKIP_MULTIHOST") == "1",
                    reason="explicitly disabled")
def test_two_process_distributed_inverse_step(tmp_path):
    """One distributed inverse train step on 2 processes (VERDICT r3 item 7):
    target sharded via make_array_from_process_local_data, grads psum'd by
    the SPMD partitioner, identical finite params on every process."""
    _run_distributed_inverse(tmp_path, 2)


@pytest.mark.skipif(os.environ.get("SCHW_SKIP_MULTIHOST") == "1",
                    reason="explicitly disabled")
def test_four_process_distributed_inverse_step(tmp_path):
    """BASELINE's host count (4) for the inverse step."""
    _run_distributed_inverse(tmp_path, 4)

"""Inverse rendering: optimize black-hole mass + camera pose + disk texture
from target images (BASELINE config 5).

The reference has no optimization of any kind; this subsystem exists because
the whole framework is differentiable.  Design:

  * parameters live in an :class:`InverseParams` PyTree; the camera
    orientation is parameterized by free forward/right vectors that are
    Gram-Schmidt-orthonormalized inside the loss (no manifold drift);
  * r_s is optimized through softplus so the horizon radius stays positive;
  * the disk texture is a texel array written into its slot of the padded
    texture stack each step (differentiable bilinear gather underneath);
  * gradients ride the checkpointed march adjoint (config.checkpoint_every);
  * under a mesh, the loss is sharded over image tiles and XLA all-reduces
    parameter gradients (tested in tests/test_sharding.py);
  * checkpoint/resume via orbax (SURVEY section 5 'checkpoint/resume').
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import geometry as geo
from .camera import Camera
from .config import RenderConfig
from .render import render
from .scene import Scene
from .textures import Texture, TextureStack


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _inv_softplus(y):
    y = np.asarray(y, np.float64)
    return np.log(np.expm1(y)).astype(np.float32)


class InverseParams(NamedTuple):
    r_s_raw: jnp.ndarray  # () — softplus^-1 of the Schwarzschild radius
    cam_pos: jnp.ndarray  # (3,)
    cam_fwd_raw: jnp.ndarray  # (3,) free forward vector
    cam_right_raw: jnp.ndarray  # (3,) free right vector
    fov: jnp.ndarray  # ()
    disk_texture: Optional[jnp.ndarray]  # (Hmax, Wmax, 4) stack-slot texels


def init_params(cam: Camera, r_s: float = 1.0,
                tex: Optional[TextureStack] = None,
                disk_slot: Optional[int] = None) -> InverseParams:
    disk = None
    if tex is not None and disk_slot is not None:
        disk = tex.data[disk_slot]
    return InverseParams(
        r_s_raw=jnp.asarray(_inv_softplus(r_s)),
        cam_pos=jnp.asarray(cam.pos, jnp.float32),
        cam_fwd_raw=jnp.asarray(cam.forward, jnp.float32),
        cam_right_raw=jnp.asarray(cam.right, jnp.float32),
        fov=jnp.asarray(cam.fov, jnp.float32),
        disk_texture=disk,
    )


def realize(params: InverseParams, tex: Optional[TextureStack],
            disk_slot: Optional[int]):
    """Params -> (camera, r_s, texture stack) with orthonormalized axes."""
    f = geo.safe_normalize(params.cam_fwd_raw)
    r = geo.safe_normalize(params.cam_right_raw
                           - f * geo.dot(params.cam_right_raw, f))
    u = geo.cross(r, f)  # camera.cpp:10 convention
    cam = Camera(pos=params.cam_pos,
                 axes=jnp.stack([r, u, f], axis=-1),
                 fov=params.fov)
    r_s = _softplus(params.r_s_raw)
    if tex is not None and disk_slot is not None and params.disk_texture is not None:
        tex = tex._replace(
            data=tex.data.at[disk_slot].set(params.disk_texture))
    return cam, r_s, tex


def make_loss(sc: Scene, cfg: RenderConfig, background: Texture,
              tex: Optional[TextureStack], disk_slot: Optional[int],
              target, renderer: str = "jnp", pass_atlas: bool = False):
    """Mean-squared pixel error against ``target`` (H, W, 4).

    ``renderer="fast"`` renders through the Pallas kernel with the
    kernel-speed backward (``render_fast(differentiable=True)``); "jnp" is
    the dense differentiable twin.

    ``pass_atlas`` (fast only): the returned loss is ``loss_fn(params,
    atlas)`` and the prebuilt FetchAtlas rides as an ARGUMENT instead of
    being built at trace time inside the jit — required on the remote-
    compile tunnel, which ships closure constants in the compile request
    body (HTTP 413 past ~256 MB; the demo atlas is 381 MB).  Only valid
    when the texels are NOT being optimized (``disk_slot is None``): a
    prebuilt atlas is constant w.r.t. the parameters."""
    if renderer == "fast":
        from .kernel_scene import render_fast

        if pass_atlas and disk_slot is not None:
            raise ValueError(
                "pass_atlas requires disk_slot=None: optimizing texels "
                "needs the atlas rebuilt from the traced stack each step")

        def render_any(sc, cam, cfg, background, tex_p, r_s, atlas=None):
            return render_fast(sc, cam, cfg, background, tex_p, r_s,
                               overflow="ignore", differentiable=True,
                               atlas=atlas)
    elif renderer == "jnp":
        if pass_atlas:
            raise ValueError("pass_atlas only applies to renderer='fast'")
        render_any = lambda sc, cam, cfg, background, tex_p, r_s: render(
            sc, cam, cfg, background, tex_p, r_s)
    else:
        raise ValueError(f"unknown renderer {renderer!r}")

    if pass_atlas:
        def loss_fn(params: InverseParams, atlas):
            cam, r_s, tex_p = realize(params, tex, disk_slot)
            img = render_any(sc, cam, cfg, background, tex_p, r_s=r_s,
                             atlas=atlas)
            return jnp.mean((img - target) ** 2)
    else:
        def loss_fn(params: InverseParams):
            cam, r_s, tex_p = realize(params, tex, disk_slot)
            img = render_any(sc, cam, cfg, background, tex_p, r_s=r_s)
            return jnp.mean((img - target) ** 2)

    return loss_fn


def make_multiview_loss(sc: Scene, cfg: RenderConfig, background: Texture,
                        tex: Optional[TextureStack],
                        disk_slot: Optional[int], targets, cam_offsets,
                        renderer: str = "fast"):
    """Mean MSE over V views; view i renders from the optimized camera
    TRANSLATED by the known world-space offset ``cam_offsets[i]``.

    This is the calibrated-rig construction that breaks the monocular
    mass/distance gauge documented in INVERSE_r04 ("shadow angular size ~
    r_s/|cam|: a single view cannot separate mass from camera distance"):
    the offsets are KNOWN metric baselines (in scene units, r_s-scale), so
    the parallax between views pins |cam| absolutely and the shadow size
    then pins r_s.  Orientation and every other parameter stay shared and
    free — the rig is rigid, its pose is not.

    ``targets``: list of V (H, W, 4) images; ``cam_offsets``: list of V
    (3,) offsets (use (0,0,0) for the primary view).
    """
    if len(targets) != len(cam_offsets):
        raise ValueError("one camera offset per target view")
    if renderer == "fast":
        from .kernel_scene import render_fast

        def render_any(sc, cam, cfg, background, tex_p, r_s):
            return render_fast(sc, cam, cfg, background, tex_p, r_s,
                               overflow="ignore", differentiable=True)
    elif renderer == "jnp":
        render_any = render
    else:
        raise ValueError(f"unknown renderer {renderer!r}")

    offs = [jnp.asarray(o, jnp.float32) for o in cam_offsets]

    def loss_fn(params: InverseParams):
        cam, r_s, tex_p = realize(params, tex, disk_slot)
        total = jnp.float32(0.0)
        for tgt, off in zip(targets, offs):
            cam_i = cam._replace(pos=cam.pos + off)
            img = render_any(sc, cam_i, cfg, background, tex_p, r_s=r_s)
            total = total + jnp.mean((img - tgt) ** 2)
        return total / len(targets)

    return loss_fn


class ZeroNonfiniteState(NamedTuple):
    fired: jnp.ndarray  # () int32 — total non-finite entries zeroed so far


def zero_nonfinite() -> optax.GradientTransformation:
    """Belt-and-braces: zero non-finite gradient entries AND count them.

    The march backward is guarded to be finite everywhere — the round-1
    'TPU-only non-finite gradients' were root-caused to f32 denormal
    flush-to-zero through 1e-20 division guards and a 1e-30 safe_length eps
    (fixed in geometry.py/intersect.py/render.py; verified finite over 40
    TPU optimization steps without this transform).  This transform remains
    as an assert-and-log layer: it should never fire, and ``state.fired``
    exposes a counter so :func:`fit` can warn loudly if it ever does.
    """

    def init_fn(params):
        del params
        return ZeroNonfiniteState(fired=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        bad = jax.tree_util.tree_reduce(
            lambda acc, g: acc + (~jnp.isfinite(g)).sum(), updates,
            jnp.zeros((), jnp.int32))
        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)),
            updates)
        return updates, ZeroNonfiniteState(fired=state.fired + bad)

    return optax.GradientTransformation(init_fn, update_fn)


def nonfinite_fired(opt_state) -> int:
    """Total gradient entries the zero_nonfinite layer has zeroed (0 when
    the guards are doing their job)."""
    counts = [int(s.fired) for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, ZeroNonfiniteState))
        if isinstance(s, ZeroNonfiniteState)]
    return sum(counts)


def default_optimizer(learning_rate=2e-2,
                      decay_steps=None) -> optax.GradientTransformation:
    """Adam with non-finite-entry zeroing and global-norm clipping.

    The loss surface has visibility discontinuities and the march backward
    can emit non-finite entries on rare lanes; sanitize, then clip, then
    adam.

    ``decay_steps``: cosine-decay the learning rate to ~0 over this many
    steps (VERDICT r4 weak #4: the constant-LR r04 run oscillated 10x past
    its loss minimum for 50 steps — a decaying tail settles instead).
    """
    lr = learning_rate
    if decay_steps:
        lr = optax.cosine_decay_schedule(learning_rate, decay_steps,
                                         alpha=0.01)
    return optax.chain(
        zero_nonfinite(),
        optax.clip_by_global_norm(1.0),
        optax.adam(lr),
    )


def make_train_step(loss_fn, optimizer: optax.GradientTransformation):
    """``train_step(params, opt_state, *aux)`` — any extra positional args
    (e.g. the prebuilt atlas from make_loss(pass_atlas=True)) ride through
    to the loss as jit ARGUMENTS, not trace-time constants."""
    @jax.jit
    def train_step(params, opt_state, *aux):
        loss, grads = jax.value_and_grad(loss_fn)(params, *aux)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def fit(sc, cfg, background, tex, disk_slot, target, cam0, r_s0=0.7,
        n_steps=200, learning_rate=2e-2, checkpoint_dir=None,
        checkpoint_every=50, log_every=10, log_fn=print, renderer="jnp"):
    """Full optimization driver with orbax checkpoint/resume.

    Resumes from the latest step found in ``checkpoint_dir``; the per-step
    loss history rides inside the checkpoint tree, so the returned history
    covers ALL steps including those run before a resume.  Idempotent per
    step, so a killed run re-runs only its tail (SURVEY section 5 'failure
    detection').
    """
    params = init_params(cam0, r_s0, tex, disk_slot)
    optimizer = default_optimizer(learning_rate)
    opt_state = optimizer.init(params)
    start_step = 0
    history = []

    ckpt = _Checkpointer(checkpoint_dir) if checkpoint_dir else None
    if ckpt:
        restored = ckpt.restore_latest(
            lambda step: (params, opt_state, jnp.zeros((step,), jnp.float32)))
        if restored is not None:
            start_step, (params, opt_state, hist) = restored
            history = [float(x) for x in np.asarray(hist)]
            log_fn(f"resumed from step {start_step}")

    loss_fn = make_loss(sc, cfg, background, tex, disk_slot, target,
                        renderer=renderer)
    train_step = make_train_step(loss_fn, optimizer)

    def _tree():
        return (params, opt_state, jnp.asarray(history, jnp.float32))

    for step in range(start_step, n_steps):
        params, opt_state, loss = train_step(params, opt_state)
        history.append(float(loss))
        if log_every and step % log_every == 0:
            log_fn(f"step {step}: loss {float(loss):.6f}")
        if ckpt and checkpoint_every and (step + 1) % checkpoint_every == 0:
            ckpt.save(step + 1, _tree())
    fired = nonfinite_fired(opt_state)
    if fired:
        log_fn(f"WARNING: {fired} non-finite gradient entries were zeroed — "
               "the march backward guards should make this impossible; "
               "please report (see inverse.zero_nonfinite)")
    if ckpt:
        ckpt.save(n_steps, _tree())
    return params, history


class _Checkpointer:
    """Thin orbax wrapper: <dir>/step_<N> PyTree checkpoints."""

    def __init__(self, directory):
        import orbax.checkpoint as ocp
        from pathlib import Path

        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def save(self, step, tree):
        import orbax.checkpoint as ocp

        path = self._dir / f"step_{step:08d}"
        self._ckpt.save(path, tree, force=True)

    def restore_latest(self, template):
        """``template`` is either a PyTree or a callable step -> PyTree (for
        trees whose leaf shapes depend on the step, e.g. the loss history)."""
        steps = sorted(self._dir.glob("step_*"))
        if not steps:
            return None
        latest = steps[-1]
        step = int(latest.name.split("_")[1])
        if callable(template):
            template = template(step)
        tree = self._ckpt.restore(latest, item=template)
        return step, tree

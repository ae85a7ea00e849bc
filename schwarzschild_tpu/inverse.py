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


def _avg_pool(img, k):
    h, w, c = img.shape
    return img[: h // k * k, : w // k * k].reshape(
        h // k, k, w // k, k, c).mean(axis=(1, 3))


def gaussian_blur(img, sigma):
    """Separable Gaussian blur of an (H, W, C) image (zero-padded edges —
    shared by render and target, so the edge artifact cancels in an MSE).

    The multi-scale fitting tool (see make_multiview_loss ``blur_sigmas``):
    unlike decimation, blur keeps SUBPIXEL localization — the blurred MSE
    is minimized exactly at the true pose with a basin ~sigma pixels wide,
    while a pooled image cannot localize features better than the pool
    cell (the r5 config-5 experiments measured pooled-only phase-A fits
    stalling at ~0.5-unit position error for exactly that reason).
    """
    if sigma <= 0:
        return img
    r = int(3.0 * sigma)
    x = np.arange(-r, r + 1)
    k = np.exp(-x * x / (2.0 * sigma * sigma))
    k = jnp.asarray(k / k.sum(), jnp.float32)

    def conv_axis(a, axis):
        a2 = jnp.moveaxis(a, axis, -1)
        sh = a2.shape
        out = jax.vmap(lambda v: jnp.convolve(v, k, mode="same"))(
            a2.reshape(-1, sh[-1]))
        return jnp.moveaxis(out.reshape(sh), -1, axis)

    return conv_axis(conv_axis(img, 0), 1)


def make_multiview_loss(sc: Scene, cfg: RenderConfig, background: Texture,
                        tex: Optional[TextureStack],
                        disk_slot: Optional[int], targets, cam_offsets,
                        renderer: str = "fast", pyramid=(1,),
                        blur_sigmas=None, interpret: bool = False,
                        view_weights=None):
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

    ``blur_sigmas`` (preferred) / ``pyramid``: multi-scale loss levels.  A
    pixel-level MSE against a high-frequency background (the 2k Milky Way)
    DECORRELATES a few pixels of pose error out — the warped starfield
    matches nothing and the loss goes flat (the r04 smooth-sky lesson, now
    solved in-loss).  ``blur_sigmas=(8., 2., 0.)`` sums MSEs of
    Gaussian-blurred image pairs: each level keeps a smooth basin ~sigma
    pixels wide AND subpixel localization (see :func:`gaussian_blur` — the
    r5 experiments measured pooled levels stalling at the pool-cell
    precision limit, while blur(8)+blur(2) recovered the pose).
    ``pyramid`` (average-pool factors, e.g. (1, 4, 16)) is kept for
    comparison; ignored when ``blur_sigmas`` is given.

    ``view_weights``: optional list of V (H, W) f32 maps multiplying each
    view's squared-difference image (normalized by the weight mean, so the
    loss scale is comparable with and without).  The config-5 harness uses
    this to mask DISK-influenced pixels out of the pose objective: with the
    disk texels unknown (flat init), their mismatch against the true
    texture BIASES the pose minimum by ~0.3 world units (measured r5); a
    weight map computed by differencing two flat disk colorings at the
    current pose estimate zeroes those pixels so the pose is pinned by the
    shadow, the lensed starfield, and the planets alone.
    """
    if len(targets) != len(cam_offsets):
        raise ValueError("one camera offset per target view")
    if renderer == "fast":
        from .kernel_scene import render_fast

        def render_any(sc, cam, cfg, background, tex_p, r_s):
            return render_fast(sc, cam, cfg, background, tex_p, r_s,
                               overflow="ignore", differentiable=True,
                               interpret=interpret)
    elif renderer == "jnp":
        render_any = render
    else:
        raise ValueError(f"unknown renderer {renderer!r}")

    offs = [jnp.asarray(o, jnp.float32) for o in cam_offsets]
    if blur_sigmas is not None:
        levels = list(blur_sigmas)
        lvl_of = gaussian_blur
    else:
        levels = list(pyramid)
        lvl_of = lambda img, k: img if k == 1 else _avg_pool(img, k)
    tgt_pyr = [[lvl_of(jnp.asarray(t), k) for k in levels] for t in targets]
    if view_weights is not None:
        if len(view_weights) != len(targets):
            raise ValueError("one weight map per target view")
        wts = [jnp.asarray(w, jnp.float32)[..., None] for w in view_weights]
    else:
        wts = [None] * len(targets)

    def loss_fn(params: InverseParams):
        cam, r_s, tex_p = realize(params, tex, disk_slot)
        total = jnp.float32(0.0)
        for tgts, off, w in zip(tgt_pyr, offs, wts):
            cam_i = cam._replace(pos=cam.pos + off)
            img = render_any(sc, cam_i, cfg, background, tex_p, r_s=r_s)
            for k, tgt in zip(levels, tgts):
                d2 = (lvl_of(img, k) - tgt) ** 2
                if w is None:
                    total = total + jnp.mean(d2)
                else:
                    total = total + (jnp.mean(w * d2)
                                     / jnp.maximum(jnp.mean(w), 1e-6))
        return total / (len(targets) * len(levels))

    return loss_fn


def pack_pose(p: InverseParams) -> np.ndarray:
    """The 11 pose/mass scalars as a flat vector (r_s_raw, cam_pos,
    cam_fwd_raw, cam_right_raw, fov) — the CEM search space."""
    return np.concatenate([
        np.ravel(np.asarray(x, np.float32)) for x in
        (p.r_s_raw, p.cam_pos, p.cam_fwd_raw, p.cam_right_raw, p.fov)])


def unpack_pose(v, base: InverseParams) -> InverseParams:
    v = jnp.asarray(v, jnp.float32)
    return base._replace(r_s_raw=v[0], cam_pos=v[1:4], cam_fwd_raw=v[4:7],
                         cam_right_raw=v[7:10], fov=v[10])


# Default CEM sampling stds per packed dim: position ~0.3 world units, raw
# orientation vectors ~0.03 (a few degrees), r_s_raw ~0.3, fov ~3 deg.
CEM_DEFAULT_STD = np.array(
    [0.3, 0.3, 0.3, 0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.03, 3.0],
    np.float32)


def cem_fit_pose(loss_fn, p0: InverseParams, n_iters=40, pop=64, elite=16,
                 init_std=None, seed=0, log_fn=None):
    """Cross-entropy-method search over the 11 pose/mass dims (texels and
    every other leaf stay at ``p0``).

    Gradient descent on an image MSE — even Gaussian-blurred — proved
    FRAGILE for the joint pose+mass basin: the r5 experiments measured the
    same Adam schedule converging at one (resolution, max_steps) and
    diverging to a wrong basin (r_s 0.7 -> 0.41, position error 2x the
    init) at another.  A derivative-free population search has no such
    sensitivity: each iteration draws ``pop`` pose samples around the
    running mean, evaluates the loss on every sample IN ONE DEVICE CALL
    (``lax.map`` inside a single jit — one dispatch through the tunnel, the
    device marches pop x views frames back to back), and refits mean/std to
    the ``elite`` best.  ~40 iterations at 64^2 with a blur(8,2) loss finds
    the basin in seconds of device time; Adam then polishes within it.

    Returns (best_params, info dict).  The diagonal std is re-fit each
    iteration (x1.1 anti-collapse), so the search narrows itself; ``pop``
    evaluations per iteration make the wall cost pop/elite times a
    forward-only Adam step, all batched.
    """
    init_std = CEM_DEFAULT_STD if init_std is None else \
        np.asarray(init_std, np.float32)

    @jax.jit
    def batch_loss(V):
        return jax.lax.map(lambda v: loss_fn(unpack_pose(v, p0)), V)

    mu = pack_pose(p0)
    sig = init_std.copy()
    rng = np.random.default_rng(seed)
    best_v, best_l = mu, np.inf
    history = []
    for it in range(n_iters):
        V = mu[None] + sig[None] * rng.standard_normal(
            (pop, mu.size)).astype(np.float32)
        V[0] = mu  # elitism: the running mean always competes
        L = np.asarray(batch_loss(jnp.asarray(V)))
        L = np.where(np.isfinite(L), L, np.inf)
        idx = np.argsort(L)[:elite]
        if L[idx[0]] < best_l:
            best_l, best_v = float(L[idx[0]]), V[idx[0]].copy()
        mu = V[idx].mean(0)
        sig = V[idx].std(0) * 1.1 + 1e-5
        history.append(float(L[idx[0]]))
        if log_fn and it % 5 == 0:
            log_fn(f"cem it{it}: best {L[idx[0]]:.6f} "
                   f"sig_pos~{float(sig[1:4].mean()):.3f}")
    # The final mean is the denoised estimate; keep whichever scores better.
    final_l = float(batch_loss(jnp.asarray(mu[None]))[0])
    if final_l <= best_l:
        best_v, best_l = mu, final_l
    return unpack_pose(best_v, p0), dict(best_loss=best_l, history=history)


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

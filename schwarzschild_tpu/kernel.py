"""Pallas TPU ray-march kernel — the fused hot loop of the framework.

The jnp renderer (render.py) is the differentiable correctness twin; this
kernel is the speed path.  The per-pixel GLSL program (black_hole.frag:883-935)
marches 100 RK4 steps per ray; in the dense jnp version every step round-trips
the ~20-float ray state (plus all intersection temporaries) through HBM.  Here
the whole march runs inside one kernel invocation per pixel tile with all
state resident in VMEM, so each ray's 100 steps touch HBM exactly twice: once
to read the ray, once to write the result.

v1 scope — the "horizon + sky" workload (BASELINE config 2): event-horizon
capture, far-field flat-space rule, escape to background.  Scene-object
intersection stays on the jnp path for now.  Outputs are (final_dir, status),
and the cheap shading/bg gather happens outside in jnp — the kernel is pure
compute (SURVEY section 7 "two-phase design").

Data layout: component planes (H, W) f32 — six ray inputs, four outputs —
tiled (BLOCK_H, W) per grid step; scalars (r_s) ride SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import camera as cam_mod
from . import geometry as geo
from . import physics
from .config import RenderConfig
from .shading import CROSSHAIR_COLOR, crosshair_mask, get_background
from .textures import Texture

# Ray status codes produced by the kernel.
STATUS_MARCHING = 0.0
STATUS_CAPTURED = 1.0
STATUS_ESCAPED = 2.0

_EPS = 1e-7  # black_hole.frag:30


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _rnorm(ax, ay, az):
    return jax.lax.rsqrt(jnp.maximum(ax * ax + ay * ay + az * az, 1e-20))


def _len3(ax, ay, az):
    """sqrt-of-dot length with the kernel's 1e-20 floor.

    Kernel normalizations DIVIDE by this (v / len), never multiply by its
    reciprocal: on TPU ``v * rsqrt(s)`` double-rounds and differs from
    ``v / sqrt(s)`` in the last ulp for ~60% of operands (measured), and
    render.py — the f64-oracle-validated realization these kernels must
    match bitwise — divides.  (``rsqrt(s)`` itself IS bit-equal to
    ``1/sqrt(s)`` here, so scalar reciprocals may use either form.)
    The 1e-20 floor is inert on real lanes (render.py's 1e-24 equivalent)
    and keeps padding lanes at u <= 1e10, which the adjoint's vjp needs to
    stay finite (see kernel_scene._scene_march_bwd_kernel)."""
    return jnp.sqrt(jnp.maximum(ax * ax + ay * ay + az * az, 1e-20))


def _tangent_of(nx, ny, nz, dx, dy, dz):
    # t = normalize(cross(cross(n, d), n)) — the component expansion mirrors
    # jnp.cross exactly (a1*b2 - a2*b1, ...), NOT the algebraically equal
    # d - n (n.d): with |n| off 1 by an ulp the two forms differ by
    # ~ulp * d, which the near-photon-sphere trajectories amplify to a
    # visible pixel (PARITY_r05 root cause).  Matching render.py's
    # realization op-for-op makes the kernel march bit-equal to the
    # oracle-validated jnp twin on TPU (rsqrt == 1/sqrt and x*(1/y) == x/y
    # bitwise there — see docs/tpu_cost_model.md section 9).
    nd = _dot3(nx, ny, nz, dx, dy, dz)
    cx = ny * dz - nz * dy
    cy = nz * dx - nx * dz
    cz = nx * dy - ny * dx
    tx = cy * nz - cz * ny
    ty = cz * nx - cx * nz
    tz = cx * ny - cy * nx
    inv = _rnorm(tx, ty, tz)
    return tx * inv, ty * inv, tz * inv, nd


def _init_bh_state(ox, oy, oz, dx, dy, dz, marching):
    """Orbital-plane init (frag:865, 883-887) as a dict of arrays — shared by
    the Pallas kernel (VMEM tiles) and the jnp twin (full planes).

    Current position = ray origin; final dir starts as the camera dir.
    NOTE: loop-carried values must be f32 vectors — Mosaic cannot legalize
    scf.for with i1 vector carries, so the live mask rides as 0.0/1.0.
    """
    f32 = jnp.float32
    inv_len_o = _rnorm(ox, oy, oz)
    nx, ny, nz = ox * inv_len_o, oy * inv_len_o, oz * inv_len_o
    tx, ty, tz, nd0 = _tangent_of(nx, ny, nz, dx, dy, dz)
    u = inv_len_o
    dt0 = _dot3(tx, ty, tz, dx, dy, dz)
    du = -u * nd0 / jnp.where(jnp.abs(dt0) < 1e-12, 1e-12, dt0)
    return dict(
        px=ox, py=oy, pz=oz,
        dx=dx, dy=dy, dz=dz,
        nx=nx, ny=ny, nz=nz,
        tx=tx, ty=ty, tz=tz,
        u=u, du=du, phi=jnp.zeros_like(u),
        status=jnp.where(marching, f32(STATUS_MARCHING), f32(STATUS_ESCAPED)),
        live=marching.astype(f32),
    )


def _make_bh_body(r_s, *, max_steps: int, max_angle: float, u_f: float,
                  with_exit: bool = True):
    """Per-step horizon+sky march body(i, state) -> state; shared by the
    Pallas kernel and the differentiable jnp twin."""
    f32 = jnp.float32
    dot3 = _dot3
    rnorm = _rnorm
    tangent_of = _tangent_of

    def sphere_entry(px, py, pz, dx, dy, dz, radius):
        """First positive lambda of a sphere at the origin (frag:457-470);
        returns (hit, lam)."""
        d_oc = dot3(dx, dy, dz, px, py, pz)
        oc2 = dot3(px, py, pz, px, py, pz)
        disc = d_oc * d_oc - oc2 + radius * radius
        # Tiny positive clamp (not 0.0): sqrt'(0) = inf would NaN the replay
        # backward on miss lanes (0 * inf).
        sq = jnp.sqrt(jnp.maximum(disc, 1e-20))
        lam1 = -d_oc - sq
        lam2 = -d_oc + sq
        lam = jnp.where((lam1 > 0) & (lam2 > 0), jnp.minimum(lam1, lam2),
                        jnp.where(lam1 > 0, lam1, jnp.where(lam2 > 0, lam2, -1.0)))
        return (disc >= 0.0) & (lam >= 0.0), lam

    def body(i, s):
        live = s["live"] > 0.5

        # --- far-field flat-space approximation (frag:891-912) ---
        ff = live & (s["u"] < u_f)
        big_hit, big_lam = sphere_entry(s["px"], s["py"], s["pz"],
                                        s["dx"], s["dy"], s["dz"], 1.0 / u_f)
        hx = s["px"] + big_lam * s["dx"]
        hy = s["py"] + big_lam * s["dy"]
        hz = s["pz"] + big_lam * s["dz"]
        inv_h = rnorm(hx, hy, hz)
        nnx, nny, nnz = hx * inv_h, hy * inv_h, hz * inv_h
        nd = dot3(nnx, nny, nnz, s["dx"], s["dy"], s["dz"])
        radial = jnp.abs(nd) >= 1.0 - _EPS

        # Flat finish (no re-entry or radial): for the horizon+sky scene the
        # flat trace is one unbounded BH-sphere test.
        finish = ff & (~big_hit | radial)
        bh_hit, _ = sphere_entry(s["px"], s["py"], s["pz"],
                                 s["dx"], s["dy"], s["dz"], r_s)
        status = jnp.where(
            finish, jnp.where(bh_hit, f32(STATUS_CAPTURED), f32(STATUS_ESCAPED)),
            s["status"])
        live = live & ~finish

        reinit = ff & big_hit & ~radial
        ntx, nty, ntz, _ = tangent_of(nnx, nny, nnz, s["dx"], s["dy"], s["dz"])
        dt = dot3(ntx, nty, ntz, s["dx"], s["dy"], s["dz"])
        new_u = inv_h
        new_du = -new_u * nd / jnp.where(jnp.abs(dt) < 1e-12, 1e-12, dt)

        def sel(m, a, b):
            return jnp.where(m, a, b)

        nx = sel(reinit, nnx, s["nx"])
        ny = sel(reinit, nny, s["ny"])
        nz = sel(reinit, nnz, s["nz"])
        tx = sel(reinit, ntx, s["tx"])
        ty = sel(reinit, nty, s["ty"])
        tz = sel(reinit, ntz, s["tz"])
        u0 = sel(reinit, new_u, s["u"])
        du0 = sel(reinit, new_du, s["du"])

        # --- RK4 step (frag:914-919) ---
        step = (max_angle - s["phi"]) / (max_steps - i).astype(f32)
        phi = s["phi"] + step
        d_u, d_du = physics.rk4_step(u0, du0, step, r_s)
        u1 = u0 + d_u
        du1 = du0 + d_du

        escaped = live & (u1 < 0.0)
        status = jnp.where(escaped, f32(STATUS_ESCAPED), status)
        live = live & ~escaped

        # --- reconstruct segment (frag:924-928) ---
        # r clamped to 1e6 (see render.py: overflow guard far past u_f).
        u_rec = jnp.maximum(u1, 1e-6)
        inv_u = 1.0 / u_rec
        npx = (jnp.cos(phi) * nx + jnp.sin(phi) * tx) * inv_u
        npy = (jnp.cos(phi) * ny + jnp.sin(phi) * ty) * inv_u
        npz = (jnp.cos(phi) * nz + jnp.sin(phi) * tz) * inv_u
        ddx = npx - s["px"]
        ddy = npy - s["py"]
        ddz = npz - s["pz"]
        # seg_len as a direct sqrt (render.py's safe_length — the capture
        # test cap_lam <= seg_len sits on its exact value, and 1/rsqrt
        # double-rounds); the direction via rsqrt-mult (the canonical form
        # every normalization uses — see geo.safe_normalize).
        seg_len = _len3(ddx, ddy, ddz)
        inv_seg = rnorm(ddx, ddy, ddz)
        sdx, sdy, sdz = ddx * inv_seg, ddy * inv_seg, ddz * inv_seg

        # Horizon capture along the segment (frag:757-758 as a scene sphere).
        cap_hit, cap_lam = sphere_entry(s["px"], s["py"], s["pz"],
                                        sdx, sdy, sdz, r_s)
        captured = live & cap_hit & (cap_lam <= seg_len)
        status = jnp.where(captured, f32(STATUS_CAPTURED), status)
        live = live & ~captured

        moved = live | captured
        return dict(
            px=sel(moved, npx, s["px"]),
            py=sel(moved, npy, s["py"]),
            pz=sel(moved, npz, s["pz"]),
            # Escaped rays keep the pre-step dir (frag:921-922 breaks before
            # reconstruction); captured/alive rays take the segment dir.
            dx=sel(moved, sdx, s["dx"]),
            dy=sel(moved, sdy, s["dy"]),
            dz=sel(moved, sdz, s["dz"]),
            nx=nx, ny=ny, nz=nz, tx=tx, ty=ty, tz=tz,
            u=sel(moved, u1, u0), du=sel(moved, du1, du0), phi=sel(moved, phi, s["phi"]),
            status=status, live=live.astype(f32),
        )

    if not with_exit:
        return body

    def body_with_exit(i, s):
        # Early tile exit (see kernel_scene._make_march_body): the body is
        # exactly the identity once every lane is done.
        return jax.lax.cond(jnp.any(s["live"] > 0.5), body,
                            lambda i, s: dict(s), i, s)

    return body_with_exit


def _bh_final(state):
    """Final state -> (fdx, fdy, fdz, status).  Exhausted marchers escape to
    the background (frag:935)."""
    final_status = jnp.where(state["live"] > 0.5,
                             jnp.float32(STATUS_ESCAPED), state["status"])
    return state["dx"], state["dy"], state["dz"], final_status


def _march_kernel(rs_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  act_ref, fdx_ref, fdy_ref, fdz_ref, st_ref, *rest,
                  max_steps: int, max_angle: float, u_f: float,
                  count_steps: bool = False):
    """One pixel tile: march every lane to capture/escape.

    All refs are (BLOCK_H, W) f32 except rs_ref (1, 1) SMEM.  With
    ``count_steps`` a fifth output plane receives the number of loop
    iterations the TILE executed (the death-terminating while_loop's exit
    counter, broadcast over the tile) — the honest-throughput receipt
    (VERDICT r4 weak #1): nominal steps/s counts H*W*max_steps against the
    100-step budget (frag:914-915) while the loop stops a tile the moment
    its last lane finishes, so ALU throughput must be accounted against
    sum(tile_steps * lanes), not the budget.
    """
    r_s = rs_ref[0, 0]
    state = _init_bh_state(ox_ref[:], oy_ref[:], oz_ref[:],
                           dx_ref[:], dy_ref[:], dz_ref[:],
                           act_ref[:] > 0.5)
    body = _make_bh_body(r_s, max_steps=max_steps, max_angle=max_angle,
                         u_f=u_f, with_exit=False)

    # Death-terminating march (see kernel_scene._scene_march_kernel): the
    # loop condition fuses the step bound with the any-live check, so the
    # tile stops paying the moment its last lane finishes — subsuming both
    # the whole-march skip for dead-at-entry tiles and the per-step cond
    # (whose any() reduction + branch cost ~2/3 of a bh step).
    def march_cond(carry):
        i, s = carry
        return (i < max_steps) & jnp.any(s["live"] > 0.5)

    def march_step(carry):
        i, s = carry
        return i + 1, body(i, s)

    n_exec, state = jax.lax.while_loop(march_cond, march_step,
                                       (jnp.int32(0), state))
    fdx, fdy, fdz, final_status = _bh_final(state)
    fdx_ref[:] = fdx
    fdy_ref[:] = fdy
    fdz_ref[:] = fdz
    st_ref[:] = final_status
    if count_steps:
        rest[0][:] = jnp.full(fdx.shape, n_exec.astype(jnp.float32))


def compact_march(march_fn, origin, direction, active):
    """Run a march with active rays PACKED into the leading rows.

    The noise mask (percent_black=0.75) scatters inactive lanes uniformly, so
    no tile is ever fully dead and the kernels' early tile exit never fires.
    Packing actives first (stable O(n) cumsum permutation, no sort) leaves
    ~75% of tiles fully inactive — their per-step bodies reduce to the
    skipped lax.cond branch.  Per-ray results are bit-identical; only the
    layout the kernel sees changes.

    MEASURED TRADE-OFF (512x512, v5e): the arbitrary-permutation
    scatter/gather costs ~4 ms — more than the 2.4 ms full march it tries to
    save — so this LOSES at max_steps=100 and is NOT enabled by the
    renderers.  It wins only when march cost per ray dwarfs data movement
    (much larger max_steps or far sparser masks); kept as an explicit opt-in
    with a bit-equality test.

    ``march_fn(origin, direction, active)`` must map (H, W)-shaped per-ray
    inputs to a pytree of (H, W[, 3]) per-ray outputs.
    """
    H, W = active.shape
    n = H * W
    a = active.reshape(n)
    n_active = jnp.sum(a.astype(jnp.int32))
    pos_active = jnp.cumsum(a.astype(jnp.int32)) - 1
    pos_inactive = n_active + jnp.cumsum((~a).astype(jnp.int32)) - 1
    pos = jnp.where(a, pos_active, pos_inactive)  # ray i -> packed slot pos[i]

    def pack(x):
        flat = x.reshape((n,) + x.shape[2:])
        return jnp.zeros_like(flat).at[pos].set(flat).reshape(x.shape)

    def unpack(x):
        flat = x.reshape((n,) + x.shape[2:])
        return flat[pos].reshape(x.shape)

    out = march_fn(pack(origin), pack(direction), pack(active))
    return jax.tree.map(unpack, out)


def march_bh(origin, direction, active, r_s, cfg: RenderConfig,
             block_h: int = 8, block_w: int = 128, interpret: bool = False,
             mesh=None, compact: bool = False, count_steps: bool = False):
    """Run the Pallas march over (H, W) rays.

    origin/direction: (H, W, 3); active: (H, W) bool (lanes to march).
    Returns (final_dir (H, W, 3), status (H, W) f32); with
    ``count_steps=True`` additionally a scalar f32 — the total EXECUTED
    lane-steps: sum over tiles of (while-loop iterations x lanes/tile).
    Dividing by march time gives real ALU-step throughput, vs the nominal
    H*W*max_steps workload number (VERDICT r4 weak #1).  Padding tiles are
    dead at entry and contribute 0; padded lanes inside a live tile DO
    count (they occupy VPU lanes for every step the tile runs).

    Blocks are one native (8, 128) f32 tile by default: the march carries
    ~18 vector values through its scf.for, and every extra tile per block
    multiplies the loop-carried register count (Mosaic compile time explodes
    beyond a few dozen).

    ``mesh``: a ``jax.sharding.Mesh`` to shard the march over image tiles via
    shard_map (each device launches the kernel on its local tile; r_s and all
    shapes replicated).  None = single-device.

    ``compact``: pack active rays into leading rows first (see
    :func:`compact_march`) — a large win for sparse noise masks.  Under a
    mesh, compaction runs per-shard (each device packs its own tile).
    """
    if count_steps and (mesh is not None or compact):
        raise ValueError("count_steps: single-device, non-compact marches "
                         "only (it is a benchmark accounting hook)")
    if mesh is not None:
        from .sharding import shard_march

        fn = functools.partial(march_bh, cfg=cfg, block_h=block_h,
                               block_w=block_w, interpret=interpret,
                               compact=compact)
        return shard_march(mesh, fn)(origin, direction, active, r_s)
    if compact:
        return compact_march(
            lambda o, d, a: march_bh(o, d, a, r_s, cfg, block_h=block_h,
                                     block_w=block_w, interpret=interpret),
            origin, direction, active)
    H, W = active.shape
    pad_h = (-H) % block_h
    pad_w = (-W) % block_w

    def pad(x):
        return jnp.pad(x, ((0, pad_h), (0, pad_w)))

    comps = [pad(origin[..., i]) for i in range(3)]
    comps += [pad(direction[..., i]) for i in range(3)]
    comps += [pad(active.astype(jnp.float32))]
    ph, pw = comps[0].shape

    grid = (ph // block_h, pw // block_w)
    tile = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec(memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _march_kernel,
        max_steps=cfg.max_steps,
        max_angle=float(cfg.max_angle),
        u_f=float(cfg.u_f),
        count_steps=count_steps,
    )
    n_out = 5 if count_steps else 4
    out_shape = [jax.ShapeDtypeStruct((ph, pw), jnp.float32)] * n_out
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[scalar] + [tile] * 7,
        out_specs=[tile] * n_out,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(r_s, jnp.float32).reshape(1, 1), *comps)
    fdx, fdy, fdz, status = outs[:4]

    final_dir = jnp.stack([fdx[:H, :W], fdy[:H, :W], fdz[:H, :W]], axis=-1)
    if count_steps:
        # Every lane of a tile carries that tile's iteration count, so the
        # plane's sum IS sum(tile_steps * lanes) — including padded lanes.
        return final_dir, status[:H, :W], jnp.sum(outs[4])
    return final_dir, status[:H, :W]


def march_bh_jnp(origin, direction, active, r_s, cfg: RenderConfig,
                 checkpoint_every=None):
    """Dense-jnp twin of the horizon+sky march — identical math/outputs.

    Serves as the checkpointed BACKWARD replay of :func:`march_bh_diff` and
    as a correctness oracle for the kernel."""
    f32 = jnp.float32
    state = _init_bh_state(
        origin[..., 0], origin[..., 1], origin[..., 2],
        direction[..., 0], direction[..., 1], direction[..., 2], active)
    body = _make_bh_body(jnp.asarray(r_s, f32), max_steps=cfg.max_steps,
                         max_angle=float(cfg.max_angle), u_f=float(cfg.u_f))
    steps = jnp.arange(cfg.max_steps, dtype=jnp.int32)

    def step_fn(s, i):
        return body(i, s), None

    ck = cfg.checkpoint_every if checkpoint_every is None else checkpoint_every
    if ck and ck < cfg.max_steps:
        if cfg.max_steps % ck:
            raise ValueError(
                f"checkpoint_every={ck} must divide max_steps={cfg.max_steps}")

        def chunk_fn(s, idx):
            out, _ = jax.lax.scan(step_fn, s, idx)
            return out, None

        state, _ = jax.lax.scan(jax.checkpoint(chunk_fn), state,
                                steps.reshape(-1, ck))
    else:
        state, _ = jax.lax.scan(step_fn, state, steps)
    fdx, fdy, fdz, status = _bh_final(state)
    return jnp.stack([fdx, fdy, fdz], axis=-1), status


def march_bh_diff(origin, direction, active, r_s, cfg: RenderConfig,
                  interpret: bool = False, mesh=None, compact: bool = False):
    """Differentiable horizon+sky march: Pallas forward, checkpointed jnp
    replay backward (gradients to origin/direction/r_s at fixed discrete
    capture/escape decisions)."""

    @jax.custom_vjp
    def f(origin, direction, r_s):
        return march_bh(origin, direction, active, r_s, cfg,
                        interpret=interpret, mesh=mesh, compact=compact)

    def fwd(origin, direction, r_s):
        return f(origin, direction, r_s), (origin, direction, r_s)

    def bwd(residuals, cotangent):
        origin, direction, r_s = residuals

        def g(origin, direction, r_s):
            return march_bh_jnp(origin, direction, active, r_s, cfg)

        _, vjp = jax.vjp(g, origin, direction, jnp.asarray(r_s, jnp.float32))
        return vjp(cotangent)

    f.defvjp(fwd, bwd)
    return f(origin, direction, jnp.asarray(r_s, jnp.float32))


def render_horizon_sky(cam, cfg: RenderConfig, background: Texture, r_s=1.0,
                       interpret: bool = False, mesh=None,
                       differentiable: bool = False):
    """Config-2 fast path: empty scene (horizon + equirect sky) rendered by
    the Pallas kernel + one jnp background gather.

    Matches render(empty_scene(), ...) — tested in tests/test_kernel.py.
    ``mesh`` shards the march over image tiles (see :func:`march_bh`);
    ``differentiable`` routes through :func:`march_bh_diff` (kernel forward,
    checkpointed replay backward).
    """
    f32 = jnp.float32
    r_s = jnp.asarray(r_s, f32)
    H, W = cfg.height, cfg.width
    trilinear = cfg.texture_filter == "trilinear"
    if trilinear and not background.mips:
        from .textures import build_mips

        background = background._replace(mips=build_mips(background.data))

    u_ndc, v_ndc = cam_mod.pixel_grid(W, H)
    origin, direction = cam_mod.generate_rays(cam, u_ndc, v_ndc, W, H)
    batch = u_ndc.shape

    base = jnp.zeros(batch + (4,), f32)
    if cfg.crosshair:
        ch = crosshair_mask(u_ndc, v_ndc, W, H)
        base = jnp.where(ch[..., None], jnp.array(CROSSHAIR_COLOR, f32), base)

    if cfg.raytrace_type == cam_mod.FLAT:
        mode_flat = jnp.ones(batch, bool)
    elif cfg.raytrace_type == cam_mod.HALF_WIDTH:
        mode_flat = u_ndc > 2.0 * cfg.curved_percentage - 1.0
    elif cfg.raytrace_type == cam_mod.HALF_HEIGHT:
        mode_flat = v_ndc > 2.0 * cfg.curved_percentage - 1.0
    else:
        mode_flat = jnp.zeros(batch, bool)

    normal_vec0 = geo.safe_normalize(origin)
    flat_px = mode_flat | physics.is_radial(direction, normal_vec0)

    uv_vec = jnp.stack([u_ndc, v_ndc * (H / W)], axis=-1)
    if cfg.percent_black >= 0.0 and cfg.noise_mode != "none":
        from .render import glsl_rand, pixel_hash_rand, tile_hash_rand

        if cfg.noise_mode == "glsl":
            rnd = glsl_rand(uv_vec)
        elif cfg.noise_mode == "hash":
            rnd = pixel_hash_rand(W, H, cfg.noise_seed)
        elif cfg.noise_mode == "tile":
            rnd = tile_hash_rand(W, H, cfg.noise_seed, cfg.noise_tile)
        else:
            rnd = jax.random.uniform(jax.random.key(cfg.noise_seed), batch)
        noise_skip = ~flat_px & (rnd <= f32(cfg.percent_black))
    else:
        noise_skip = jnp.zeros(batch, bool)

    march_px = ~flat_px & ~noise_skip
    march = march_bh_diff if differentiable else march_bh
    final_dir, status = march(origin, direction, march_px, r_s, cfg,
                              interpret=interpret, mesh=mesh)

    # Flat pixels: one BH-sphere test + bg (frag:874-877).
    d_oc = geo.dot(direction, origin)
    disc = d_oc * d_oc - geo.square_vector(origin) + r_s * r_s
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    lam1, lam2 = -d_oc - sq, -d_oc + sq
    lam = geo.min_positive(lam1, lam2)
    flat_bh = (disc >= 0.0) & (lam >= 0.0)

    captured = jnp.where(flat_px, flat_bh, status == STATUS_CAPTURED)
    use_dir = jnp.where(flat_px[..., None], direction, final_dir)
    bg = get_background(background, use_dir, trilinear=trilinear)
    black = jnp.array([0.0, 0.0, 0.0, 1.0], f32)

    if cfg.horizon_softness > 0.0:
        # Soft shadow silhouette (identical to render.py:297-329): with an
        # empty scene every non-skipped pixel is either captured (hard black)
        # or background, and ALL of them add bg scaled by 1 - sigmoid of the
        # photon impact parameter vs b_crit = 3*sqrt(3)/2 r_s.
        s_soft = jnp.float32(cfg.horizon_softness)
        tangent_vec0 = geo.safe_normalize(
            geo.cross(geo.cross(normal_vec0, direction), normal_vec0))
        u0 = 1.0 / geo.length(origin)
        dt0 = geo.dot(direction, tangent_vec0)
        dt0 = jnp.where(jnp.abs(dt0) < 1e-12, 1e-12, dt0)
        du0 = -u0 * geo.dot(direction, normal_vec0) / dt0
        e0 = du0 * du0 + u0 * u0 * (1.0 - r_s * u0)
        b_geo = 1.0 / jnp.sqrt(jnp.maximum(e0, 1e-20))
        b_crit = jnp.float32(1.5 * jnp.sqrt(3.0)) * r_s
        b_flat = geo.safe_length(geo.cross(origin, direction))
        alpha_curved = jax.nn.sigmoid((b_crit - b_geo) / s_soft)
        alpha_flat = jax.nn.sigmoid((r_s - b_flat) / s_soft)
        alpha_sh = jnp.where(flat_px, alpha_flat, alpha_curved)
        bg_scale = (1.0 - alpha_sh)[..., None]
        color = jnp.where(
            noise_skip[..., None], jnp.zeros((4,), f32),
            jnp.where(captured[..., None], black, 0.0) + bg * bg_scale)
    else:
        color = jnp.where(
            noise_skip[..., None], jnp.zeros((4,), f32),
            jnp.where(captured[..., None], black, bg))
    return base + color

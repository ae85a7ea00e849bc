"""Real-Mosaic kernel parity on TPU: compiled Pallas kernels vs the jnp
renderer, demo scene + horizon/sky, plus gradient finiteness of the
kernel-speed backward. Writes TPU_PARITY_r02.json.

Everything is jax.jit-wrapped: un-jitted execution through the ~40ms-RTT
axon tunnel dispatches op-by-op and never finishes."""
import json
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.kernel import render_horizon_sky
from schwarzschild_tpu.kernel_scene import render_fast


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


log(f"devices: {jax.devices()}")
assert jax.devices()[0].platform == "tpu", f"not on TPU: {jax.devices()}"
out = {"round": 2, "device": str(jax.devices()[0]),
       "metric": "parity of COMPILED (Mosaic) kernels vs jnp renderer, computed on-chip",
       "results": {}}


def dump():
    with open("/root/repo/TPU_PARITY_r02.json", "w") as f:
        json.dump(out, f, indent=2)


sc = configs.demo_scene()
cam = configs.demo_camera()
bg = configs.background_texture()
tex = configs.demo_texture_stack()

render_j = jax.jit(st.render, static_argnames="cfg")
fast_j = jax.jit(functools.partial(render_fast, overflow="ignore"),
                 static_argnames="cfg")

for name, W, H in [("demo_256", 256, 256), ("demo_512", 512, 512)]:
    cfg = st.RenderConfig(width=W, height=H, percent_black=-1.0)
    t0 = time.time()
    ref = np.asarray(render_j(sc, cam, cfg, bg, tex, 1.0))
    log(f"{name} jnp done ({time.time()-t0:.1f}s)")
    t0 = time.time()
    fast = np.asarray(fast_j(sc, cam, cfg, bg, tex, 1.0))
    log(f"{name} fast done ({time.time()-t0:.1f}s)")
    d = np.abs(ref - fast).max(-1)
    out["results"][f"full_scene_{name}"] = {
        "max_abs_diff": float(d.max()),
        "frac_within_2e-3": float((d < 2e-3).mean()),
        "finite": bool(np.isfinite(fast).all()),
    }
    log(f"{name}: max {d.max():.3g}, frac<2e-3 {(d < 2e-3).mean():.5f}")
    dump()

# horizon+sky kernel on the empty scene
cfg = st.RenderConfig(width=256, height=256, percent_black=-1.0)
ref = np.asarray(render_j(st.empty_scene(), cam, cfg, bg, None, 1.0))
hs = np.asarray(jax.jit(render_horizon_sky, static_argnames="cfg")(cam, cfg, bg))
d = np.abs(ref - hs).max(-1)
out["results"]["horizon_sky_256"] = {
    "max_abs_diff": float(d.max()),
    "frac_within_2e-3": float((d < 2e-3).mean()),
    "finite": bool(np.isfinite(hs).all()),
}
log(f"horizon_sky: max {d.max():.3g}, frac<2e-3 {(d < 2e-3).mean():.5f}")
dump()

# kernel-speed backward on-chip: gradient finiteness + agreement with the
# dense twin's gradient
cfg = st.RenderConfig(width=128, height=128, percent_black=-1.0,
                      horizon_softness=0.15)
target = render_j(sc, cam, cfg, bg, tex, 1.0)


def loss_fast(r_s):
    img = render_fast(sc, cam, cfg, bg, tex, r_s, overflow="ignore",
                      differentiable=True)
    return jnp.mean((img - target) ** 2)


def loss_jnp(r_s):
    return jnp.mean((st.render(sc, cam, cfg, bg, tex, r_s) - target) ** 2)


t0 = time.time()
gf = float(jax.jit(jax.grad(loss_fast))(jnp.float32(0.9)))
log(f"fast grad done ({time.time()-t0:.1f}s)")
t0 = time.time()
gj = float(jax.jit(jax.grad(loss_jnp))(jnp.float32(0.9)))
log(f"jnp grad done ({time.time()-t0:.1f}s)")
out["results"]["grad_r_s_at_0p9"] = {
    "kernel_backward": gf, "jnp_backward": gj,
    "rel_diff": abs(gf - gj) / max(abs(gj), 1e-12),
    "finite": bool(np.isfinite(gf) and np.isfinite(gj)),
}
log(f"grad fast {gf:.6g} vs jnp {gj:.6g}")
dump()
log("wrote TPU_PARITY_r02.json")

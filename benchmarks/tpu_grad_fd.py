"""Self-consistent gradient check ON TPU: AD vs central FD for BOTH the
kernel-speed backward (render_fast differentiable=True) and the jnp twin,
on the same MSE loss used in tpu_parity.py.  Distinguishes 'fast backward
is wrong on TPU' from 'the two forwards differ at silhouettes so their
gradients legitimately differ'.  Appends to TPU_PARITY_r02.json."""
import json
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.kernel_scene import render_fast


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


log(f"devices: {jax.devices()}")
assert jax.devices()[0].platform == "tpu", f"not on TPU: {jax.devices()}"

sc = configs.demo_scene()
cam = configs.demo_camera()
bg = configs.background_texture()
tex = configs.demo_texture_stack()
cfg = st.RenderConfig(width=128, height=128, percent_black=-1.0,
                      horizon_softness=0.15)

render_j = jax.jit(st.render, static_argnames="cfg")
target = render_j(sc, cam, cfg, bg, tex, 1.0)
target.block_until_ready()
log("target rendered")


def loss_fast(r_s):
    img = render_fast(sc, cam, cfg, bg, tex, r_s, overflow="ignore",
                      differentiable=True)
    return jnp.mean((img - target) ** 2)


def loss_jnp(r_s):
    return jnp.mean((st.render(sc, cam, cfg, bg, tex, r_s) - target) ** 2)


lf = jax.jit(loss_fast)
lj = jax.jit(loss_jnp)
gf = jax.jit(jax.grad(loss_fast))
gj = jax.jit(jax.grad(loss_jnp))

res = {}
for name, l, g in [("fast", lf, gf), ("jnp", lj, gj)]:
    t0 = time.time()
    ad = float(g(jnp.float32(0.9)))
    log(f"{name} AD = {ad:.6g} ({time.time()-t0:.1f}s)")
    fds = {}
    for eps in (0.01, 0.004):
        lp = float(l(jnp.float32(0.9 + eps)))
        lm = float(l(jnp.float32(0.9 - eps)))
        fds[eps] = (lp - lm) / (2 * eps)
        log(f"{name} FD(eps={eps}) = {fds[eps]:.6g}")
    res[name] = {"ad": ad, "fd": {str(k): v for k, v in fds.items()}}

# Also: AD of each forward at a LINEAR loss (removes the target coupling).
w = jnp.asarray(np.random.RandomState(0).rand(128, 128, 4), jnp.float32)
lin_f = jax.jit(lambda r: jnp.sum(render_fast(
    sc, cam, cfg, bg, tex, r, overflow="ignore", differentiable=True) * w))
lin_j = jax.jit(lambda r: jnp.sum(st.render(sc, cam, cfg, bg, tex, r) * w))
glf = float(jax.jit(jax.grad(lambda r: jnp.sum(render_fast(
    sc, cam, cfg, bg, tex, r, overflow="ignore", differentiable=True) * w)))(
        jnp.float32(0.9)))
glj = float(jax.jit(jax.grad(lambda r: jnp.sum(st.render(
    sc, cam, cfg, bg, tex, r) * w)))(jnp.float32(0.9)))
fd_lin_f = (float(lin_f(jnp.float32(0.905))) - float(lin_f(jnp.float32(0.895)))) / 0.01
fd_lin_j = (float(lin_j(jnp.float32(0.905))) - float(lin_j(jnp.float32(0.895)))) / 0.01
res["linear_loss"] = {"fast_ad": glf, "fast_fd": fd_lin_f,
                      "jnp_ad": glj, "jnp_fd": fd_lin_j}
log(f"linear: fast AD {glf:.6g} FD {fd_lin_f:.6g} | jnp AD {glj:.6g} FD {fd_lin_j:.6g}")

with open("/root/repo/TPU_PARITY_r02.json") as f:
    out = json.load(f)
out["results"]["grad_fd_selfcheck"] = res
with open("/root/repo/TPU_PARITY_r02.json", "w") as f:
    json.dump(out, f, indent=2)
log("appended grad_fd_selfcheck")

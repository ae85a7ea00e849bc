"""Break down the 512^2 gradient step (VERDICT r4 item 3: grad <= 2x forward).

Measures, via the dependent-chain slope (docs/tpu_cost_model.md section 5):
  * fwd_frame       — render_fast forward (the 2x target's denominator);
  * march_fwd       — Pallas scene march alone;
  * march_grad      — grad of sum(march outputs) through march_scene_diff
                      (adjoint kernel cost = march_grad - march_fwd);
  * full_grad       — grad of the full render_fast loss (slot-pass VJP cost
                      = full_grad - march_grad - (fwd_frame - march_fwd)).

Prints one JSON line.
"""

import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def time_chain(make_chain, atlas, chains=(4, 12)):
    totals = {}
    for chain in chains:
        fn = make_chain(chain)
        float(fn(jnp.float32(1.0), atlas))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(fn(jnp.float32(1.0 + 1e-5 * i), atlas))
            best = min(best, time.perf_counter() - t0)
        totals[chain] = best
    lo, hi = min(chains), max(chains)
    return (totals[hi] - totals[lo]) / (hi - lo)


def main():
    import schwarzschild_tpu as st
    from schwarzschild_tpu import camera as cm
    from schwarzschild_tpu import configs, geometry as geo, physics
    from schwarzschild_tpu.compile_cache import enable_persistent_cache
    from schwarzschild_tpu.kernel_scene import (march_scene,
                                                march_scene_diff,
                                                render_fast)
    from schwarzschild_tpu.textures import build_atlas_cached

    enable_persistent_cache()
    size = 512
    cfg = st.RenderConfig(width=size, height=size, percent_black=-1.0,
                          checkpoint_every=0)
    cfg_grad = st.RenderConfig(width=size, height=size, percent_black=-1.0,
                               checkpoint_every=20)
    cam = configs.demo_camera()
    sc = configs.demo_scene()
    bgt = configs.background_texture()
    tex = configs.demo_texture_stack()
    atlas = build_atlas_cached(bgt, tex)

    u_ndc, v_ndc = cm.pixel_grid(size, size)
    origin, direction = cm.generate_rays(cam, u_ndc, v_ndc, size, size)
    active = ~physics.is_radial(direction, geo.safe_normalize(origin))

    def chain_of(step):
        # The atlas rides as a jit ARGUMENT (remote-compile tunnel ships
        # closure constants: HTTP 413 past ~256 MB).
        def make(chain):
            @jax.jit
            def chained(r0, atlas):
                def body(r, _):
                    return r + 1e-6 * step(r, atlas), None

                r, _ = jax.lax.scan(body, r0, None, length=chain)
                return r

            return chained

        return make

    def fwd_frame(r, atlas):
        img = render_fast(sc, cam, cfg, bgt, tex, r, overflow="ignore",
                          atlas=atlas)
        return jnp.mean(img)

    def march_fwd(r, atlas):
        del atlas
        fdir, fpos, s, slots, nh = march_scene(origin, direction, active, r,
                                               sc, cfg)
        return (jnp.mean(fdir) + jnp.mean(s) + 1e-9 * jnp.mean(slots[0][2])
                + 1e-9 * jnp.mean(nh))

    def march_loss(r):
        fdir, fpos, s, slots, nh = march_scene_diff(origin, direction,
                                                    active, r, sc, cfg)
        return (jnp.mean(fdir) + jnp.mean(fpos)
                + sum(jnp.mean(a) + jnp.mean(b) + jnp.mean(c)
                      for a, b, c in slots))

    def march_grad(r, atlas):
        del atlas
        return jax.grad(march_loss)(r)

    def full_loss(r, atlas):
        img = render_fast(sc, cam, cfg_grad, bgt, tex, r, overflow="ignore",
                          differentiable=True, atlas=atlas)
        return jnp.mean(img)

    def full_grad(r, atlas):
        return jax.grad(full_loss)(r, atlas)

    out = {
        "fwd_frame_ms": time_chain(chain_of(fwd_frame), atlas) * 1e3,
        "march_fwd_ms": time_chain(chain_of(march_fwd), atlas) * 1e3,
        "march_grad_ms": time_chain(chain_of(march_grad), atlas,
                                    chains=(2, 6)) * 1e3,
        "full_grad_ms": time_chain(chain_of(full_grad), atlas,
                                   chains=(2, 6)) * 1e3,
    }
    out["adjoint_kernel_ms"] = out["march_grad_ms"] - out["march_fwd_ms"]
    out["slot_vjp_ms"] = (out["full_grad_ms"] - out["march_grad_ms"]
                          - (out["fwd_frame_ms"] - out["march_fwd_ms"]))
    out["grad_vs_forward"] = out["full_grad_ms"] / out["fwd_frame_ms"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Render the five BASELINE configs to PNG files.

    python examples/render_configs.py --config 2 --out out/
    python examples/render_configs.py --config all --scale 0.25

--scale shrinks resolutions for quick smoke runs; --fast uses the Pallas
scene kernel where applicable.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.animation import render_trajectory
from schwarzschild_tpu.kernel_scene import render_fast
from schwarzschild_tpu.metrics import MetricsLogger


def scaled(cfg: st.RenderConfig, scale: float) -> st.RenderConfig:
    import dataclasses

    return dataclasses.replace(
        cfg, width=max(16, int(cfg.width * scale)),
        height=max(16, int(cfg.height * scale)))


def run_config(n: int, out: Path, scale: float, fast: bool, logger):
    if n == 1:
        c = configs.config1_flat()
    elif n == 2:
        c = configs.config2_curved()
    elif n == 3:
        c = configs.config3_full_scene()
    elif n == 4:
        c = configs.config4_animation(n_frames=8)
        cfg = scaled(c["cfg"], scale)
        t0 = time.time()
        frames = render_trajectory(
            c["scene"], cfg, c["background"], c["tex"],
            times=np.asarray(c["times"]),
            initial_distance=c["trajectory"]["initial_distance"],
            closest_distance=c["trajectory"]["closest_distance"],
            out_dir=out / "config4", logger=logger, all_frames_local=True)
        logger.log("config4_done", seconds=time.time() - t0,
                   n_frames=len(frames))
        return
    elif n == 5:
        from schwarzschild_tpu import inverse

        c = configs.config5_inverse()
        cfg = scaled(c["cfg"], scale)
        import dataclasses

        cfg = dataclasses.replace(cfg, horizon_softness=0.15)
        target = st.render(c["scene"], c["camera"], cfg, c["background"],
                           c["tex"], r_s=1.0)
        t0 = time.time()
        params, history = inverse.fit(
            c["scene"], cfg, c["background"], c["tex"], 5, target,
            c["camera"], r_s0=0.7, n_steps=60, learning_rate=2e-2,
            checkpoint_dir=out / "config5_ckpt", log_every=10)
        r_s = float(inverse._softplus(params.r_s_raw))
        logger.log("config5_done", seconds=time.time() - t0,
                   recovered_r_s=r_s, final_loss=history[-1])
        print(f"config 5: recovered r_s = {r_s:.4f}")
        return
    else:
        raise ValueError(n)

    cfg = scaled(c["cfg"], scale)
    t0 = time.time()
    if fast and c["tex"] is not None:
        img = render_fast(c["scene"], c["camera"], cfg, c["background"],
                          c["tex"], 1.0)
    else:
        img = jax.jit(st.render, static_argnames="cfg")(
            c["scene"], c["camera"], cfg, c["background"], c["tex"],
            jnp.float32(1.0))
    img.block_until_ready()
    path = out / f"config{n}.png"
    st.save_png(img, path)
    logger.log("config_done", config=n, seconds=time.time() - t0,
               path=str(path))
    print(f"config {n}: {path} ({time.time() - t0:.1f}s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="all")
    ap.add_argument("--out", default="out")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(out / "metrics.jsonl")

    which = (range(1, 6) if args.config == "all"
             else [int(x) for x in args.config.split(",")])
    for n in which:
        run_config(n, out, args.scale, args.fast, logger)


if __name__ == "__main__":
    main()

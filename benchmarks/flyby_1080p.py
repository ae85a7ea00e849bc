"""BASELINE config 4 at full reference resolution on the real chip:
1920x1080 split-screen hyperbolic flyby (main.cpp:404-421 / key H), fast
path, 16 frames.

Artifacts written into the repo root / docs:
  * FLYBY_r04.jsonl — per-frame timing records (MetricsLogger)
  * docs/flyby_f00.png, docs/flyby_f08.png — two full-res frames
  * docs/flyby_960x540.gif — 2x-downscaled animated GIF

Run:  python -m benchmarks.flyby_1080p  (on the real chip; CPU works but is
slow at 1080p — pass --frames 2 --size 480x270 for a smoke run).
"""

import argparse
import dataclasses
import shutil
import time

import jax

import schwarzschild_tpu as st
from schwarzschild_tpu import configs
from schwarzschild_tpu.animation import render_trajectory, write_video
from schwarzschild_tpu.metrics import MetricsLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", default="1920x1080",
                    help="WxH (reference default main.cpp:404)")
    ap.add_argument("--out", default="/tmp/flyby_r04")
    ap.add_argument("--repo", default="/root/repo",
                    help="where to drop the checked-in artifacts")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                         "JAX_PLATFORMS=cpu)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    w, h = (int(x) for x in args.size.split("x"))

    print("devices:", jax.devices(), flush=True)
    c = configs.config4_animation(n_frames=args.frames)
    if (w, h) != (c["cfg"].width, c["cfg"].height):
        c["cfg"] = dataclasses.replace(c["cfg"], width=w, height=h)
    logger = MetricsLogger(path=f"{args.repo}/FLYBY_r04.jsonl")
    t0 = time.time()
    out = render_trajectory(
        c["scene"], c["cfg"], c["background"], c["tex"], times=c["times"],
        out_dir=args.out, logger=logger, all_frames_local=True,
        renderer="fast", **c["trajectory"])
    wall = time.time() - t0
    print(f"{args.frames} frames in {wall:.1f}s wall (incl. compile + PNG IO)",
          flush=True)

    shutil.copy(out[0][1], f"{args.repo}/docs/flyby_f00.png")
    shutil.copy(out[len(out) // 2][1], f"{args.repo}/docs/flyby_f08.png")

    # Downscale 2x for a small checked-in animation (Pillow GIF backend —
    # present everywhere; mp4 would need ffmpeg).
    from PIL import Image

    small = []
    for idx, p in out:
        im = Image.open(p).resize((w // 2, h // 2), Image.LANCZOS)
        sp = f"{args.out}/small_{idx:05d}.png"
        im.save(sp)
        small.append(sp)
    try:
        write_video(small, f"{args.repo}/docs/flyby_960x540.gif", fps=8,
                    loop=0)
        print("video written", flush=True)
    except Exception as e:  # keep the frames even if no video backend
        print("video skipped:", e, flush=True)
    print("done")


if __name__ == "__main__":
    main()

"""Headless viewer: drive the sandbox and write frames to disk.

The reference opens an SDL window (sc_app.cpp); in this environment frames
go to PNG files (PIL) or PPM (always available).  Doubles as the app-shell
component: event pump -> scripted inputs, resize -> raster params.

Usage: python -m scx.app.viewer --frames 120 --out /tmp/scx_frames
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def save_frame(path: str, rgb) -> str:
    arr = np.clip(np.asarray(rgb) * 255.0, 0, 255).astype(np.uint8)
    try:
        from PIL import Image

        p = path + ".png"
        Image.fromarray(arr).save(p)
        return p
    except Exception:
        p = path + ".ppm"
        with open(p, "wb") as fh:
            fh.write(b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
            fh.write(arr.tobytes())
        return p


def scripted_input(frame: int) -> tuple:
    """Drive forward, weave gently — a demo 'event pump'."""
    import math

    steer = 0.35 * math.sin(frame * 0.02)
    return (0.8, 0.0, steer, 0.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--every", type=int, default=10, help="save every Nth frame")
    ap.add_argument("--out", default="/tmp/scx_frames")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--capacity", type=int, default=4096)
    args = ap.parse_args(argv)

    from scx.app import Sandbox
    from scx.render import RasterParams

    os.makedirs(args.out, exist_ok=True)
    import jax

    sb = Sandbox(
        capacity=args.capacity,
        raster=RasterParams(
            width=args.width,
            height=args.height,
            max_tris=65536,
            interpret=jax.default_backend() == "cpu",
        ),
    )
    saved = []
    for i in range(args.frames):
        rgb, tel = sb.frame(player_input=scripted_input(i))
        if i % args.every == 0:
            saved.append(save_frame(os.path.join(args.out, f"frame_{i:04d}"), rgb))
            print(sb.telemetry.format_overlay())
            print("->", saved[-1], flush=True)
    sb.shutdown()
    print(f"saved {len(saved)} frames to {args.out}")


if __name__ == "__main__":
    main()

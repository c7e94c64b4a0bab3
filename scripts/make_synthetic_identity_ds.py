#!/usr/bin/env python
"""Generate a synthetic identity dataset in the Omniglot directory layout.

Each class (identity) is a distinct combination of stripe orientation,
frequency, phase jitter, and brightness band; images within a class are
noisy renders of the same pattern.  Gives the GIM game a learnable
identity signal for end-to-end demos without real data (no network egress
in this environment).
"""

import argparse
import os

import numpy as np
from PIL import Image


def render_class(rng: np.random.Generator, img: int, n_imgs: int):
    """n_imgs noisy renders of one identity pattern, uint8 [n, img, img]."""
    theta = rng.uniform(0, np.pi)
    freq = rng.uniform(1.5, 4.5)
    brightness = rng.uniform(60, 200)
    contrast = rng.uniform(30, 55)
    yy, xx = np.mgrid[0:img, 0:img] / img
    base_coord = np.cos(theta) * xx + np.sin(theta) * yy
    out = []
    for _ in range(n_imgs):
        phase = rng.uniform(0, 2 * np.pi / 8)
        wave = np.sin(2 * np.pi * freq * base_coord + phase)
        noise = rng.normal(0, 12, (img, img))
        arr = brightness + contrast * wave + noise
        out.append(np.clip(arr, 0, 255).astype(np.uint8))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--n_alphabets", type=int, default=4)
    parser.add_argument("--n_chars", type=int, default=12)
    parser.add_argument("--imgs_per_class", type=int, default=20)
    parser.add_argument("--img_size", type=int, default=32)
    parser.add_argument("--val_alphabets", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    for a in range(args.n_alphabets):
        split = "val" if a < args.val_alphabets else "train"
        for c in range(args.n_chars):
            d = os.path.join(args.out, split, f"Set{a}", f"id{c:03d}")
            os.makedirs(d, exist_ok=True)
            for i, arr in enumerate(render_class(rng, args.img_size, args.imgs_per_class)):
                Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.png"))
    print(f"wrote {args.n_alphabets * args.n_chars} classes under {args.out}")


if __name__ == "__main__":
    main()

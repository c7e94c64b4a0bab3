#!/usr/bin/env python
"""Generate a HARD synthetic glyph dataset at reference scale.

Omniglot-like (reference: data_handling/img_datasets.py:118-211 loads
alphabet/character trees of hand-drawn glyphs, 964 train classes, 20
examples each): each class is a random multi-stroke Bezier skeleton; each
example re-renders the skeleton with a fresh affine warp (rotation, scale,
shear, translation), control-point jitter, stroke-thickness and ink
variation, and sensor noise.  Within-class variation is therefore
*structural* — an attacker must model the class's stroke geometry, not
memorize pixels — so the GIM game stays unsaturated far longer than the
stripe dataset (scripts/make_synthetic_identity_ds.py).

Layout matches the Omniglot directory contract:
    <out>/<split>/Alphabet<a>/id<c>/<i>.png   (grayscale, ink on white)

Defaults: 28 alphabets x 20 chars = 560 classes (500 train / 60 val),
20 examples per class, 32x32 px.
"""

import argparse
import os

import numpy as np
from PIL import Image

SUPER = 4  # supersampling factor for antialiased strokes


def _bezier_points(ctrl: np.ndarray, n: int) -> np.ndarray:
    """Sample n points along a quadratic or cubic Bezier. ctrl: [3|4, 2]."""
    t = np.linspace(0.0, 1.0, n)[:, None]
    if len(ctrl) == 3:
        p = (1 - t) ** 2 * ctrl[0] + 2 * (1 - t) * t * ctrl[1] + t**2 * ctrl[2]
    else:
        p = (
            (1 - t) ** 3 * ctrl[0]
            + 3 * (1 - t) ** 2 * t * ctrl[1]
            + 3 * (1 - t) * t**2 * ctrl[2]
            + t**3 * ctrl[3]
        )
    return p


def sample_class_skeleton(rng: np.random.Generator):
    """A class identity: list of Bezier control-point arrays in [0,1]^2."""
    n_strokes = int(rng.integers(3, 7))
    strokes = []
    # Chain strokes: each starts near the previous end point half the time,
    # giving connected, character-like figures instead of scattered arcs.
    prev_end = None
    for _ in range(n_strokes):
        order = 4 if rng.random() < 0.5 else 3
        if prev_end is not None and rng.random() < 0.5:
            start = np.clip(prev_end + rng.normal(0, 0.05, 2), 0.1, 0.9)
        else:
            start = rng.uniform(0.15, 0.85, 2)
        rest = rng.uniform(0.1, 0.9, (order - 1, 2))
        ctrl = np.concatenate([start[None], rest], axis=0)
        strokes.append(ctrl)
        prev_end = ctrl[-1]
    return strokes


def _affine(rng: np.random.Generator):
    """Random per-example affine warp about the glyph centre."""
    ang = rng.uniform(-0.21, 0.21)  # ~±12 deg
    scale = rng.uniform(0.85, 1.15, 2)
    shear = rng.uniform(-0.12, 0.12)
    shift = rng.uniform(-0.06, 0.06, 2)
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s], [s, c]])
    shr = np.array([[1.0, shear], [0.0, 1.0]])
    mat = rot @ shr * scale[None, :]
    return mat, shift


# Precomputed soft-brush stencils keyed by integer radius.
_STENCILS = {}


def _stencil(sigma_px: float):
    r = max(1, int(np.ceil(2.5 * sigma_px)))
    key = (r, round(sigma_px, 2))
    if key not in _STENCILS:
        yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
        _STENCILS[key] = (r, np.exp(-(xx**2 + yy**2) / (2 * sigma_px**2)))
    return _STENCILS[key]


def render_example(rng: np.random.Generator, skeleton, img: int) -> np.ndarray:
    """One noisy render of a class skeleton -> uint8 [img, img], ink on white."""
    hi = img * SUPER
    canvas = np.zeros((hi, hi), dtype=np.float64)
    mat, shift = _affine(rng)
    sigma_px = rng.uniform(0.55, 1.0) * SUPER * img / 32.0
    r, sten = _stencil(sigma_px)
    for ctrl in skeleton:
        jit = ctrl + rng.normal(0, 0.015, ctrl.shape)
        warped = (jit - 0.5) @ mat.T + 0.5 + shift
        pts = _bezier_points(warped, 40 * SUPER)
        ij = np.clip((pts * hi).astype(int), r, hi - r - 1)
        for x, y in ij:
            patch = canvas[y - r : y + r + 1, x - r : x + r + 1]
            np.maximum(patch, sten, out=patch)
    # Downsample by mean pooling for antialiasing.
    low = canvas.reshape(img, SUPER, img, SUPER).mean(axis=(1, 3))
    ink = rng.uniform(0.75, 1.0)
    bg = rng.uniform(0.92, 1.0)
    val = bg - (bg * ink) * low + rng.normal(0, 0.02, (img, img))
    return (np.clip(val, 0, 1) * 255).astype(np.uint8)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--n_alphabets", type=int, default=28)
    parser.add_argument("--n_chars", type=int, default=20)
    parser.add_argument("--imgs_per_class", type=int, default=20)
    parser.add_argument("--img_size", type=int, default=32)
    parser.add_argument("--val_alphabets", type=int, default=3)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    n_cls = 0
    for a in range(args.n_alphabets):
        split = "val" if a < args.val_alphabets else "train"
        for c in range(args.n_chars):
            skeleton = sample_class_skeleton(rng)
            d = os.path.join(args.out, split, f"Alphabet{a:02d}", f"id{c:03d}")
            os.makedirs(d, exist_ok=True)
            for i in range(args.imgs_per_class):
                arr = render_example(rng, skeleton, args.img_size)
                Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.png"))
            n_cls += 1
    n_train = (args.n_alphabets - args.val_alphabets) * args.n_chars
    print(f"wrote {n_cls} classes ({n_train} train) under {args.out}")


if __name__ == "__main__":
    main()

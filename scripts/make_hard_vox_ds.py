#!/usr/bin/env python
"""Generate a HARD synthetic VoxCeleb2-shaped dataset at reference-like scale.

VoxCeleb2-like (reference: prepare_voxceleb_dataset.py:102-108 +
data_handling/img_datasets.py:24-115 load an identity/video/frame tree and
treat each *video* as an episodic class): each identity is a parametric
face — head geometry, skin/hair colour, eye/brow/nose/mouth layout — each
"video" re-renders that face under one consistent pose (rotation, scale,
translation), lighting cast, and base expression, and each frame adds the
small frame-to-frame jitter a talking-head clip has (pose wobble, mouth
movement, sensor noise).  Within-identity variation is therefore
*structural* — an attacker must model the identity's geometry across poses
and lighting, not memorize pixels — the voxceleb-family analogue of
scripts/make_hard_glyph_ds.py.

Layout matches the VoxCeleb2 directory contract consumed by
``ImgGIMDataSet(hierarchical=True)`` (data/episodic.py:143-147):

    <out>/<split>/id<I>/v<V>/<f>.jpg   (RGB)

Defaults: 230 identities (200 train / 30 val) x 3 videos x 20 frames,
64x64 px.
"""

import argparse
import os

import numpy as np
from PIL import Image

SUPER = 3  # supersampling factor for antialiased edges


def _soft(q: np.ndarray, k: float = 12.0) -> np.ndarray:
    """Soft inside-mask from an implicit ellipse value q (inside: q<1)."""
    return np.clip((1.0 - q) * k, 0.0, 1.0)


def _ellipse(u, v, cx, cy, rx, ry, k=12.0):
    q = ((u - cx) / rx) ** 2 + ((v - cy) / ry) ** 2
    return _soft(q, k)


def sample_identity(rng: np.random.Generator) -> dict:
    """Identity = the face's structural parameters (shared by all videos)."""
    skin = np.array([
        rng.uniform(0.55, 0.95), rng.uniform(0.40, 0.75), rng.uniform(0.30, 0.65)
    ])
    skin = np.sort(skin)[::-1]  # warm: R >= G >= B
    return {
        "skin": skin,
        "head_rx": rng.uniform(0.42, 0.58),
        "head_ry": rng.uniform(0.55, 0.75),
        "eye_y": rng.uniform(-0.28, -0.10),
        "eye_dx": rng.uniform(0.16, 0.30),
        "eye_rx": rng.uniform(0.055, 0.10),
        "eye_ry_base": rng.uniform(0.035, 0.07),
        "pupil_r": rng.uniform(0.018, 0.038),
        "brow_tilt": rng.uniform(-0.35, 0.35),
        "brow_ry": rng.uniform(0.012, 0.028),
        "nose_len": rng.uniform(0.10, 0.22),
        "nose_w": rng.uniform(0.035, 0.07),
        "mouth_y": rng.uniform(0.28, 0.44),
        "mouth_w": rng.uniform(0.12, 0.26),
        "mouth_thick": rng.uniform(0.018, 0.04),
        "mouth_color": np.array([rng.uniform(0.45, 0.8),
                                 rng.uniform(0.1, 0.3), rng.uniform(0.15, 0.35)]),
        "hair": np.array([rng.uniform(0.02, 0.6),
                          rng.uniform(0.02, 0.45), rng.uniform(0.02, 0.4)]),
        "hairline": rng.uniform(-0.55, -0.25),
        "hair_pad": rng.uniform(1.05, 1.25),
    }


def sample_video(rng: np.random.Generator) -> dict:
    """One clip's consistent pose, lighting, and base expression."""
    return {
        "theta": rng.uniform(-0.45, 0.45),
        "scale": rng.uniform(0.75, 1.05),
        "tx": rng.uniform(-0.10, 0.10),
        "ty": rng.uniform(-0.10, 0.10),
        "gain": rng.uniform(0.70, 1.25, size=3),
        "grad_phi": rng.uniform(0, 2 * np.pi),
        "grad_amp": rng.uniform(0.0, 0.35),
        "mouth_curve": rng.uniform(-0.4, 0.7),
        "mouth_open": rng.uniform(0.6, 2.2),
        "eye_open": rng.uniform(0.6, 1.25),
        # background is a *video* property (a clip's setting), not an identity
        # cue — prevents the game from degenerating into background matching
        "bg": np.array([rng.uniform(0.1, 0.9),
                        rng.uniform(0.1, 0.9), rng.uniform(0.1, 0.9)]),
    }


def render_frame(rng: np.random.Generator, ident: dict, vid: dict,
                 img: int) -> np.ndarray:
    """One frame: the identity under the video's pose + per-frame jitter."""
    s = img * SUPER
    y, x = np.mgrid[0:s, 0:s]
    x = (x + 0.5) / s * 2.0 - 1.0
    y = (y + 0.5) / s * 2.0 - 1.0

    theta = vid["theta"] + rng.uniform(-0.06, 0.06)
    scale = vid["scale"] * rng.uniform(0.97, 1.03)
    tx = vid["tx"] + rng.uniform(-0.02, 0.02)
    ty = vid["ty"] + rng.uniform(-0.02, 0.02)
    # inverse pose: world (x,y) -> face coords (u,v)
    ct, st = np.cos(theta), np.sin(theta)
    u = (ct * (x - tx) + st * (y - ty)) / scale
    v = (-st * (x - tx) + ct * (y - ty)) / scale

    mouth_open = max(vid["mouth_open"] + rng.uniform(-0.5, 0.5), 0.3)
    mouth_curve = vid["mouth_curve"] + rng.uniform(-0.12, 0.12)
    eye_open = np.clip(vid["eye_open"] + rng.uniform(-0.15, 0.15), 0.15, 1.4)

    img_rgb = np.empty((s, s, 3))
    img_rgb[:] = vid["bg"] * (0.9 + 0.2 * (y[..., None] * 0.5 + 0.5))

    def paint(mask, color):
        np.copyto(img_rgb, img_rgb * (1 - mask[..., None]) + color * mask[..., None])

    hrx, hry = ident["head_rx"], ident["head_ry"]
    # hair cap behind the head (slightly larger ellipse, upper half)
    hair_cap = _ellipse(u, v, 0, 0, hrx * ident["hair_pad"],
                        hry * ident["hair_pad"]) * _soft((v - ident["hairline"]) * -4 + 1, 4.0)
    paint(np.clip(hair_cap, 0, 1), ident["hair"])
    head = _ellipse(u, v, 0, 0, hrx, hry)
    paint(head, ident["skin"])
    # hair over the forehead above the identity's hairline
    fringe = head * np.clip((ident["hairline"] - v) * 14, 0, 1)
    paint(fringe, ident["hair"])

    eye_ry = ident["eye_ry_base"] * eye_open
    for sx in (-1.0, 1.0):
        ex = sx * ident["eye_dx"]
        paint(_ellipse(u, v, ex, ident["eye_y"], ident["eye_rx"], eye_ry),
              np.array([0.95, 0.95, 0.93]))
        paint(_ellipse(u, v, ex, ident["eye_y"], ident["pupil_r"],
                       min(ident["pupil_r"], eye_ry * 0.9)),
              np.array([0.08, 0.06, 0.05]))
        # brow: thin tilted ellipse above the eye
        bu = u - ex
        bv = v - (ident["eye_y"] - 2.2 * ident["eye_ry_base"])
        tilt = ident["brow_tilt"] * sx
        cb, sb = np.cos(tilt), np.sin(tilt)
        ru, rv = cb * bu + sb * bv, -sb * bu + cb * bv
        q = (ru / (ident["eye_rx"] * 1.4)) ** 2 + (rv / ident["brow_ry"]) ** 2
        paint(_soft(q), ident["hair"] * 0.6)

    paint(_ellipse(u, v, 0, ident["nose_len"] * 0.35, ident["nose_w"],
                   ident["nose_len"]),
          ident["skin"] * 0.82)
    # mouth: curved band v = mouth_y + curve*((u/w)^2 - 0.5), opened by a factor
    rel = u / ident["mouth_w"]
    vm = ident["mouth_y"] + mouth_curve * (rel**2 - 0.5) * ident["mouth_w"]
    band = np.clip(1 - np.abs(rel), 0, 1) ** 0.5
    q = ((v - vm) / (ident["mouth_thick"] * mouth_open)) ** 2 + rel**2
    paint(_soft(q, 8.0) * band, ident["mouth_color"])

    # lighting: video-consistent per-channel gain + brightness gradient
    grad = 1.0 + vid["grad_amp"] * (np.cos(vid["grad_phi"]) * x
                                    + np.sin(vid["grad_phi"]) * y)
    img_rgb *= vid["gain"] * grad[..., None]

    small = img_rgb.reshape(img, SUPER, img, SUPER, 3).mean(axis=(1, 3))
    small = small * 255 + rng.normal(0, 4.0, small.shape)
    return np.clip(small, 0, 255).astype(np.uint8)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--n_identities", type=int, default=230)
    parser.add_argument("--val_identities", type=int, default=30)
    parser.add_argument("--videos_per_identity", type=int, default=3)
    parser.add_argument("--frames_per_video", type=int, default=20)
    parser.add_argument("--img_size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    n_train = args.n_identities - args.val_identities
    for i in range(args.n_identities):
        split = "train" if i < n_train else "val"
        ident = sample_identity(rng)
        for vi in range(args.videos_per_identity):
            vdir = os.path.join(args.out, split, f"id{i:04d}", f"v{vi}")
            os.makedirs(vdir, exist_ok=True)
            vid = sample_video(rng)
            for fi in range(args.frames_per_video):
                frame = render_frame(rng, ident, vid, args.img_size)
                Image.fromarray(frame).save(
                    os.path.join(vdir, f"{fi:03d}.jpg"), quality=92
                )
        if (i + 1) % 20 == 0:
            print(f"{i + 1}/{args.n_identities} identities", flush=True)
    print(f"done: {args.out} ({n_train} train / {args.val_identities} val "
          f"identities x {args.videos_per_identity} videos "
          f"x {args.frames_per_video} frames)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Input-pipeline benchmark: episodic loader images/sec (secondary metric).

Measures the host-side episodic batch assembly + H2D staging rate for the
Omniglot RAM-cached path and the disk-backed path, at the flagship batch
shape (B=128, m=1, n=5, k=5, 32x32x1 -> 1408 images per batch).  Prints
one JSON line per pipeline.  (``bench.py`` remains the driver's primary
metric.)
"""

import json
import os
import tempfile
import time

import numpy as np


def build_fake_omniglot(root: str, n_alphabets=2, n_chars=10, img=32) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    for a in range(n_alphabets):
        for c in range(n_chars):
            d = os.path.join(root, "train", f"A{a}", f"c{c:02d}")
            os.makedirs(d, exist_ok=True)
            for i in range(20):
                arr = rng.integers(0, 255, (img, img), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.png"))


def measure(loader, n_batches: int, imgs_per_batch: int, device: bool):
    from optimalstrategiesagainstgenerativeattacks_tpu.data.prefetch import device_prefetch

    it = device_prefetch(iter(loader), depth=2) if device else iter(loader)
    # warmup
    next(it)
    t0 = time.perf_counter()
    count = 0
    for batch in it:
        count += 1
        if count >= n_batches:
            break
    dt = time.perf_counter() - t0
    return count * imgs_per_batch / dt


def main():
    from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
        EpisodicBatchLoader,
        ImgGIMDataSet,
        OmniglotGIMDataSet,
    )

    b, m, n, k = 128, 1, 5, 5
    imgs_per_batch = b * (m + n + k)
    root = tempfile.mkdtemp(prefix="osga_bench_ds_")
    build_fake_omniglot(root)

    ram_ds = OmniglotGIMDataSet(root, "train", img_channels=1, img_size=32,
                                m=m, n=n, si=k, example_cnt_per_class=200)
    ram_loader = EpisodicBatchLoader(ram_ds, batch_size=b, seed=0)
    ram_rate = measure(ram_loader, min(len(ram_loader) - 1, 20), imgs_per_batch, device=True)
    print(json.dumps({"metric": "omniglot_ram_pipeline_images_per_sec",
                      "value": round(ram_rate, 1), "unit": "images/sec"}))

    disk_ds = ImgGIMDataSet(root, "train", img_channels=1, img_size=32,
                            m=m, n=n, si=k, example_cnt_per_class=200,
                            img_suffix=".png", hierarchical=True, mirror=True)
    disk_loader = EpisodicBatchLoader(disk_ds, batch_size=b, num_workers=8, seed=0)
    disk_rate = measure(disk_loader, min(len(disk_loader) - 1, 6), imgs_per_batch, device=True)
    print(json.dumps({"metric": "disk_pipeline_images_per_sec",
                      "value": round(disk_rate, 1), "unit": "images/sec"}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Summarise a reference-run TensorBoard event dir: tail + windowed means of a
scalar (default: the gaussian game's au accuracy,
`/root/reference/training/gim_gaussian_training.py:110-113`)."""

import argparse
import glob
import os

import numpy as np
from tensorboard.backend.event_processing.event_accumulator import EventAccumulator


def main():
    p = argparse.ArgumentParser()
    p.add_argument("tb_dir")
    # tensorboardX sanitises spaces to underscores, so this reads both the
    # torch reference's logs and ours (underscores everywhere, SURVEY §5)
    p.add_argument("--tag", default="train_accuracy/au_acc")
    p.add_argument("--window", type=int, default=5000)
    p.add_argument("--list_tags", action="store_true")
    args = p.parse_args()

    acc = EventAccumulator(args.tb_dir, size_guidance={"scalars": 0})
    acc.Reload()
    if args.list_tags:
        print(acc.Tags()["scalars"])
        return
    events = acc.Scalars(args.tag)
    steps = np.array([e.step for e in events])
    vals = np.array([e.value for e in events])
    print(f"{args.tag}: {len(vals)} points, last step {steps[-1] if len(steps) else '-'}")
    w = args.window
    for lo in range(0, len(vals), w):
        chunk = vals[lo:lo + w]
        print(f"  steps {steps[lo]:>8}..{steps[min(lo + w, len(steps)) - 1]:>8}: "
              f"mean {chunk.mean():.4f}  max {chunk.max():.4f}")


if __name__ == "__main__":
    main()

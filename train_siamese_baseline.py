#!/usr/bin/env python
"""Train the Siamese baseline authenticator (the reference ships no such
script; its eval expects an externally-trained checkpoint — SURVEY C8)."""

import argparse


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--outdir", default="./siamese_outdir/")
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--dataset_type", default="omniglot",
                        help="omniglot | voxceleb2 | general_imgs")
    parser.add_argument("--img_size", type=int, default=32)
    parser.add_argument("--img_channels", type=int, default=1)
    parser.add_argument("--m", type=int, default=1)
    parser.add_argument("--n", type=int, default=5)
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--n_epochs", type=int, default=20)
    parser.add_argument("--example_cnt_per_class", type=int, default=20)
    parser.add_argument("--num_workers", type=int, default=0)
    parser.add_argument("--save_every", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--mining", default="batch_hard",
                        choices=["batch_hard", "random"],
                        help="pair recipe: on-device batch-hard mining "
                             "(default) or the random-pair recipe")
    return parser.parse_args()


def main():
    args = get_args()
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.runtime import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from optimalstrategiesagainstgenerativeattacks_tpu.baselines.training import (
        train_siamese,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.eval.authentication import get_dataset

    ds = get_dataset(
        dataset_root=args.dataset_root, split=args.split,
        dataset_type=args.dataset_type,
        example_cnt_per_class=args.example_cnt_per_class,
        img_channels=args.img_channels, img_size=args.img_size,
        m=args.m, n=args.n, k=args.k, seed=args.seed,
    )
    print(f"Siamese episodic dataset: {ds.n_classes} classes, {len(ds)} episodes/epoch")
    train_siamese(vars(args), ds)


if __name__ == "__main__":
    main()

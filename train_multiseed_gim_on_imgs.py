#!/usr/bin/env python
"""Seed-parallel image-GIM training: S independent games in ONE XLA program.

TPU-native capability with no reference counterpart (the reference trains
one seed per process): ``train/multiseed.py`` vmaps the train step over a
stacked seed axis, so GAN variance studies — which this game needs (the
round-2/3 head-to-heads required n>=3 seeds per implementation) — cost one
chip instead of S.  Optional per-seed LR vectors turn the same compiled
program into an on-chip learning-rate sweep.

Each seed writes an ordinary experiment directory ``<outdir>/seed_<s>/``
(args.json + ckpts/model_{step:08d}) interchangeable with single-seed
training, so the standard eval CLI (``eval_gim_on_authentication.py``)
scores every seed unchanged.
"""

import argparse
import time


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--outdir", required=True)
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--dataset_type", default="omniglot",
                        help="omniglot or voxceleb2")
    parser.add_argument("--seeds", type=int, nargs="+", required=True,
                        help="one independent game per seed, trained in parallel")
    parser.add_argument("--au_lrs", type=float, nargs="+", default=None,
                        help="optional per-seed authenticator LRs (len == len(seeds))")
    parser.add_argument("--im_lrs", type=float, nargs="+", default=None,
                        help="optional per-seed impersonator LRs (len == len(seeds))")
    parser.add_argument("--n_steps", type=int, default=2000)
    parser.add_argument("--save_every", type=int, default=400)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--ds_n_examples_per_cls", type=int, default=100)
    parser.add_argument("--m", type=int, default=1)
    parser.add_argument("--n", type=int, default=5)
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--img_channels", type=int, default=1)
    parser.add_argument("--img_size", type=int, default=16)
    parser.add_argument("--style_dim", type=int, default=64)
    parser.add_argument("--num_env_noise_layers", type=int, default=4)
    parser.add_argument("--au_lr", type=float, default=1e-4)
    parser.add_argument("--im_lr", type=float, default=1e-4)
    parser.add_argument("--env_noise_mapping_lr", type=float, default=1e-6)
    parser.add_argument("--reg_param", type=float, default=0.0)
    parser.add_argument("--n_au_steps", type=int, default=1)
    parser.add_argument("--compute_dtype", default="bfloat16")
    return parser.parse_args()


def main():
    args = get_args()
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.runtime import (
        enable_compile_cache,
    )

    enable_compile_cache()

    import os

    import jax
    import numpy as np

    from optimalstrategiesagainstgenerativeattacks_tpu.data.device_sampler import (
        DeviceEpisodicLoader,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
        ImgGIMDataSet,
        OmniglotGIMDataSet,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.train import multiseed
    from optimalstrategiesagainstgenerativeattacks_tpu.train.image import build_models
    from optimalstrategiesagainstgenerativeattacks_tpu.train.checkpoints import (
        CheckpointIO,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
        ImageGameConfig,
        save_args,
    )

    seeds = list(args.seeds)
    for name in ("au_lrs", "im_lrs"):
        lrs = getattr(args, name)
        if lrs is not None and len(lrs) != len(seeds):
            raise SystemExit(f"--{name} must list one LR per seed")

    cfg = ImageGameConfig.from_dict(vars(args))
    if (args.au_lrs or args.im_lrs) and not cfg.inject_lr:
        raise SystemExit("per-seed LRs need inject_lr (constant LRs, no milestones)")

    # one experiment dir per seed, each a standard eval-able layout
    ios = []
    for s in seeds:
        seed_dir = os.path.join(args.outdir, f"seed_{s}")
        d = dict(vars(args), seed=s, outdir=seed_dir)
        d.pop("seeds"), d.pop("au_lrs"), d.pop("im_lrs")
        save_args(args=d, outdir=seed_dir)
        ios.append(CheckpointIO(os.path.join(seed_dir, cfg.ckpt_dir_name)))

    ds_cls = OmniglotGIMDataSet if cfg.dataset_type == "omniglot" else ImgGIMDataSet
    ds_kw = {} if cfg.dataset_type == "omniglot" else {"hierarchical": True, "mirror": True}
    loaders = []
    for s in seeds:
        ds = ds_cls(root=cfg.dataset_root, split="train",
                    img_channels=cfg.img_channels, img_size=cfg.img_size,
                    m=cfg.m, n=cfg.n, si=cfg.k,
                    example_cnt_per_class=cfg.ds_n_examples_per_cls,
                    seed=s, **ds_kw)
        loaders.append(DeviceEpisodicLoader(ds, cfg.batch_size, seed=s))

    au, im = build_models(cfg)

    state, opt_au, opt_im, _ = multiseed.create_multiseed_state(cfg, au, im, seeds)
    if args.au_lrs:
        state = multiseed.set_injected_lr(state, "au", args.au_lrs)
    if args.im_lrs:
        state = multiseed.set_injected_lr(state, "im", args.im_lrs)
    step_fn = multiseed.make_multiseed_train_step(cfg, au, im, opt_au, opt_im)

    print(f"training {len(seeds)} seeds {seeds} in one program, "
          f"{args.n_steps} steps", flush=True)

    def save_all(state, step):
        for i, io in enumerate(ios):
            io.save(multiseed.slice_seed(state, i), step)

    t0 = time.time()
    step = 0
    epoch = 0
    while step < args.n_steps:
        epoch += 1
        for ldr in loaders:
            ldr.set_epoch(epoch)
        iters = [iter(ldr) for ldr in loaders]
        for per_seed in zip(*iters):
            state, metrics, _ = step_fn(state, multiseed.stack_batches(per_seed))
            step += 1
            if step % args.log_every == 0:
                acc = np.asarray(metrics["au_acc"], np.float32)  # closes async chain
                dt = time.time() - t0
                print(f"step {step}: au_acc mean {acc.mean():.3f} "
                      f"[{acc.min():.3f}..{acc.max():.3f}] "
                      f"({step / dt:.2f} multi-steps/s = "
                      f"{len(seeds) * step / dt:.2f} seed-steps/s)", flush=True)
            if step % args.save_every == 0 or step >= args.n_steps:
                save_all(state, step)
                if step >= args.n_steps:
                    break

    print(f"done: {step} steps x {len(seeds)} seeds in {time.time() - t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()

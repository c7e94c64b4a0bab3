#!/usr/bin/env python
"""Train GIM on the synthetic Gaussian game (TPU-native CLI).

Mirrors the reference entry ``train_gim_on_gaussians.py`` argument-for-
argument (device flags are replaced by JAX device/mesh selection: all
visible devices form a data-parallel mesh by default).
"""

import argparse

from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
    GaussianGameConfig,
    save_args,
)


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--outdir", default="./gim_gaussians_outdir/",
                        help="Output directory for the experiment")
    parser.add_argument("--ckpt_dir_name", default="ckpts")
    parser.add_argument("-r", "--resume_from_ckpt", default=None,
                        help="Path to a checkpoint from which to resume training")
    parser.add_argument("--pretrained", default=None,
                        help="Path to pretrained checkpoint to use for model initialization")
    parser.add_argument("--n_iters", type=int, default=500000,
                        help="Number of training iterations.")
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--m", type=int, default=1, help="m: The number of leaked observations")
    parser.add_argument("--n", type=int, default=10, help="n: The number of test observations")
    parser.add_argument("--k", type=int, default=10, help="k: The number of registration observations")
    parser.add_argument("--prior_sigma", type=float, default=10.0,
                        help="The standard deviation of Q, the prior distribution over sources.")
    parser.add_argument("--src_sigma", type=float, default=1.0,
                        help="The known standard deviation of the sources' diagonal covariance.")
    parser.add_argument("--src_dim", type=int, default=1,
                        help="The dimension of source observations")
    parser.add_argument("--au_lr", type=float, default=1e-4, help="Learning rate for the authenticator")
    parser.add_argument("--im_lr", type=float, default=1e-4, help="Learning rate for the attacker (impersonator)")
    parser.add_argument("--reg_param", type=float, default=0.0,
                        help="GAN regularization coefficient. Must be set to 0")
    parser.add_argument("--remove_noise_mean", type=lambda x: bool(int(x)), default=True)
    parser.add_argument("--save_every", type=int, default=100000)
    parser.add_argument("--eval_every", type=int, default=1000)
    parser.add_argument("--save_stats_every", type=int, default=100)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--log_every", type=int, default=100)
    # TPU-build extras (defaults reproduce the reference architecture)
    parser.add_argument("--au_stat", default="mean_std",
                        choices=["mean_std", "mean_std_fc"],
                        help="Authenticator pooling stat; 'mean_std_fc' adds a "
                             "learned DeepSets feature (closes the d=10 gap to "
                             "the closed-form Nash value)")
    parser.add_argument("--au_hidden_scale", type=int, default=1,
                        help="Width multiplier for the discriminator head MLP")
    return parser.parse_args()


def main():
    args = get_args()
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.runtime import (
        enable_compile_cache,
    )

    enable_compile_cache()
    save_args(args=args, outdir=args.outdir)
    cfg = GaussianGameConfig.from_dict(vars(args))

    import jax

    from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import create_mesh
    from optimalstrategiesagainstgenerativeattacks_tpu.train.gaussian import (
        train_gim_gaussian,
    )

    mesh = create_mesh() if len(jax.devices()) > 1 else None
    if mesh is not None:
        print(f"using mesh: {mesh}")
    train_gim_gaussian(cfg, mesh=mesh)


if __name__ == "__main__":
    main()

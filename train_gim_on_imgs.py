#!/usr/bin/env python
"""Train GIM on images (Omniglot / VoxCeleb2) — TPU-native CLI.

Mirrors the reference entry ``train_gim_on_imgs.py`` argument-for-argument
(torch device flags replaced by JAX mesh selection; all visible devices
form a data-parallel mesh by default).  Paper hparams are the defaults for
Omniglot; for VoxCeleb2 use ``--img_size 64 --img_channels 3 --au_lr 1e-4
--im_lr 1e-4 --env_noise_mapping_lr 1e-6 --reg_param 10``.
"""

import argparse


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--outdir", default="./gim_imgs_outdir/",
                        help="Output directory for the experiment")
    parser.add_argument("--dataset_root", required=True, help="Path to dataset root dir")
    parser.add_argument("--dataset_type", default="omniglot",
                        help="Options are omniglot or voxceleb2")
    parser.add_argument("--ckpt_dir_name", default="ckpts")
    parser.add_argument("-r", "--resume_from_ckpt", default=None,
                        help="Path to a checkpoint from which to resume training")
    parser.add_argument("--pretrained", default=None,
                        help="Path to pretrained checkpoint to use for model initialization")
    parser.add_argument("--n_epochs", type=int, default=100000, help="Number of training epochs")
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--ds_n_examples_per_cls", type=int, default=100,
                        help="Number of examples per class in an epoch")
    parser.add_argument("--m", type=int, default=1, help="m: The number of leaked images")
    parser.add_argument("--n", type=int, default=5, help="n: The number of test images")
    parser.add_argument("--k", type=int, default=5, help="k: The number of registration images")
    parser.add_argument("--img_channels", type=int, default=1,
                        help="Number of image channels. 1 for omniglot, 3 for voxceleb2")
    parser.add_argument("--img_size", type=int, default=32,
                        help="Image size. 32 for omniglot, 64 for voxceleb2")
    parser.add_argument("--style_dim", type=int, default=512)
    parser.add_argument("--num_env_noise_layers", type=int, default=4)
    parser.add_argument("--au_lr", type=float, default=1e-6,
                        help="Learning rate for the authenticator. Use 1e-6 for omniglot and 1e-4 for voxceleb2")
    parser.add_argument("--im_lr", type=float, default=1e-5,
                        help="Learning rate for the attacker (or impersonator). Use 1e-5 for omniglot, 1e-4 for voxceleb2")
    parser.add_argument("--beta1", type=float, default=0.0, help="beta1 for the Adam optimizer")
    parser.add_argument("--beta2", type=float, default=0.99, help="beta2 for the Adam optimizer")
    parser.add_argument("--env_noise_mapping_lr", type=float, default=1e-7,
                        help="Learning rate for the noise mapping module. Use 1e-7 for omniglot, 1e-6 for voxceleb2")
    parser.add_argument("--lr_gamma", type=float, default=0.3)
    parser.add_argument("--milestones", type=int, nargs="+", default=[])
    parser.add_argument("--reg_param", type=float, default=0.0,
                        help="GAN regularization coefficient. Use 0. for omniglot, 10. for voxceleb2")
    parser.add_argument("--remove_noise_mean", type=lambda x: bool(int(x)), default=True)
    parser.add_argument("--use_img_att", type=lambda x: bool(int(x)), default=False)
    parser.add_argument("--save_every", type=int, default=10000)
    parser.add_argument("--eval_every", type=int, default=500)
    parser.add_argument("--save_imgs_every", type=int, default=500)
    parser.add_argument("--n_au_steps", type=int, default=1)
    parser.add_argument("-dbg", action="store_true")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--log_every", type=int, default=100,
                        help="TB scalar flush cadence (reference tb_log_every)")
    parser.add_argument("--log_enc_every", type=int, default=500,
                        help="encoder-diagnostic cadence (reference tb_log_enc_every)")
    parser.add_argument("--compute_dtype", default="bfloat16",
                        help="bfloat16 (TPU default) or float32")
    parser.add_argument("--device_data", default="auto",
                        choices=["auto", "on", "off"],
                        help="stage the whole dataset into device HBM and "
                             "sample episodes with a jitted on-device gather "
                             "(zero host->device image traffic per step); "
                             "'auto' uses it when the dataset is uniform and "
                             "the run is single-device")
    parser.add_argument("--unroll_encoder_pair", type=lambda x: bool(int(x)), default=True,
                        help="apply the src/env encoder twins as two full-width "
                             "conv passes instead of one vmapped group-2 pass "
                             "(same params/ckpts; measured 7-9%% faster per step "
                             "on TPU at both tracked configs — pass 0 to disable)")
    parser.add_argument("--remat_encoders", default="auto",
                        choices=["auto", "on", "off"],
                        help="rematerialise encoder blocks in backward passes "
                             "(identical math, ~one extra block forward in "
                             "backprop); 'auto' = on at img_size >= 64, where "
                             "the R1 game's peak HBM sits at the 16 GB edge")
    parser.add_argument("--au_microbatch", type=int, default=0,
                        help="split the authenticator update into this many "
                             "sequential batch chunks (gradients accumulated, "
                             "one optimizer step; exact semantics). Activation "
                             "memory scales 1/c at algorithmic FLOPs. 0 = "
                             "auto: at img_size >= 64, chunks of >= 8 "
                             "episodes capped at c=16 — the measured big-"
                             "image HBM policy (398.9 vs remat's 520.9 "
                             "ms/step at the vox config, 1.5 GB peak temp); "
                             "must divide batch_size")
    parser.add_argument("--adain_scan_unroll", type=int, default=1,
                        help="lax.scan unroll factor for the generator's "
                             "AdaIN res-block stack. 5 (full) measured "
                             "142.3 ms/step flagship combined with the "
                             "default au-microbatching (+3.4%% over the "
                             "scan default) but costs a ~45 min cold "
                             "compile on the remote server — opt-in for "
                             "long production runs, not the default")
    parser.add_argument("--split_step", default="auto",
                        choices=["auto", "always", "never"],
                        help="two-phase split train step (each phase a "
                             "half-size XLA program; numerically identical). "
                             "'auto' uses it at style_dim >= 256 where the "
                             "monolithic program overwhelms the remote "
                             "compile server")
    parser.add_argument("--stack_opt", type=lambda x: bool(int(x)), default=False,
                        help="shape-grouped optimizer-leaf stacking (one Adam "
                             "kernel per (shape,dtype) group; exact semantics, "
                             "changes the opt-state checkpoint layout)")
    return parser.parse_args()


def main():
    args = get_args()
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.runtime import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
        ImageGameConfig,
        save_args,
    )

    save_args(args=args, outdir=args.outdir)
    cfg = ImageGameConfig.from_dict(vars(args))

    from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
        ImgGIMDataSet,
        OmniglotGIMDataSet,
    )

    if cfg.dataset_type == "omniglot":
        train_ds = OmniglotGIMDataSet(
            root=cfg.dataset_root, split="train", img_channels=cfg.img_channels,
            img_size=cfg.img_size, m=cfg.m, n=cfg.n, si=cfg.k,
            example_cnt_per_class=cfg.ds_n_examples_per_cls, seed=cfg.seed,
        )
        val_ds = OmniglotGIMDataSet(
            root=cfg.dataset_root, split="val", img_channels=cfg.img_channels,
            img_size=cfg.img_size, m=cfg.m, n=cfg.n, si=cfg.k,
            example_cnt_per_class=1, seed=cfg.seed + 1,
        )
    elif cfg.dataset_type == "voxceleb2":
        train_ds = ImgGIMDataSet(
            root=cfg.dataset_root, split="train", img_channels=cfg.img_channels,
            img_size=cfg.img_size, m=cfg.m, n=cfg.n, si=cfg.k,
            example_cnt_per_class=cfg.ds_n_examples_per_cls,
            hierarchical=True, mirror=True, seed=cfg.seed,
        )
        val_ds = ImgGIMDataSet(
            root=cfg.dataset_root, split="val", img_channels=cfg.img_channels,
            img_size=cfg.img_size, m=cfg.m, n=cfg.n, si=cfg.k,
            example_cnt_per_class=1, hierarchical=True, mirror=True, seed=cfg.seed + 1,
        )
    else:
        raise ValueError("Supports only dataset_type in ['omniglot','voxceleb2']")

    import jax

    from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import create_mesh
    from optimalstrategiesagainstgenerativeattacks_tpu.train.image import train_gim_imgs

    mesh = create_mesh() if len(jax.devices()) > 1 else None
    if mesh is not None:
        print(f"using mesh: {mesh}")
    train_gim_imgs(cfg, train_ds, val_ds, mesh=mesh)


if __name__ == "__main__":
    main()

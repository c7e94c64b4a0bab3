"""CLI argument-surface parity with the reference entry points.

Locks in that every reference flag exists on our CLIs (we may ADD
TPU-native flags, but must never drop or rename a reference one)."""

import importlib
import sys


def _flags(module_name: str):
    mod = importlib.import_module(module_name)
    saved = sys.argv
    try:
        parser_actions = None
        # get_args builds the parser then parses; grab the parser by calling
        # with --help? Instead reconstruct: call get_args with minimal argv
        # and introspect the ArgumentParser via a patched parse_args.
        import argparse

        captured = {}
        orig = argparse.ArgumentParser.parse_args

        def spy(self, *a, **k):
            captured["parser"] = self
            raise SystemExit(0)

        argparse.ArgumentParser.parse_args = spy
        sys.argv = [module_name]
        try:
            mod.get_args()
        except SystemExit:
            pass
        finally:
            argparse.ArgumentParser.parse_args = orig
        parser = captured["parser"]
        opts = set()
        for action in parser._actions:
            for s in action.option_strings:
                opts.add(s)
        return opts
    finally:
        sys.argv = saved


GAUSSIAN_REFERENCE_FLAGS = {
    "-o", "--outdir", "--ckpt_dir_name", "-r", "--resume_from_ckpt",
    "--pretrained", "--n_iters", "--batch_size", "--m", "--n", "--k",
    "--prior_sigma", "--src_sigma", "--src_dim", "--au_lr", "--im_lr",
    "--reg_param", "--remove_noise_mean", "--save_every", "--eval_every",
    "--save_stats_every",
}

IMAGE_REFERENCE_FLAGS = {
    "-o", "--outdir", "--dataset_root", "--dataset_type", "--ckpt_dir_name",
    "-r", "--resume_from_ckpt", "--pretrained", "--n_epochs", "--batch_size",
    "--num_workers", "--ds_n_examples_per_cls", "--m", "--n", "--k",
    "--img_channels", "--img_size", "--style_dim", "--num_env_noise_layers",
    "--au_lr", "--im_lr", "--beta1", "--beta2", "--env_noise_mapping_lr",
    "--lr_gamma", "--milestones", "--reg_param", "--remove_noise_mean",
    "--use_img_att", "--save_every", "--eval_every", "--save_imgs_every",
    "--n_au_steps", "-dbg",
}

EVAL_REFERENCE_FLAGS = {
    "--ds_root", "--split", "--dataset_type", "--example_cnt_per_class",
    "--img_size", "--img_channels", "--m", "--n", "--k", "--batch_size",
    "--num_workers", "--baseline_exp_dir", "--baseline_type", "--gim_exp_dir",
    "--specific_model", "--csv_file_path",
}


def test_gaussian_cli_covers_reference_flags():
    missing = GAUSSIAN_REFERENCE_FLAGS - _flags("train_gim_on_gaussians")
    assert not missing, missing


def test_image_cli_covers_reference_flags():
    missing = IMAGE_REFERENCE_FLAGS - _flags("train_gim_on_imgs")
    assert not missing, missing


def test_eval_cli_covers_reference_flags():
    missing = EVAL_REFERENCE_FLAGS - _flags(
        "optimalstrategiesagainstgenerativeattacks_tpu.eval.authentication"
    )
    assert not missing, missing


def test_theory_cli_covers_reference_flags():
    missing = {"-m", "-n", "-k", "-d"} - _flags(
        "optimalstrategiesagainstgenerativeattacks_tpu.theory.game_value"
    )
    assert not missing, missing

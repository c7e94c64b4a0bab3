"""Authentication-evaluation CLI: GIM vs {GIM, replay, random-source}.

Parity with ``authentication_eval/eval_gim_on_authentication.py``: loads
the GIM checkpoint (latest by default) together with its ``args.json``,
rebuilds the exact models, builds score closures for gim/siamese/arcface
authenticators and gim/replay/rnd_src impersonators, runs the evaluation
grid, and writes a pandas CSV with the exact column set (:210-215).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from optimalstrategiesagainstgenerativeattacks_tpu.eval.agents import (
    Authenticator,
    Impersonator,
    rand_source_impersonator,
    replay_impersonator,
)
from optimalstrategiesagainstgenerativeattacks_tpu.eval.scorer import (
    eval_authenticator_and_impersonator,
)
from optimalstrategiesagainstgenerativeattacks_tpu.train.checkpoints import (
    CheckpointIO,
    get_latest_ckpt,
)
from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import load_args

CSV_COLS = (
    "au_type", "im_type", "ds_root", "gim_exp_dir",
    "m", "n", "k", "acc", "acc_on_fake", "acc_on_real", "auc",
)


########################################################################################################################
# Model-function builders (score closures)
########################################################################################################################


def get_au_function(au, variables) -> Callable:
    """GIM authenticator score fn (jitted, eval-mode) (:28-48).

    ``variables`` is a jit ARGUMENT, not a closure capture: captured params
    become HLO constants, and a 350 MB compile request exceeds the remote
    compile server's body limit (HTTP 413).
    """

    @jax.jit
    def score(variables, test_sample, si_sample):
        return au.apply(variables, test_sample, si_sample, False)

    def au_model_func(test_sample, si_sample):
        return np.asarray(
            score(variables, jnp.asarray(test_sample), jnp.asarray(si_sample)),
            dtype=np.float32,
        )

    # device-resident variant for the scorer's fast path: returns the score
    # array WITHOUT fetching, so the grid loop defers every host<->device
    # sync to one bulk fetch at the end (the axon tunnel costs ~0.25 s per
    # round trip — per-batch fetches dominate grid wall time otherwise)
    au_model_func.device_fn = lambda test_sample, si_sample: score(
        variables, jnp.asarray(test_sample), jnp.asarray(si_sample)
    )
    return au_model_func


def get_im_function(im, variables, remove_noise_mean: bool, n: int, seed: int = 0) -> Callable:
    """GIM impersonator generation fn (jitted, eval-mode, counted RNG) (:75-80)."""

    @jax.jit
    def gen(variables, leaked_sample, key):
        return im.apply(
            variables, leaked_sample, n, remove_noise_mean, False,
            rngs={"noise": key},
        )

    counter = [0]
    base = jax.random.PRNGKey(seed)

    def im_model_func(leaked_sample, n=n):
        counter[0] += 1
        return np.asarray(
            gen(variables, jnp.asarray(leaked_sample), jax.random.fold_in(base, counter[0])),
            dtype=np.float32,
        )

    def device_fn(leaked_sample, n=n):
        # stays on device: the [B, n, H, W, C] fake never crosses the tunnel
        counter[0] += 1
        return gen(
            variables, jnp.asarray(leaked_sample), jax.random.fold_in(base, counter[0])
        )

    im_model_func.device_fn = device_fn
    return im_model_func


def get_siamese_au_function(model, variables) -> Callable:
    """Siamese score fn: mean-pooled embeddings -> |diff| classifier (:51-65)."""

    @jax.jit
    def score(variables, test_sample, si_sample):
        def embed(sample):
            b, s = sample.shape[:2]
            flat = sample.reshape(b * s, *sample.shape[2:])
            emb = model.apply(variables, flat, False, method=model.encode)
            return emb.reshape(b, s, -1).mean(axis=1)

        return model.apply(
            variables, embed(si_sample), embed(test_sample), method=model.classify
        )

    def au_model_func(test_sample, si_sample):
        out = score(variables, jnp.asarray(test_sample), jnp.asarray(si_sample))
        return np.asarray(out, dtype=np.float32).reshape(-1)

    au_model_func.device_fn = lambda test_sample, si_sample: score(
        variables, jnp.asarray(test_sample), jnp.asarray(si_sample)
    )
    return au_model_func


def get_arcface_au_function(arcface, variables) -> Callable:
    """ArcFace score fn: mean image per sample -> -||emb1-emb2||^2 (:68-76)."""

    @jax.jit
    def score(variables, test_sample, si_sample):
        x1 = test_sample.mean(axis=1)
        x2 = si_sample.mean(axis=1)
        s, _ = arcface.apply(variables, x1, x2, method=arcface.predict)
        return s

    def au_model_func(test_sample, si_sample):
        return np.asarray(
            score(variables, jnp.asarray(test_sample), jnp.asarray(si_sample)),
            dtype=np.float32,
        )

    au_model_func.device_fn = lambda test_sample, si_sample: score(
        variables, jnp.asarray(test_sample), jnp.asarray(si_sample)
    )
    return au_model_func


########################################################################################################################
# Agent builders (checkpoint loading)
########################################################################################################################


# One grid restores the same checkpoint up to six times (gim au x 3
# pairings + gim im + baseline rows); each restore re-runs the jitted model
# init to build the template (~tens of seconds at flagship scale on this
# platform).  Cache the last two restored states (au-dir + im-dir).
_RESTORE_CACHE: "Dict[str, tuple]" = {}


def _restore_gim_state(ckpt_path: str, args_dict: dict):
    """Rebuild the image-game state template and restore the snapshot."""
    from optimalstrategiesagainstgenerativeattacks_tpu.models import image as imodels
    from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import ImageGameConfig

    key = os.path.abspath(ckpt_path)
    if key in _RESTORE_CACHE:
        return _RESTORE_CACHE[key]

    cfg = ImageGameConfig.from_dict(args_dict)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    au = imodels.get_au(cfg.img_size, cfg.img_channels, cfg.style_dim, dtype=dtype,
                        unroll_encoder_pair=cfg.unroll_encoder_pair)
    im = imodels.get_im(
        cfg.img_size, cfg.img_channels, cfg.style_dim,
        use_img_att=cfg.use_img_att, num_env_noise_layers=cfg.num_env_noise_layers,
        dtype=dtype, scan_adain_blocks=cfg.scan_adain_blocks,
        adain_im2col=cfg.adain_im2col,
        unroll_encoder_pair=cfg.unroll_encoder_pair,
        split_gen_input=cfg.split_gen_input,
    )
    template, _, _, _ = itrain.create_state(cfg, au, im, jax.random.PRNGKey(0))
    cio = CheckpointIO(os.path.dirname(ckpt_path))
    state, _, _ = cio.load(ckpt_path, template)
    while len(_RESTORE_CACHE) >= 2:
        _RESTORE_CACHE.pop(next(iter(_RESTORE_CACHE)))
    _RESTORE_CACHE[key] = (cfg, au, im, state)
    return cfg, au, im, state


def get_gim_authenticator(ckpt_path: str, args_dict: dict) -> Authenticator:
    from optimalstrategiesagainstgenerativeattacks_tpu.ops.spectral import compute_sigmas

    _, au, _, state = _restore_gim_state(ckpt_path, args_dict)
    # sigmas are fixed at eval time: precompute once instead of re-deriving
    # u^T W v per conv per batch (ops/spectral.py)
    variables = {
        "params": state.params_au,
        "spectral": state.spectral_au,
        "sigmas": jax.jit(compute_sigmas)(state.params_au, state.spectral_au),
    }
    return Authenticator(get_au_function(au, variables))


def get_gim_impersonator(ckpt_path: str, args_dict: dict) -> Impersonator:
    from optimalstrategiesagainstgenerativeattacks_tpu.ops.spectral import compute_sigmas

    cfg, _, im, state = _restore_gim_state(ckpt_path, args_dict)
    variables = {
        "params": state.params_im,
        "spectral": state.spectral_im,
        "sigmas": jax.jit(compute_sigmas)(state.params_im, state.spectral_im),
    }
    return Impersonator(
        get_im_function(im, variables, cfg.remove_noise_mean, cfg.n)
    )


def get_siamese_authenticator(ckpt_path: str, args_dict: dict) -> Authenticator:
    from optimalstrategiesagainstgenerativeattacks_tpu.baselines.siamese import (
        ProtonetEmbeddingNet,
        SiameseNet,
    )
    import orbax.checkpoint as ocp

    encoder = ProtonetEmbeddingNet(
        args_dict.get("img_channels", 1), args_dict.get("img_size", 32)
    )
    model = SiameseNet(encoder, encoder.embedding_dim)
    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_path))
    variables = payload["model"]
    return Authenticator(get_siamese_au_function(model, variables))


def get_arcface_authenticator(ckpt_path: str, args_dict: dict) -> Authenticator:
    from optimalstrategiesagainstgenerativeattacks_tpu.baselines.arcface import (
        ArcFace,
        Backbone,
    )
    import orbax.checkpoint as ocp

    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_path))
    variables = payload["arcface"]
    n_classes = np.asarray(variables["params"]["head"]["kernel"]).shape[-1]
    emb_model = Backbone(
        num_layers=args_dict.get("num_layers", 50),
        drop_ratio=args_dict.get("dropout", 0.6),
        mode="ir_se",
        img_size=args_dict.get("img_size", 32),
        img_channels=args_dict.get("img_channels", 1),
        emb_dim=args_dict.get("emb_dim", 512),
    )
    arcface = ArcFace(
        emb_model=emb_model, embedding_size=args_dict.get("emb_dim", 512),
        n_classes=int(n_classes), th=args_dict.get("th", 1.5),
    )
    return Authenticator(get_arcface_au_function(arcface, variables), th=arcface.th)


def get_authenticator(au_type: str, ckpt_path: str, args_dict: dict) -> Authenticator:
    if au_type == "gim":
        return get_gim_authenticator(ckpt_path, args_dict)
    if au_type == "siamese":
        return get_siamese_authenticator(ckpt_path, args_dict)
    if au_type == "arcface":
        return get_arcface_authenticator(ckpt_path, args_dict)
    raise ValueError("unsupported authenticator type")


def get_impersonator(im_type: str, ckpt_path: str, ds, args_dict: dict) -> Impersonator:
    if im_type == "gim":
        return get_gim_impersonator(ckpt_path, args_dict)
    if im_type == "replay":
        rng = np.random.default_rng(0)
        return Impersonator(lambda leaked_sample, n: replay_impersonator(leaked_sample, n, rng))
    if im_type == "rnd_src":
        rng = np.random.default_rng(1)
        return Impersonator(
            lambda leaked_sample, n: rand_source_impersonator(leaked_sample, n, ds, rng)
        )
    raise ValueError("unsupported impersonator type")


########################################################################################################################
# Task driver
########################################################################################################################


def get_exp_args_from_dir(outdir: str, ckpt_dir: str = "ckpts", specific_model=None):
    """Latest (or named) checkpoint + args.json from an experiment dir (:182-192)."""
    ckpt_dir_path = os.path.join(outdir, ckpt_dir)
    if specific_model is None:
        model_file_path = get_latest_ckpt(ckpt_dir_path)
    else:
        model_file_path = os.path.join(ckpt_dir_path, specific_model)
    args_dict = load_args(outdir)
    return model_file_path, args_dict


def eval_game_for_pair(
    au_type: str, im_type: str, au_outdir: str, im_outdir: str,
    ds, batch_size: int, num_workers: int = 0,
    ckpt_dir: str = "ckpts", specific_model=None, return_scores: bool = False,
):
    """(acc, acc_on_fake, acc_on_real, auc) for one au/im pairing (:155-179).

    ``specific_model`` names a checkpoint of the *GIM* experiment; when the
    authenticator lives in a different directory (e.g. a baseline) that may
    not contain the filename, so we fall back to that directory's latest
    checkpoint — but only when the named file really is absent, so a
    cross-directory GIM-vs-GIM pairing still honours ``specific_model``
    (the reference applies specific_model to both dirs and would crash on
    baselines, ``eval_gim_on_authentication.py:163-164``).
    """
    au_specific = specific_model
    if (
        specific_model is not None
        and au_outdir != im_outdir
        and not os.path.exists(os.path.join(au_outdir, ckpt_dir, specific_model))
    ):
        print(
            f"warning: {specific_model!r} not found under {au_outdir}/{ckpt_dir}; "
            "falling back to the latest checkpoint for the authenticator"
        )
        au_specific = None
    au_ckpt_path, au_args_dict = get_exp_args_from_dir(au_outdir, ckpt_dir, au_specific)
    im_ckpt_path, im_args_dict = get_exp_args_from_dir(im_outdir, ckpt_dir, specific_model)
    au_agent = get_authenticator(au_type, au_ckpt_path, au_args_dict)
    im_agent = get_impersonator(im_type, im_ckpt_path, ds, im_args_dict)
    return eval_authenticator_and_impersonator(
        ds=ds, batch_size=batch_size, authenticator=au_agent, impersonator=im_agent,
        num_workers=num_workers, return_scores=return_scores,
    )


def eval_authentication_task(
    ds, m: int, n: int, k: int,
    batch_size: int, num_workers: int,
    gim_exp_dir: str, csv_file_path: str,
    specific_model=None, baseline_exp_dir=None, baseline_type=None,
    calibrate_q=None, dump_scores_dir=None,
):
    """Full evaluation grid -> CSV (:195-252).

    ``calibrate_q`` (e.g. 0.95) appends calibrated-operating-point columns:
    ``th_cal`` = the threshold accepting that fraction of REAL scores
    (deployable — computed from enrollment data only, no attacker
    knowledge), the acc trio at ``th_cal``, plus score-distribution stats
    and the oracle balanced-accuracy threshold/acc for analysis.  The
    reference-parity columns (CSV_COLS) are unchanged; extras are appended
    only when requested.  ``dump_scores_dir`` writes the raw
    real/fake score vectors per pairing as ``scores_{au}_{im}.npz``.
    """
    import pandas as pd

    from optimalstrategiesagainstgenerativeattacks_tpu.eval.scorer import (
        acc_at_threshold,
        balanced_threshold,
        real_quantile_threshold,
    )

    os.makedirs(os.path.dirname(os.path.abspath(csv_file_path)), exist_ok=True)
    printed_cols = ["au_type", "im_type", "acc", "acc_on_fake", "acc_on_real"]
    want_scores = calibrate_q is not None or dump_scores_dir is not None
    rows = []
    au_type_list = ["gim"] if baseline_type is None else ["gim", baseline_type]
    for au_type in au_type_list:
        for im_type in ("gim", "replay", "rnd_src"):
            print(f"running {au_type} vs. {im_type}")
            au_outdir = gim_exp_dir if au_type == "gim" else baseline_exp_dir
            res = eval_game_for_pair(
                au_type=au_type, im_type=im_type,
                au_outdir=au_outdir, im_outdir=gim_exp_dir,
                ds=ds, batch_size=batch_size, num_workers=num_workers,
                specific_model=specific_model, return_scores=want_scores,
            )
            acc, acc_on_fake, acc_on_real, auc = res[:4]
            row = {
                "au_type": au_type, "im_type": im_type,
                "ds_root": ds.root, "gim_exp_dir": gim_exp_dir,
                "m": m, "n": n, "k": k,
                "acc": acc, "acc_on_fake": acc_on_fake,
                "acc_on_real": acc_on_real, "auc": auc,
            }
            if want_scores:
                score_real, score_fake = res[4]
                if dump_scores_dir is not None:
                    os.makedirs(dump_scores_dir, exist_ok=True)
                    np.savez(
                        os.path.join(dump_scores_dir,
                                     f"scores_{au_type}_{im_type}.npz"),
                        score_real=score_real, score_fake=score_fake,
                    )
                if calibrate_q is not None:
                    th_cal = real_quantile_threshold(score_real, calibrate_q)
                    c_acc, c_fake, c_real = acc_at_threshold(
                        score_real, score_fake, th_cal
                    )
                    th_bal = balanced_threshold(score_real, score_fake)
                    b_acc, _, _ = acc_at_threshold(score_real, score_fake, th_bal)
                    row.update({
                        "th_cal": th_cal, "acc_cal": c_acc,
                        "acc_on_fake_cal": c_fake, "acc_on_real_cal": c_real,
                        "th_balanced": th_bal, "acc_balanced": b_acc,
                        "score_real_mean": float(np.mean(score_real)),
                        "score_real_std": float(np.std(score_real)),
                        "score_fake_mean": float(np.mean(score_fake)),
                        "score_fake_std": float(np.std(score_fake)),
                    })
            rows.append(row)
            print(pd.DataFrame([row])[printed_cols])

    cols = list(CSV_COLS)
    if calibrate_q is not None:
        cols += [
            "th_cal", "acc_cal", "acc_on_fake_cal", "acc_on_real_cal",
            "th_balanced", "acc_balanced",
            "score_real_mean", "score_real_std",
            "score_fake_mean", "score_fake_std",
        ]
    df = pd.DataFrame(rows, columns=cols)
    df.to_csv(csv_file_path)
    print(df[printed_cols])
    return df


def get_dataset(dataset_root, split, dataset_type, example_cnt_per_class,
                img_channels, img_size, m, n, k, seed: int = 0):
    """Episodic eval dataset factory (:255-290)."""
    from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
        ImgGIMDataSet,
        OmniglotGIMDataSet,
    )

    if dataset_type == "omniglot":
        return OmniglotGIMDataSet(
            root=dataset_root, split=split, img_channels=img_channels,
            img_size=img_size, m=m, n=n, si=k,
            example_cnt_per_class=example_cnt_per_class, seed=seed,
        )
    if dataset_type == "voxceleb2":
        return ImgGIMDataSet(
            root=dataset_root, split=split, img_channels=img_channels,
            img_size=img_size, m=m, n=n, si=k,
            example_cnt_per_class=example_cnt_per_class,
            hierarchical=True, mirror=True, seed=seed,
        )
    if dataset_type == "general_imgs":
        return ImgGIMDataSet(
            root=dataset_root, split=split, img_channels=img_channels,
            img_size=img_size, m=m, n=n, si=k,
            example_cnt_per_class=example_cnt_per_class,
            hierarchical=False, mirror=True, seed=seed,
        )
    raise ValueError("Supports only dataset_type in ['omniglot','voxceleb2','general_imgs']")


def get_args():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--ds_root", required=True, help="Path to dataset root dir.")
    parser.add_argument("--split", default="val", help="train, val, or test")
    parser.add_argument("--dataset_type", default="omniglot", help="omniglot or voxceleb2")
    parser.add_argument("--example_cnt_per_class", type=int, default=5,
                        help="How many examples to sample per class for the evaluation")
    parser.add_argument("--img_size", type=int, default=32, help="image size")
    parser.add_argument("--img_channels", type=int, default=1, help="number of image channels")
    parser.add_argument("--m", type=int, default=1, help="m: the number of leaked images")
    parser.add_argument("--n", type=int, default=5, help="n: the number of test images")
    parser.add_argument("--k", type=int, default=5, help="k: the number of registration images")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--baseline_exp_dir", default=None,
                        help="experiment directory for the baseline model")
    parser.add_argument("--baseline_type", default=None, help="siamese, arcface, or None")
    parser.add_argument("--gim_exp_dir", required=True,
                        help="experiment directory for the GIM model")
    parser.add_argument("--specific_model", default=None,
                        help="Specific checkpoint name. If not given, the latest model is taken.")
    parser.add_argument("--csv_file_path",
                        default=os.path.join(os.path.abspath(os.path.dirname(__file__)), "results.csv"),
                        help="The path for the results csv file")
    parser.add_argument("--calibrate_q", type=float, default=None,
                        help="Append calibrated-threshold columns: the "
                             "operating point accepting this fraction of "
                             "real scores (deployable, attacker-blind), "
                             "plus score-distribution stats and the oracle "
                             "balanced-accuracy point. E.g. 0.95.")
    parser.add_argument("--dump_scores_dir", default=None,
                        help="Write raw real/fake score vectors per pairing "
                             "as npz files into this directory (score-"
                             "distribution analysis).")
    return parser.parse_args()


def main(args=None):
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.runtime import (
        enable_compile_cache,
    )

    enable_compile_cache()
    args = args or get_args()
    ds = get_dataset(
        dataset_root=args.ds_root, split=args.split, dataset_type=args.dataset_type,
        example_cnt_per_class=args.example_cnt_per_class,
        img_channels=args.img_channels, img_size=args.img_size,
        m=args.m, n=args.n, k=args.k,
    )
    eval_authentication_task(
        ds=ds, m=args.m, n=args.n, k=args.k,
        batch_size=args.batch_size, num_workers=args.num_workers,
        baseline_exp_dir=args.baseline_exp_dir, baseline_type=args.baseline_type,
        gim_exp_dir=args.gim_exp_dir, csv_file_path=args.csv_file_path,
        specific_model=args.specific_model,
        calibrate_q=getattr(args, "calibrate_q", None),
        dump_scores_dir=getattr(args, "dump_scores_dir", None),
    )


if __name__ == "__main__":
    main()

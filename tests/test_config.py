"""args.json round-trip contract tests (utils/config.py)."""

import json
import os

from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
    GaussianGameConfig,
    ImageGameConfig,
    load_args,
    save_args,
)


def test_save_load_roundtrip_dataclass(tmp_path):
    cfg = ImageGameConfig(outdir=str(tmp_path), img_size=64, style_dim=256,
                          milestones=[10, 20], reg_param=10.0)
    path = save_args(cfg, str(tmp_path))
    assert os.path.basename(path) == "args.json"
    loaded = load_args(str(tmp_path))
    assert loaded["img_size"] == 64
    assert loaded["milestones"] == [10, 20]
    rebuilt = ImageGameConfig.from_dict(loaded)
    assert rebuilt.style_dim == 256 and rebuilt.reg_param == 10.0


def test_target_img_size_backcompat_shim(tmp_path):
    # the reference maps target_img_size -> img_size at eval load time
    # (eval_gim_on_authentication.py:190-191)
    with open(tmp_path / "args.json", "w") as f:
        json.dump({"target_img_size": 48, "style_dim": 128}, f)
    loaded = load_args(str(tmp_path))
    assert loaded["img_size"] == 48
    cfg = ImageGameConfig.from_dict({"target_img_size": 48})
    assert cfg.img_size == 48


def test_from_dict_ignores_unknown_keys(tmp_path):
    cfg = GaussianGameConfig.from_dict({"n_iters": 5, "device": "cuda", "bogus": 1})
    assert cfg.n_iters == 5


def test_save_args_accepts_namespace(tmp_path):
    import argparse

    ns = argparse.Namespace(img_size=32, k=5)
    save_args(ns, str(tmp_path))
    assert load_args(str(tmp_path))["k"] == 5


def test_resolve_ckpt_path_falls_back_to_outdir(tmp_path):
    """'-r ckpts/model_XXXXXXXX' must work from any launch directory: a
    relative path that doesn't exist from the cwd resolves against the
    experiment outdir (the two silent FileNotFoundError launches of the
    round-3 flag100k resume are the regression this guards)."""
    from optimalstrategiesagainstgenerativeattacks_tpu.train.checkpoints import (
        resolve_ckpt_path,
    )

    outdir = tmp_path / "exp"
    ckpt = outdir / "ckpts" / "model_00000100"
    ckpt.mkdir(parents=True)
    # relative, not under cwd -> resolved against outdir
    assert resolve_ckpt_path("ckpts/model_00000100", str(outdir)) == str(ckpt)
    # absolute paths pass through untouched
    assert resolve_ckpt_path(str(ckpt), "/nonexistent") == str(ckpt)
    # nonexistent everywhere passes through (caller errors with the raw path)
    assert resolve_ckpt_path("ckpts/model_00000999", str(outdir)) == "ckpts/model_00000999"

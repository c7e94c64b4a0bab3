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


def test_resolved_hbm_policy():
    """Round-4 big-image HBM policy: 'auto' resolves to gradient
    accumulation at img_size >= 64 — measured faster AND safer than
    encoder remat across the whole sweep (mb16: 398.9 vs remat's 520.9
    ms/step, au temp 1.47 vs 11.7 GB at the vox config; knee at mb32) —
    with remat re-engaging only when the batch cannot be chunked;
    explicit settings always win."""
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
        ImageGameConfig,
    )

    mk = lambda **kw: ImageGameConfig(**kw).resolved_hbm_policy()
    # small images, big batch: 16-episode chunks capped at 8 (flagship
    # measured 145.0 ms at c=8 vs 148.8 unchunked, knee at c=16)
    assert mk(img_size=32, batch_size=128) == (False, 8)
    assert mk(img_size=32, batch_size=64) == (False, 4)
    # small images, small batch: outside the measured regime -> no chunking
    assert mk(img_size=32, batch_size=32) == (False, 1)
    assert mk(img_size=16, batch_size=8) == (False, 1)
    # big images: the measured-optimal chunking (chunks of 8 episodes,
    # cap 16), remat off
    assert mk(img_size=64, batch_size=128) == (False, 16)
    assert mk(img_size=64, batch_size=64) == (False, 8)
    assert mk(img_size=64, batch_size=24) == (False, 3)
    # big images with a prime batch: microbatch can't engage -> remat fallback
    assert mk(img_size=64, batch_size=127) == (True, 1)
    # explicit microbatch wins over auto
    assert mk(img_size=64, batch_size=128, au_microbatch=4) == (False, 4)
    # forcing microbatch off at big images re-engages the remat fallback
    assert mk(img_size=64, batch_size=128, au_microbatch=1) == (True, 1)
    # forced remat composes with auto microbatch
    assert mk(img_size=64, batch_size=128, remat_encoders="on") == (True, 16)
    assert mk(img_size=64, batch_size=128, remat_encoders="off") == (False, 16)
    # small images, explicit chunking: no remat
    assert mk(img_size=16, batch_size=8, au_microbatch=2) == (False, 2)

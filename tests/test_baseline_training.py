"""End-to-end tests for the baseline training loops + eval adapters."""

import numpy as np
import pytest
from PIL import Image

from optimalstrategiesagainstgenerativeattacks_tpu.baselines.training import (
    train_arcface,
    train_siamese,
)
from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
    ArcfaceDataSet,
    OmniglotGIMDataSet,
)
from optimalstrategiesagainstgenerativeattacks_tpu.train.checkpoints import get_latest_ckpt


@pytest.fixture(scope="module")
def mini_ds_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("baseline_ds")
    rng = np.random.default_rng(0)
    for a in range(2):
        for c in range(2):
            d = root / "train" / f"A{a}" / f"c{c}"
            d.mkdir(parents=True)
            for i in range(8):
                arr = rng.integers(0, 255, (16, 16), dtype=np.uint8)
                Image.fromarray(arr).save(str(d / f"{i:03d}.jpg"))
    return str(root)


def test_train_siamese_and_eval_adapter(tmp_path, mini_ds_root):
    ds = OmniglotGIMDataSet(mini_ds_root, "train", img_channels=1, img_size=16,
                            m=1, n=3, si=2, example_cnt_per_class=2)
    # OmniglotGIMDataSet scans .jpg too via IMG_EXTENSIONS
    cfg = dict(outdir=str(tmp_path / "siam"), img_size=16, img_channels=1,
               lr=1e-3, batch_size=4, n_epochs=1, save_every=100, seed=1)
    variables, metrics = train_siamese(cfg, ds, progress=False)
    assert float(metrics["loss"]) > 0
    ckpt = get_latest_ckpt(str(tmp_path / "siam" / "ckpts"))

    from optimalstrategiesagainstgenerativeattacks_tpu.eval.authentication import (
        get_siamese_authenticator,
    )

    au = get_siamese_authenticator(ckpt, {"img_channels": 1, "img_size": 16})
    test = np.zeros((2, 3, 16, 16, 1), np.float32)
    si = np.zeros((2, 2, 16, 16, 1), np.float32)
    out, pred = au.act(test_sample=test, si_sample=si)
    assert out.shape == (2,) and pred.shape == (2,)


def test_siamese_batchhard_learns(tmp_path, tmp_path_factory):
    """Batch-hard mining learns a separable synthetic task (class = distinct
    base image + noise) — guards the on-device mining logic end-to-end."""
    root = tmp_path_factory.mktemp("bh_ds")
    rng = np.random.default_rng(0)
    for c in range(4):
        d = root / "train" / "A0" / f"c{c}"
        d.mkdir(parents=True)
        base = rng.integers(0, 255, (16, 16)).astype(np.float64)
        for i in range(8):
            arr = np.clip(base + rng.normal(0, 20, (16, 16)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(str(d / f"{i:03d}.jpg"))
    ds = OmniglotGIMDataSet(str(root), "train", img_channels=1, img_size=16,
                            m=1, n=3, si=2, example_cnt_per_class=4)
    cfg = dict(outdir=str(tmp_path / "bh"), img_size=16, img_channels=1,
               lr=1e-3, batch_size=4, n_epochs=8, save_every=10_000, seed=1)
    variables, metrics = train_siamese(cfg, ds, progress=False)
    assert np.isfinite(float(metrics["loss"]))
    # acc is measured on the MINED hardest pairs — the toughest in-batch metric
    assert float(metrics["acc"]) >= 0.6


def test_siamese_random_recipe_still_works(tmp_path, mini_ds_root):
    ds = OmniglotGIMDataSet(mini_ds_root, "train", img_channels=1, img_size=16,
                            m=1, n=3, si=2, example_cnt_per_class=2)
    cfg = dict(outdir=str(tmp_path / "siam_rnd"), img_size=16, img_channels=1,
               lr=1e-3, batch_size=4, n_epochs=1, save_every=100, seed=1,
               mining="random")
    variables, metrics = train_siamese(cfg, ds, progress=False)
    assert np.isfinite(float(metrics["loss"]))


def test_train_arcface_and_eval_adapter(tmp_path, mini_ds_root):
    ds = ArcfaceDataSet(mini_ds_root + "/train", "A0", img_channels=1, img_size=32,
                        example_cnt_per_class=4, img_suffix=".jpg")
    assert ds.n_classes == 2
    cfg = dict(outdir=str(tmp_path / "arc"), num_layers=50, dropout=0.1,
               img_size=32, img_channels=1, emb_dim=64, th=1.5, lr=1e-3,
               batch_size=4, n_epochs=1, save_every=100, seed=1)
    variables, metrics = train_arcface(cfg, ds, progress=False)
    assert np.isfinite(float(metrics["loss"]))
    ckpt = get_latest_ckpt(str(tmp_path / "arc" / "ckpts"))

    from optimalstrategiesagainstgenerativeattacks_tpu.eval.authentication import (
        get_arcface_authenticator,
    )

    au = get_arcface_authenticator(
        ckpt, {"num_layers": 50, "dropout": 0.1, "img_size": 32,
               "img_channels": 1, "emb_dim": 64, "th": 1.5},
    )
    test = np.zeros((2, 3, 32, 32, 1), np.float32)
    si = np.zeros((2, 2, 32, 32, 1), np.float32)
    out, pred = au.act(test_sample=test, si_sample=si)
    assert out.shape == (2,)
    # identical mean images -> zero distance -> score ~0
    np.testing.assert_allclose(out, 0.0, atol=1e-3)

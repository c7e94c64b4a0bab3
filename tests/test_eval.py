"""Authentication-eval tests: agents, scorer, and the end-to-end task with
a trained-for-a-moment GIM checkpoint on a synthetic dataset."""

import os

import jax
import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.eval.agents import (
    Authenticator,
    Impersonator,
    rand_source_impersonator,
    replay_impersonator,
)
from optimalstrategiesagainstgenerativeattacks_tpu.eval.scorer import (
    comp_acc,
    eval_authenticator_and_impersonator,
)


class _ArrayDS:
    """Minimal episodic dataset over in-memory uint8 arrays."""

    def __init__(self, n_classes=4, examples=2, m=1, n=2, k=2, img=16, c=1):
        self.root = "<memory>"
        self.n_classes = n_classes
        self.example_cnt_per_class = examples
        self.m, self.n, self.k = m, n, k
        self.img, self.c = img, c
        self._rng = np.random.default_rng(0)

    def __len__(self):
        return self.n_classes * self.example_cnt_per_class

    def __getitem__(self, idx):
        return self.sample_episode(idx)

    def sample_episode(self, idx, rng=None):
        rng = rng or self._rng
        cls = idx // self.example_cnt_per_class
        base = 40 * cls

        def draw(s):
            return (base + rng.integers(0, 40, (s, self.img, self.img, self.c))).astype(
                np.uint8
            )

        return {
            "real_sample": draw(self.n),
            "leaked_sample": draw(self.m),
            "si_sample": draw(self.k),
            "class": np.int32(cls),
            "class_name": str(cls),
        }


def test_comp_acc():
    acc, acc_on_fake, acc_on_real = comp_acc(
        np.array([1, 1, 0, 1]), np.array([0, 0, 1, 0])
    )
    assert acc_on_real == 0.75 and acc_on_fake == 0.75 and acc == 0.75


def test_replay_impersonator():
    leaked = np.arange(2 * 3 * 4).reshape(2, 3, 2, 2, 1).astype(np.float32)
    fake = replay_impersonator(leaked, n=5, rng=np.random.default_rng(0))
    assert fake.shape == (2, 5, 2, 2, 1)
    # every fake image is one of the leaked ones
    for b in range(2):
        for i in range(5):
            assert any(np.array_equal(fake[b, i], leaked[b, j]) for j in range(3))


def test_rand_source_impersonator():
    ds = _ArrayDS()
    leaked = np.zeros((3, 1, 16, 16, 1), np.float32)
    fake = rand_source_impersonator(leaked, n=2, gim_ds=ds, rng=np.random.default_rng(0))
    assert fake.shape == (3, 2, 16, 16, 1)
    assert fake.min() >= -1.0 and fake.max() <= 1.0


def test_scorer_with_oracle_authenticator():
    """An oracle scoring by brightness distance separates real from replay-of-
    noise perfectly -> acc 1.0, auc 1.0."""
    ds = _ArrayDS(n_classes=4, examples=2)

    def oracle(test_sample, si_sample):
        # same class => same brightness band => small |mean diff|
        d = np.abs(test_sample.mean(axis=(1, 2, 3, 4)) - si_sample.mean(axis=(1, 2, 3, 4)))
        return 0.1 - d

    au = Authenticator(oracle, th=0.0)

    def random_other(leaked_sample, n):
        return np.ones((leaked_sample.shape[0], n, 16, 16, 1), np.float32)  # bright

    im = Impersonator(random_other)
    acc, acc_on_fake, acc_on_real, auc = eval_authenticator_and_impersonator(
        ds=ds, batch_size=4, authenticator=au, impersonator=im
    )
    assert acc_on_real > 0.9
    assert acc_on_fake == 1.0
    assert auc > 0.95


def test_scorer_shape_stable_on_remainder_batch():
    """A dataset size NOT divisible by batch_size must still present every
    device call at exactly batch_size episodes (the remainder batch is padded
    by wraparound and its scores dropped) — a new shape would trigger a fresh
    remote XLA compile of the flagship authenticator apply."""
    ds = _ArrayDS(n_classes=5, examples=1)  # 5 items, batch 2 -> batches 2,2,1
    seen_shapes = []

    def oracle(test_sample, si_sample):
        seen_shapes.append(tuple(np.asarray(test_sample).shape))
        d = np.abs(
            np.asarray(test_sample).mean(axis=(1, 2, 3, 4))
            - np.asarray(si_sample).mean(axis=(1, 2, 3, 4))
        )
        return 0.1 - d

    au = Authenticator(oracle, th=0.0)
    im = Impersonator(lambda leaked_sample, n: np.ones(
        (np.asarray(leaked_sample).shape[0], n, 16, 16, 1), np.float32))
    acc, acc_on_fake, acc_on_real, auc = eval_authenticator_and_impersonator(
        ds=ds, batch_size=2, authenticator=au, impersonator=im
    )
    assert len(set(seen_shapes)) == 1 and seen_shapes[0][0] == 2
    # 5 valid episodes scored on each side despite 6 slots run
    assert len(seen_shapes) == 6  # 3 batches x (real, fake)
    assert acc_on_fake == 1.0 and auc > 0.9


def test_calibration_restores_drifted_operating_point():
    """The round-3 100k-run failure mode in miniature: the score
    distribution drifts entirely below zero — threshold-0 accuracy on real
    collapses to 0 while ranking (AUC) stays perfect.  The real-quantile
    calibrated threshold restores the operating point without seeing a
    single fake score."""
    from optimalstrategiesagainstgenerativeattacks_tpu.eval.scorer import (
        acc_at_threshold,
        balanced_threshold,
        real_quantile_threshold,
    )

    rng = np.random.default_rng(0)
    score_real = rng.normal(-1.0, 0.3, 2000)   # drifted below th=0
    score_fake = rng.normal(-2.5, 0.3, 2000)   # but still well-separated

    # the fixed reference operating point is broken...
    acc0, _, acc_real0 = acc_at_threshold(score_real, score_fake, 0.0)
    assert acc_real0 < 0.01 and acc0 < 0.51
    # ...while the attacker-blind real-quantile threshold repairs it
    th = real_quantile_threshold(score_real, accept_frac=0.95)
    acc_c, acc_fake_c, acc_real_c = acc_at_threshold(score_real, score_fake, th)
    assert 0.93 <= acc_real_c <= 0.97  # accepts ~95% of real by construction
    assert acc_fake_c > 0.99
    assert acc_c > 0.95
    # the oracle balanced point is at least as good as both
    th_b = balanced_threshold(score_real, score_fake)
    acc_b, _, _ = acc_at_threshold(score_real, score_fake, th_b)
    assert acc_b >= acc_c - 1e-9 and acc_b > 0.98

    # edge cases: accept-everything / perfect split
    assert real_quantile_threshold([1.0, 2.0, 3.0], 1.0) <= 1.0
    assert acc_at_threshold([1, 2], [-2, -1], 0.0) == (1.0, 1.0, 1.0)


def test_task_calibration_columns_and_score_dump(tmp_path, monkeypatch):
    """eval_authentication_task with calibrate_q: parity columns unchanged,
    calibrated columns appended, raw score vectors dumped per pairing."""
    import pandas as pd

    from optimalstrategiesagainstgenerativeattacks_tpu.eval import authentication

    rng = np.random.default_rng(1)

    def fake_pair(au_type, im_type, au_outdir, im_outdir, ds, batch_size,
                  num_workers=0, ckpt_dir="ckpts", specific_model=None,
                  return_scores=False):
        sr = rng.normal(-1.0, 0.3, 64)
        sf = rng.normal(-2.5, 0.3, 64)
        from optimalstrategiesagainstgenerativeattacks_tpu.eval.scorer import (
            acc_at_threshold,
        )

        acc, acc_f, acc_r = acc_at_threshold(sr, sf, 0.0)
        out = (acc, acc_f, acc_r, 0.99)
        return out + ((sr, sf),) if return_scores else out

    monkeypatch.setattr(authentication, "eval_game_for_pair", fake_pair)

    class DS:
        root = "<memory>"

    csv_path = str(tmp_path / "cal.csv")
    dump_dir = str(tmp_path / "scores")
    df = authentication.eval_authentication_task(
        ds=DS(), m=1, n=2, k=2, batch_size=2, num_workers=0,
        gim_exp_dir="<none>", csv_file_path=csv_path,
        calibrate_q=0.95, dump_scores_dir=dump_dir,
    )
    assert list(df.columns)[: len(authentication.CSV_COLS)] == list(
        authentication.CSV_COLS
    )
    for col in ("th_cal", "acc_cal", "acc_on_real_cal", "th_balanced",
                "score_real_mean", "score_fake_std"):
        assert col in df.columns
    # the drifted distribution: broken at th=0, repaired at th_cal
    assert (df["acc_on_real"] < 0.01).all()
    assert (df["acc_on_real_cal"] > 0.9).all()
    for im_type in ("gim", "replay", "rnd_src"):
        z = np.load(os.path.join(dump_dir, f"scores_gim_{im_type}.npz"))
        assert z["score_real"].shape == (64,) and z["score_fake"].shape == (64,)
    loaded = pd.read_csv(csv_path, index_col=0)
    assert "acc_cal" in loaded.columns and len(loaded) == 3


@pytest.mark.slow
def test_end_to_end_authentication_task(tmp_path):
    """Train the tiny image game for a few steps, then run the full eval grid
    (gim/replay/rnd_src) from the checkpoint + args.json and check the CSV."""
    import pandas as pd

    from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
        OmniglotGIMDataSet,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.eval.authentication import (
        CSV_COLS,
        eval_authentication_task,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.models import image as imodels
    from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain
    from optimalstrategiesagainstgenerativeattacks_tpu.train.checkpoints import CheckpointIO
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
        ImageGameConfig,
        save_args,
    )
    from PIL import Image

    # tiny omniglot-layout dataset on disk
    root = tmp_path / "ds"
    rng = np.random.default_rng(0)
    for a in range(2):
        for c in range(2):
            d = root / "val" / f"A{a}" / f"c{c}"
            d.mkdir(parents=True)
            for i in range(8):
                arr = rng.integers(0, 255, (16, 16), dtype=np.uint8)
                Image.fromarray(arr).save(str(d / f"{i:03d}.png"))

    outdir = tmp_path / "exp"
    cfg = ImageGameConfig(
        outdir=str(outdir), batch_size=2, m=1, n=2, k=2, img_size=16,
        img_channels=1, style_dim=32, compute_dtype="float32",
    )
    save_args(cfg, str(outdir))
    au = imodels.get_au(16, 1, 32)
    im = imodels.get_im(16, 1, 32)
    state, opt_au, opt_im, _ = itrain.create_state(cfg, au, im, jax.random.PRNGKey(0))
    step_fn = itrain.make_train_step(cfg, au, im, opt_au, opt_im)
    batch = {
        k: rng.integers(0, 255, (2, s, 16, 16, 1), dtype=np.uint8)
        for k, s in (("real_sample", 2), ("leaked_sample", 1), ("si_sample", 2))
    }
    for _ in range(2):
        state, _, _ = step_fn(state, batch)
    cio = CheckpointIO(str(outdir / "ckpts"))
    cio.save(state, int(state.step))

    ds = OmniglotGIMDataSet(str(root), "val", img_channels=1, img_size=16,
                            m=1, n=2, si=2, example_cnt_per_class=2)
    csv_path = str(tmp_path / "results.csv")
    df = eval_authentication_task(
        ds=ds, m=1, n=2, k=2, batch_size=2, num_workers=0,
        gim_exp_dir=str(outdir), csv_file_path=csv_path,
    )
    assert os.path.exists(csv_path)
    assert list(df.columns) == list(CSV_COLS)
    assert set(df["im_type"]) == {"gim", "replay", "rnd_src"}
    assert df["auc"].between(0, 1).all()
    loaded = pd.read_csv(csv_path, index_col=0)
    assert len(loaded) == 3

    # --specific_model names a GIM checkpoint; a baseline authenticator in
    # the grid must fall back to its own latest checkpoint instead of
    # looking the GIM filename up in the baseline dir (the reference
    # crashes there, eval_gim_on_authentication.py:163-164)
    from optimalstrategiesagainstgenerativeattacks_tpu.baselines.training import (
        train_siamese,
    )

    ds_train_root = tmp_path / "ds2"
    for a in range(2):
        for c in range(2):
            d = ds_train_root / "train" / f"A{a}" / f"c{c}"
            d.mkdir(parents=True)
            for i in range(8):
                arr = rng.integers(0, 255, (16, 16), dtype=np.uint8)
                Image.fromarray(arr).save(str(d / f"{i:03d}.png"))
    siam_ds = OmniglotGIMDataSet(str(ds_train_root), "train", img_channels=1,
                                 img_size=16, m=1, n=2, si=2,
                                 example_cnt_per_class=2)
    siam_dir = tmp_path / "siam"
    train_siamese(
        dict(outdir=str(siam_dir), img_size=16, img_channels=1, lr=1e-3,
             batch_size=4, n_epochs=1, save_every=100, seed=1),
        siam_ds, progress=False,
    )
    gim_ckpt_name = sorted(os.listdir(outdir / "ckpts"))[-1]
    df2 = eval_authentication_task(
        ds=ds, m=1, n=2, k=2, batch_size=2, num_workers=0,
        gim_exp_dir=str(outdir), csv_file_path=str(tmp_path / "r2.csv"),
        specific_model=gim_ckpt_name,
        baseline_type="siamese", baseline_exp_dir=str(siam_dir),
    )
    assert len(df2) == 6
    assert set(df2["au_type"]) == {"gim", "siamese"}


def test_restore_honors_scan_adain_blocks(tmp_path):
    """args.json -> model-rebuild round trip with the NON-default unrolled
    AdaIN layout (``scan_adain_blocks=False``: params ``res_0..res_4``
    instead of stacked ``res_scan``) — VERDICT r2 weak-item 2."""
    from optimalstrategiesagainstgenerativeattacks_tpu.eval.authentication import (
        _restore_gim_state,
        get_gim_impersonator,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.models import image as imodels
    from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain
    from optimalstrategiesagainstgenerativeattacks_tpu.train.checkpoints import CheckpointIO
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
        ImageGameConfig,
        load_args,
        save_args,
    )

    outdir = tmp_path / "exp"
    cfg = ImageGameConfig(
        outdir=str(outdir), batch_size=2, m=1, n=2, k=2, img_size=16,
        img_channels=1, style_dim=32, compute_dtype="float32",
        scan_adain_blocks=False,
    )
    save_args(cfg, str(outdir))
    au = imodels.get_au(16, 1, 32)
    im = imodels.get_im(16, 1, 32, scan_adain_blocks=False)
    state, opt_au, opt_im, _ = itrain.create_state(cfg, au, im, jax.random.PRNGKey(0))
    assert "res_0" in state.params_im["img2img"]["adain_res_block"]
    cio = CheckpointIO(str(outdir / "ckpts"))
    ckpt_path = cio.save(state, 0)

    args_dict = load_args(str(outdir))
    assert args_dict["scan_adain_blocks"] is False
    _, _, im2, restored = _restore_gim_state(ckpt_path, args_dict)
    assert "res_0" in restored.params_im["img2img"]["adain_res_block"]
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(
            restored.params_im["img2img"]["adain_res_block"]["res_0"]["lin1_mean"]["kernel"])),
        np.asarray(jax.device_get(
            state.params_im["img2img"]["adain_res_block"]["res_0"]["lin1_mean"]["kernel"])),
    )
    # the full agent path must generate with the restored unrolled layout
    imp = get_gim_impersonator(ckpt_path, args_dict)
    leaked = np.random.default_rng(0).integers(
        0, 255, (2, 1, 16, 16, 1), dtype=np.uint8
    ).astype(np.float32) / 127.5 - 1.0
    fake = imp.act(leaked, 2)
    assert fake.shape == (2, 2, 16, 16, 1)
    assert np.isfinite(fake).all()

"""Scalar-tag taxonomy contract (SURVEY §5).

The reference mixes 'train_losses' with 'train losses' in its TB calls
(``gim_img_training.py:258`` vs ``:286``); tensorboardX sanitises spaces to
underscores, so the *effective* reference tags use underscores.  This build
uses one convention — underscores, everywhere, literally — and these tests
lock the full scalar-tag set of both training loops so the metric contract
can't drift again (VERDICT r2 weak-item 6).
"""

import numpy as np

from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
    GaussianGameConfig,
    ImageGameConfig,
)


class RecordingLogger:
    """Duck-typed Logger capturing every (category, key) scalar tag."""

    def __init__(self):
        self.tags = set()
        self.imgs = []

    def add_scalar(self, category, k, v, global_step):
        self.tags.add((category, k))
        assert np.isfinite(v), (category, k)

    def add_imgs(self, imgs, category, k, global_step, nrow=5):
        self.imgs.append((category, k))


class _SyntheticDS:
    def __init__(self, n_classes, cfg):
        self.cfg = cfg
        self.n_classes = n_classes
        self.example_cnt_per_class = 2
        self._rng = np.random.default_rng(0)

    def __len__(self):
        return self.n_classes * self.example_cnt_per_class

    def __getitem__(self, idx):
        return self.sample_episode(idx)

    def sample_episode(self, idx, rng=None):
        rng = rng or self._rng
        cfg = self.cfg

        def draw(s):
            return rng.integers(
                0, 255, (s, cfg.img_size, cfg.img_size, cfg.img_channels),
                dtype=np.uint8,
            )

        return {
            "real_sample": draw(cfg.n),
            "leaked_sample": draw(cfg.m),
            "si_sample": draw(cfg.k),
            "class": np.int32(idx % self.n_classes),
            "class_name": str(idx % self.n_classes),
        }


IMAGE_SCALAR_TAGS = {
    ("lr", "au"), ("lr", "im"), ("lr", "im_lm"),
    ("train_losses", "dis_loss"),
    ("train_losses", "dis_loss_on_real"),
    ("train_losses", "dis_loss_on_fake"),
    ("train_losses", "dis_reg"),
    ("train_losses", "gen_loss"),
    ("train_au_out", "au_out_on_real"),
    ("train_au_out", "au_out_on_fake"),
    ("train_accuracy", "dis_acc"),
    ("train_accuracy", "dis_acc_on_real"),
    ("train_accuracy", "dis_acc_on_fake"),
    ("perf", "train_steps_per_sec"),
    ("perf", "train_images_per_sec"),
    ("train-au_src_mean", "abs[real-si]"),
    ("train-au_src_mean", "abs[fake-si]"),
    ("train-au_env_mean", "abs[real-si]"),
    ("train-au_env_mean", "abs[fake-si]"),
    ("train-au_src_std", "real"),
    ("train-au_src_std", "si"),
    ("train-au_src_std", "fake"),
    ("train-au_env_std", "real"),
    ("train-au_env_std", "si"),
    ("train-au_env_std", "fake"),
    ("eval_losses", "dis_loss"),
    ("eval_losses", "dis_loss_on_real"),
    ("eval_losses", "dis_loss_on_fake"),
    ("eval_losses", "gen_loss"),
    ("eval_au_out", "au_out_on_real"),
    ("eval_au_out", "au_out_on_fake"),
    ("eval_accuracy", "dis_acc"),
    ("eval_accuracy", "dis_acc_on_real"),
    ("eval_accuracy", "dis_acc_on_fake"),
}

GAUSSIAN_SCALAR_TAGS = {
    ("train_losses", "im_loss"),
    ("train_losses", "au_loss"),
    ("train_losses", "au_loss_on_real"),
    ("train_losses", "au_loss_on_fake"),
    ("train_losses", "au_reg"),
    ("train_au_out", "au_out_on_real"),
    ("train_au_out", "au_out_on_fake"),
    ("train_accuracy", "au_acc"),
    ("train_accuracy", "au_acc_on_real"),
    ("train_accuracy", "au_acc_on_fake"),
    ("im_distances", "l1_dist_from_leaked_sample_mean"),
    ("im_distances", "l1_dist_from_gt_sample_mean"),
    ("im_distances", "l1_dist_from_gt_std"),
    ("real_distances", "l1_dist_from_gt_sample_mean"),
    ("real_distances", "l1_dist_from_gt_std"),
}


def _assert_no_spaces(tags):
    for cat, k in tags:
        assert " " not in cat and " " not in k, (cat, k)


def test_scalar_tag_taxonomy_image(tmp_path):
    from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain

    cfg = ImageGameConfig(
        outdir=str(tmp_path), batch_size=4, m=1, n=2, k=2, img_size=16,
        img_channels=1, style_dim=32, compute_dtype="float32", num_workers=0,
        n_epochs=1, log_every=2, log_enc_every=4, save_every=100,
        save_imgs_every=100, eval_every=4, ds_n_examples_per_cls=2,
    )
    logger = RecordingLogger()
    train_ds = _SyntheticDS(8, cfg)
    val_ds = _SyntheticDS(2, cfg)
    itrain.train_gim_imgs(cfg, train_ds, val_ds, logger=logger, progress=False)
    _assert_no_spaces(logger.tags)
    assert logger.tags == IMAGE_SCALAR_TAGS


def test_scalar_tag_taxonomy_gaussian(tmp_path):
    from optimalstrategiesagainstgenerativeattacks_tpu.train import gaussian as gtrain

    cfg = GaussianGameConfig(
        outdir=str(tmp_path), n_iters=4, batch_size=8, m=1, n=2, k=2,
        src_dim=2, save_every=100, save_stats_every=2, log_every=2,
    )
    logger = RecordingLogger()
    gtrain.train_gim_gaussian(cfg, logger=logger, progress=False)
    _assert_no_spaces(logger.tags)
    assert logger.tags == GAUSSIAN_SCALAR_TAGS

"""End-to-end tests for the image GIM game training stack (tiny models)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.models import image as imodels
from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import create_mesh
from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain
from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import ImageGameConfig

IMG, STYLE, C = 16, 32, 1


def _cfg(**kw):
    base = dict(
        batch_size=4, m=1, n=2, k=2, img_size=IMG, img_channels=C, style_dim=STYLE,
        compute_dtype="float32", num_workers=0,
    )
    base.update(kw)
    return ImageGameConfig(**base)


def _models(cfg):
    au = imodels.get_au(cfg.img_size, cfg.img_channels, cfg.style_dim)
    im = imodels.get_im(cfg.img_size, cfg.img_channels, cfg.style_dim,
                        use_img_att=cfg.use_img_att)
    return au, im


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    def draw(s):
        return rng.integers(0, 255, (cfg.batch_size, s, IMG, IMG, C), dtype=np.uint8)
    return {
        "real_sample": draw(cfg.n),
        "leaked_sample": draw(cfg.m),
        "si_sample": draw(cfg.k),
    }


@pytest.fixture()
def setup():
    # fresh state per test: the train step donates its input state
    cfg = _cfg()
    au, im = _models(cfg)
    state, opt_au, opt_im, scheds = itrain.create_state(cfg, au, im, jax.random.PRNGKey(0))
    return cfg, au, im, state, opt_au, opt_im


def test_train_step_updates_both_players(setup):
    cfg, au, im, state, opt_au, opt_im = setup
    # the step donates its input state: snapshot trees to host first
    a0 = jax.device_get(state.params_au)
    i0 = jax.device_get(state.params_im)
    s0 = jax.device_get(state.spectral_au)
    step_fn = itrain.make_train_step(cfg, au, im, opt_au, opt_im)
    new_state, metrics, fake = step_fn(state, _batch(cfg))
    assert int(new_state.step) == 0
    assert fake.shape == (cfg.batch_size, cfg.n, IMG, IMG, C)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics["im_trained"]) == 1.0

    def total_delta(old, new):
        return sum(
            float(np.abs(np.asarray(a) - np.asarray(b)).sum())
            for a, b in zip(jax.tree.leaves(old), jax.tree.leaves(new))
        )

    assert total_delta(a0, jax.device_get(new_state.params_au)) > 0
    assert total_delta(i0, jax.device_get(new_state.params_im)) > 0
    # spectral state advanced too
    assert total_delta(s0, jax.device_get(new_state.spectral_au)) > 0


def test_n_au_steps_gates_impersonator(setup):
    cfg0, au, im, state, *_ = setup
    cfg = _cfg(n_au_steps=2)
    opt_au, opt_im, _ = itrain.make_optimizers(cfg)
    state, opt_au, opt_im, _ = itrain.create_state(cfg, au, im, jax.random.PRNGKey(1))
    step_fn = itrain.make_train_step(cfg, au, im, opt_au, opt_im)
    def flat(tree):
        return np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(tree)])

    # step 0: (0+1) % 2 != 0 -> eval-mode im forward, no im update
    p0 = flat(jax.device_get(state.params_im))
    s1, m1, _ = step_fn(state, _batch(cfg, 1))
    assert float(m1["im_trained"]) == 0.0
    p1 = flat(jax.device_get(s1.params_im))
    np.testing.assert_array_equal(p0, p1)
    # step 1: trains
    s2, m2, _ = step_fn(s1, _batch(cfg, 2))
    assert float(m2["im_trained"]) == 1.0
    assert np.abs(p1 - flat(jax.device_get(s2.params_im))).max() > 0


def test_r1_penalty_image_game():
    cfg = _cfg(reg_param=2.0, batch_size=2)
    au, im = _models(cfg)
    state, opt_au, opt_im, _ = itrain.create_state(cfg, au, im, jax.random.PRNGKey(2))
    step_fn = itrain.make_train_step(cfg, au, im, opt_au, opt_im)
    _, metrics, _ = step_fn(state, _batch(cfg))
    assert float(metrics["au_reg"]) > 0.0
    assert np.isfinite(float(metrics["au_loss"]))


def test_eval_and_sample(setup):
    cfg, au, im, state, opt_au, opt_im = setup
    eval_fn = itrain.make_eval_step(cfg, au, im)
    metrics = eval_fn(state, _batch(cfg), jax.random.PRNGKey(3))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    sample_fn = itrain.make_sample_fn(cfg, im)
    leaked = _batch(cfg)["leaked_sample"][:1]
    fake = sample_fn(state, jnp.asarray(leaked), jax.random.PRNGKey(4))
    assert fake.shape == (1, cfg.n, IMG, IMG, C)
    assert float(jnp.abs(fake).max()) <= 1.0


def test_diag_fn(setup):
    cfg, au, im, state, opt_au, opt_im = setup
    diag = itrain.make_diag_fn(cfg, au)
    batch = _batch(cfg)
    fake = jnp.zeros((cfg.batch_size, cfg.n, IMG, IMG, C))
    d = diag(state, batch, fake)
    assert len(d) == 10
    assert all(np.isfinite(float(v)) for v in d.values())


def test_train_step_on_mesh(setup):
    cfg, au, im, _, _, _ = setup
    mesh = create_mesh()
    assert mesh.devices.size == 8
    cfg8 = _cfg(batch_size=8)
    state, opt_au, opt_im, _ = itrain.create_state(cfg8, au, im, jax.random.PRNGKey(5))
    step_fn = itrain.make_train_step(cfg8, au, im, opt_au, opt_im, mesh)
    from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import shard_batch

    batch = shard_batch(_batch(cfg8), mesh)
    new_state, metrics, _ = step_fn(state, batch)
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_full_image_training_entry(tmp_path, omniglot_like=None):
    """Tiny full run through train_gim_imgs with an in-memory synthetic ds."""
    import numpy as np

    class SyntheticDS:
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
                return rng.integers(0, 255, (s, cfg.img_size, cfg.img_size,
                                             cfg.img_channels), dtype=np.uint8)
            return {
                "real_sample": draw(cfg.n),
                "leaked_sample": draw(cfg.m),
                "si_sample": draw(cfg.k),
                "class": np.int32(idx % self.n_classes),
                "class_name": str(idx % self.n_classes),
            }

    cfg = _cfg(
        outdir=str(tmp_path), n_epochs=1, batch_size=4, log_every=2,
        log_enc_every=4, save_every=6, save_imgs_every=4, eval_every=4,
        ds_n_examples_per_cls=2,
    )
    train_ds = SyntheticDS(8, cfg)
    val_ds = SyntheticDS(2, cfg)
    state = itrain.train_gim_imgs(cfg, train_ds, val_ds, progress=False)
    assert int(state.step) == len(train_ds) // cfg.batch_size - 1
    assert os.path.isdir(os.path.join(str(tmp_path), "ckpts"))
    # image grids dumped under imgs/<category>/<k>/
    assert any("imgs_" in d for d in os.listdir(os.path.join(str(tmp_path), "imgs")))

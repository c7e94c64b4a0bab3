"""Seed-parallel training (train/multiseed.py): the vmapped step advances S
independent games exactly like S single-seed runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain
from optimalstrategiesagainstgenerativeattacks_tpu.train import multiseed
from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import ImageGameConfig

IMG, STYLE, C = 16, 32, 1
SEEDS = [3, 7]


def _cfg(**kw):
    base = dict(
        batch_size=4, m=1, n=2, k=2, img_size=IMG, img_channels=C, style_dim=STYLE,
        compute_dtype="float32", num_workers=0,
    )
    base.update(kw)
    return ImageGameConfig(**base)


def _batch(cfg, seed):
    rng = np.random.default_rng(seed)

    def draw(s):
        return rng.integers(0, 255, (cfg.batch_size, s, IMG, IMG, C), dtype=np.uint8)

    return {
        "real_sample": draw(cfg.n),
        "leaked_sample": draw(cfg.m),
        "si_sample": draw(cfg.k),
    }


def _tree_allclose(a, b, rtol, atol, what=""):
    flat_a, _ = jax.tree_util.tree_flatten_with_path(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, xa), xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(xa, np.float32), np.asarray(xb, np.float32),
            rtol=rtol, atol=atol,
            err_msg=f"{what}{jax.tree_util.keystr(path)}",
        )


def _single_run(cfg, seed, batches):
    au, im = itrain.build_models(cfg)
    state, opt_au, opt_im, _ = itrain.create_state(cfg, au, im, jax.random.PRNGKey(seed))
    step_fn = itrain.make_train_step(cfg, au, im, opt_au, opt_im)
    metrics = None
    for b in batches:
        state, metrics, _ = step_fn(state, b)
    return state, metrics


def test_multiseed_matches_independent_runs():
    cfg = _cfg()
    au, im = itrain.build_models(cfg)
    n_steps = 2
    # seed-distinct batch streams, shared across both executions
    streams = {s: [_batch(cfg, 100 * s + t) for t in range(n_steps)] for s in SEEDS}

    ms_state, opt_au, opt_im, _ = multiseed.create_multiseed_state(cfg, au, im, SEEDS)
    assert multiseed.n_seeds(ms_state) == len(SEEDS)
    step_fn = multiseed.make_multiseed_train_step(cfg, au, im, opt_au, opt_im)
    for t in range(n_steps):
        stacked = multiseed.stack_batches([streams[s][t] for s in SEEDS])
        ms_state, ms_metrics, fake = step_fn(ms_state, stacked)
    assert fake.shape == (len(SEEDS), cfg.batch_size, cfg.n, IMG, IMG, C)

    for i, s in enumerate(SEEDS):
        ref_state, ref_metrics = _single_run(cfg, s, streams[s])
        got = multiseed.slice_seed(ms_state, i)
        assert int(got.step) == int(ref_state.step) == n_steps - 1
        # vmap relays identical math through batched/grouped kernels; f32
        # reassociation differs and Adam's divide amplifies it on
        # near-zero grads, so tight-but-not-exact (2 steps from init
        # keeps the generator-path chaos bounded)
        _tree_allclose(got.params_au, ref_state.params_au, 5e-3, 5e-5,
                       f"seed{s} params_au")
        _tree_allclose(got.params_im, ref_state.params_im, 5e-3, 5e-5,
                       f"seed{s} params_im")
        _tree_allclose(got.spectral_au, ref_state.spectral_au, 1e-3, 1e-4,
                       f"seed{s} spectral_au")
        for kname in ("au_loss", "au_acc", "im_loss"):
            np.testing.assert_allclose(
                float(ms_metrics[kname][i]), float(ref_metrics[kname]),
                rtol=1e-3, atol=1e-3, err_msg=f"seed{s} {kname}")


def test_slice_stack_roundtrip():
    cfg = _cfg()
    au, im = itrain.build_models(cfg)
    ms_state, *_ = multiseed.create_multiseed_state(cfg, au, im, SEEDS)
    rebuilt = multiseed.stack_states(
        [multiseed.slice_seed(ms_state, i) for i in range(len(SEEDS))]
    )
    for a, b in zip(jax.tree.leaves(ms_state), jax.tree.leaves(rebuilt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_seed_lr_scales_updates():
    """set_injected_lr gives each seed its own LR.  With identical seeds and
    identical batches the two vmapped lanes compute identical gradients, so
    each first-step Adam update must scale exactly by the LR ratio — and the
    impersonator's separately-scheduled noise-mapper group (not patched)
    must move identically in both lanes."""
    lrs_au = [1e-4, 1e-3]
    lrs_im = [2e-4, 5e-4]
    cfg = _cfg()
    au, im = itrain.build_models(cfg)
    batch = _batch(cfg, 7)

    ms_state, opt_au, opt_im, _ = multiseed.create_multiseed_state(
        cfg, au, im, [5, 5]  # identical init: only the LRs differ
    )
    init_au = jax.device_get(ms_state.params_au)
    init_im = jax.device_get(ms_state.params_im)
    ms_state = multiseed.set_injected_lr(ms_state, "au", lrs_au)
    ms_state = multiseed.set_injected_lr(ms_state, "im", lrs_im)
    step_fn = multiseed.make_multiseed_train_step(cfg, au, im, opt_au, opt_im)
    ms_state, _, _ = step_fn(ms_state, multiseed.stack_batches([batch, batch]))

    def updates(new, old, i):
        return np.concatenate([
            (np.asarray(a, np.float32)[i] - np.asarray(b, np.float32)).ravel()
            for a, b in zip(jax.tree.leaves(new), jax.tree.leaves(old))
        ])

    # Mask well above f32 cancellation noise: updates are read back as
    # (new - old) with old ~O(1e-1) params, so differences below ~1e-8 are
    # rounding, not signal (first-step Adam updates are ~lr except where the
    # gradient is ~0, where the ratio is meaningless anyway).
    du = [updates(ms_state.params_au, init_au, i) for i in range(2)]
    mask = np.abs(du[0]) > 1e-6
    assert mask.any()
    np.testing.assert_allclose(
        du[1][mask] / du[0][mask], lrs_au[1] / lrs_au[0], rtol=2e-2,
        err_msg="au updates must scale by the per-seed LR ratio")

    flat_new, _ = jax.tree_util.tree_flatten_with_path(ms_state.params_im)
    flat_old = jax.tree.leaves(init_im)
    for (path, a), b in zip(flat_new, flat_old):
        d0 = np.asarray(a, np.float32)[0] - np.asarray(b, np.float32)
        d1 = np.asarray(a, np.float32)[1] - np.asarray(b, np.float32)
        m = np.abs(d0).ravel() > 1e-6
        if not m.any():
            continue
        is_noise = "env_noise_mapper" in jax.tree_util.keystr(path)
        want = 1.0 if is_noise else lrs_im[1] / lrs_im[0]
        np.testing.assert_allclose(
            d1.ravel()[m] / d0.ravel()[m], want, rtol=2e-2,
            err_msg=f"im update ratio {jax.tree_util.keystr(path)}")


def test_set_injected_lr_requires_injected_state():
    cfg = _cfg(milestones=[10])  # baked schedule: nothing injected
    au, im = itrain.build_models(cfg)
    ms_state, *_ = multiseed.create_multiseed_state(cfg, au, im, SEEDS)
    with pytest.raises(ValueError):
        multiseed.set_injected_lr(ms_state, "au", [1e-4, 1e-3])

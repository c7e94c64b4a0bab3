"""Unit tests for sample statistics (ops/stats.py, nn/stats.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.nn import stats as nnstats
from optimalstrategiesagainstgenerativeattacks_tpu.ops import stats as ops_stats


def test_custom_std_matches_unbiased_numpy():
    x = np.random.default_rng(0).normal(size=(4, 7, 3)).astype(np.float32)
    got = ops_stats.custom_std(jnp.asarray(x))
    want = np.sqrt(x.var(axis=1, ddof=1) + 1e-8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_custom_std_zero_for_single_sample():
    x = jnp.ones((4, 1, 3))
    got = ops_stats.custom_std(x)
    assert got.shape == (4, 3)
    assert np.all(np.asarray(got) == 0.0)


def test_logvar_stat():
    x = np.random.default_rng(1).normal(size=(2, 5, 3)).astype(np.float32)
    got = ops_stats.logvar_stat(jnp.asarray(x))
    want = np.log(x.var(axis=1, ddof=1) + 1e-8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3)


@pytest.mark.parametrize(
    "cls,n_stats",
    [
        (nnstats.MeanStat, 1),
        (nnstats.StdStat, 1),
        (nnstats.LogVarStat, 1),
        (nnstats.MeanStdStat, 2),
        (nnstats.MeanLogVarStat, 2),
    ],
)
def test_paramfree_stat_shapes(cls, n_stats, rng):
    x = jnp.ones((4, 5, 8))
    mod = cls()
    assert mod.n_stats == n_stats
    out = mod.apply({}, x)
    assert out.shape == (4, 8 * n_stats)


def test_fc_stat_shapes(rng):
    x = jax.random.normal(rng, (4, 5, 8))
    mod = nnstats.FCStat(style_dim=8, n_stats=3, hidden_layers=(16,))
    variables = mod.init(rng, x)
    out = mod.apply(variables, x)
    assert out.shape == (4, 24)


def test_double_fc_stat_shapes(rng):
    x = jax.random.normal(rng, (4, 5, 8))
    mod = nnstats.DoubleFCStat(style_dim=8, n_stats=2, hidden_layers1=(16,), hidden_layers2=(16,))
    variables = mod.init(rng, x)
    out = mod.apply(variables, x)
    assert out.shape == (4, 16)


def test_mean_std_fc_stat_shapes(rng):
    # the image authenticator's stat: fc_n_stats=2 (gim_img_models.py:454)
    x = jax.random.normal(rng, (4, 5, 8))
    mod = nnstats.MeanStdFcStat(style_dim=8, fc_n_stats=2, fc_hidden_layers=(16, 24, 16))
    assert mod.n_stats == 4
    variables = mod.init(rng, x)
    out = mod.apply(variables, x)
    assert out.shape == (4, 32)


def test_stats_permutation_invariance(rng):
    x = jax.random.normal(rng, (2, 6, 4))
    perm = jax.random.permutation(rng, 6)
    mod = nnstats.MeanStdFcStat(style_dim=4, fc_n_stats=1)
    variables = mod.init(rng, x)
    a = mod.apply(variables, x)
    b = mod.apply(variables, x[:, perm])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

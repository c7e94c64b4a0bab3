"""Pallas kernel parity tests (interpreter mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.ops.adain import ada_in
from optimalstrategiesagainstgenerativeattacks_tpu.ops.pallas.adain_pallas import (
    ada_in_pallas,
)
from optimalstrategiesagainstgenerativeattacks_tpu.ops.pallas.attention_pallas import (
    _reference_core,
    self_attention_pallas,
)


def test_adain_pallas_forward_parity(rng):
    x = jax.random.normal(rng, (3, 8, 8, 16))
    mean_s = jax.random.normal(jax.random.fold_in(rng, 1), (3, 16))
    std_s = jax.random.normal(jax.random.fold_in(rng, 2), (3, 16))
    want = ada_in(x, mean_s, std_s)
    got = ada_in_pallas(x, mean_s, std_s, 1e-5, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_adain_pallas_grad_parity(rng):
    x = jax.random.normal(rng, (2, 4, 4, 8))
    mean_s = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8))
    std_s = jax.random.normal(jax.random.fold_in(rng, 2), (2, 8))

    def loss_ref(x, m, s):
        return (ada_in(x, m, s) ** 2).sum()

    def loss_pallas(x, m, s):
        return (ada_in_pallas(x, m, s, 1e-5, True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, mean_s, std_s)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, mean_s, std_s)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3)


def test_attention_pallas_forward_parity(rng):
    f = jax.random.normal(rng, (2, 16, 4))
    g = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 4))
    h = jax.random.normal(jax.random.fold_in(rng, 2), (2, 16, 8))
    want = _reference_core(f, g, h)
    got = self_attention_pallas(f, g, h, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_attention_pallas_grad_matches_reference(rng):
    f = jax.random.normal(rng, (1, 8, 4))
    g = jax.random.normal(jax.random.fold_in(rng, 1), (1, 8, 4))
    h = jax.random.normal(jax.random.fold_in(rng, 2), (1, 8, 4))

    g_ref = jax.grad(lambda *a: (_reference_core(*a) ** 2).sum(), argnums=(0, 1, 2))(f, g, h)
    g_pal = jax.grad(
        lambda *a: (self_attention_pallas(*a, True) ** 2).sum(), argnums=(0, 1, 2)
    )(f, g, h)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-4)

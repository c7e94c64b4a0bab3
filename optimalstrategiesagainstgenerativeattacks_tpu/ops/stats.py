"""Permutation-invariant sample statistics over the episode ("set") axis.

The GIM authenticator pools each encoded sample (axis 1 of a
``[batch, sample_size, latent]`` tensor) with permutation-invariant
statistics.  Capability parity with the reference stat modules
(``models/gim_basic_models.py:20-172``) and the safe-std helper
(``models/model_blocks.py:41-48``), expressed as pure functions: the set
axes are tiny (m, n, k <= 20) so these are VPU reductions that XLA fuses
into the surrounding matmuls — no kernels needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def mean_stat(x: jnp.ndarray) -> jnp.ndarray:
    """[batch, sample, latent] -> [batch, latent] sample mean."""
    return x.mean(axis=1)


def custom_std(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Safe sample std over axis 1: sqrt(unbiased var + eps); zeros when sample_size == 1.

    Mirrors ``model_blocks.custom_std``: torch ``var`` defaults to the
    unbiased (N-1) estimator, and a sample of size one yields exactly zero
    (the unbiased estimator is undefined there).  ``sample_size`` is a
    static shape so the branch resolves at trace time.
    """
    sample_size = x.shape[1]
    if sample_size > 1:
        var = x.var(axis=1, ddof=1)
        return jnp.sqrt(var + eps)
    batch = x.shape[0]
    return jnp.zeros((batch, *x.shape[2:]), dtype=x.dtype)


def std_stat(x: jnp.ndarray) -> jnp.ndarray:
    """[batch, sample, latent] -> [batch, latent] safe sample std."""
    return custom_std(x)


def logvar_stat(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """[batch, sample, latent] -> [batch, latent] log of (unbiased var + eps)."""
    return jnp.log(x.var(axis=1, ddof=1) + eps)


def mean_std_stat(x: jnp.ndarray) -> jnp.ndarray:
    """Concat of mean and safe std along the latent axis (n_stats=2)."""
    return jnp.concatenate([mean_stat(x), std_stat(x)], axis=-1)


def mean_logvar_stat(x: jnp.ndarray) -> jnp.ndarray:
    """Concat of mean and log-variance along the latent axis (n_stats=2)."""
    return jnp.concatenate([mean_stat(x), logvar_stat(x)], axis=-1)

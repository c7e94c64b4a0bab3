"""Gaussian GIM game models (synthetic workload matching the paper's theory).

Parity with ``models/gim_gaussian_models.py``:

  * Authenticator = stat-pooling discriminator: concat(stat(test), stat(si))
    -> MLP((2*n_stats*d, d, 2d, 1)) with kaiming init (:17-41, :102-107).
  * Impersonator = mean of leaked sample + MLP-mapped noise with optional
    noise-mean removal (:66-89, :95-99).

The reference's ``GIMGaussianImpersonator`` also constructs an ``out_mlp``
(:73) that its forward never uses; since it never receives gradient signal
it is omitted here (parameter-count divergence only, no behavioural one).

RNG is functional: the impersonator draws its noise via the ``noise``
stream (``apply(..., rngs={'noise': key})``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from optimalstrategiesagainstgenerativeattacks_tpu.nn.blocks import MLP
from optimalstrategiesagainstgenerativeattacks_tpu.nn.init import kaiming_normal, zeros_init
from optimalstrategiesagainstgenerativeattacks_tpu.nn.stats import MeanStdStat


class GIMGaussianDis(nn.Module):
    """Stat-pooling discriminator (``GIMGaussianDis:17-41``)."""

    src_dim: int
    stat: nn.Module
    dtype: Optional[Any] = None
    hidden_scale: int = 1  # TPU extra: widens the head (reference width = 1)

    def setup(self):
        d = self.src_dim
        s = self.hidden_scale
        self.mlp = MLP(
            (self.stat.n_stats * d * 2, s * d, 2 * s * d, 1),
            kernel_init=kaiming_normal(0.2),
            bias_init=zeros_init,
            dtype=self.dtype,
        )

    def __call__(self, test_sample, si_sample):
        """([B, n, d], [B, k, d]) -> [B, 1] logit."""
        test_stat = self.stat(test_sample)
        si_stat = self.stat(si_sample)
        x = jnp.concatenate([test_stat, si_stat], axis=-1)
        return self.mlp(x)


class GIMGaussianAuthenticator(nn.Module):
    """Thin wrapper over the discriminator (``GIMGaussianAuthenticator:47-60``)."""

    dis: nn.Module

    def __call__(self, test_sample, si_sample):
        return self.dis(test_sample=test_sample, si_sample=si_sample)


class GIMGaussianImpersonator(nn.Module):
    """Mean-of-leaked + mapped noise attacker (``GIMGaussianImpersonator:66-89``)."""

    src_dim: int
    env_noise_mapper: nn.Module

    def __call__(self, leaked_sample, n: int, remove_noise_mean: bool = True,
                 z: Optional[jnp.ndarray] = None):
        """[B, m, d] -> [B, n, d] fake sample."""
        batch_size, m, src_dim = leaked_sample.shape
        src = leaked_sample.mean(axis=1)  # [B, d]

        if z is None:
            z = jax.random.normal(
                self.make_rng("noise"), (batch_size, n, self.src_dim), leaked_sample.dtype
            )
        w = self.env_noise_mapper(z)  # [B, n, d]

        if remove_noise_mean:
            x = w - w.mean(axis=1, keepdims=True) + src[:, None, :]
        else:
            x = w + src[:, None, :]
        return x


def get_im(src_dim: int) -> GIMGaussianImpersonator:
    """Factory matching ``gim_gaussian_models.get_im:95-99`` (1-layer MLP mapper)."""
    env_noise_mapper = MLP([src_dim, src_dim])
    return GIMGaussianImpersonator(src_dim=src_dim, env_noise_mapper=env_noise_mapper)


def get_au(
    src_dim: int,
    stat_type: str = "mean_std",
    hidden_scale: int = 1,
) -> GIMGaussianAuthenticator:
    """Factory matching ``gim_gaussian_models.get_au:102-107`` (MeanStd stat).

    TPU-build extras (defaults reproduce the reference exactly):
      * ``stat_type``: 'mean_std' (reference) or 'mean_std_fc' — adds a
        learned per-element DeepSets feature (``GIMMeanStdFcStat:152-172``)
        so the pooled representation can carry quadratic statistics the
        optimal d>1 test needs.
      * ``hidden_scale``: widens the discriminator MLP hidden layers
        (d, 2d) -> (scale*d, 2*scale*d).  The reference-width MLP at d=10
        plateaus ~0.033 below the closed-form Nash value (STATUS.md); the
        equilibrium gap is a capacity limit of the head, not an
        optimisation defect.
    """
    from optimalstrategiesagainstgenerativeattacks_tpu.nn.stats import MeanStdFcStat

    if stat_type == "mean_std":
        stat = MeanStdStat()
    elif stat_type == "mean_std_fc":
        stat = MeanStdFcStat(
            style_dim=src_dim, fc_n_stats=2,
            fc_hidden_layers=(4 * src_dim, 4 * src_dim),
        )
    else:
        raise ValueError(f"unknown stat_type: {stat_type}")
    dis = GIMGaussianDis(src_dim=src_dim, stat=stat, hidden_scale=hidden_scale)
    return GIMGaussianAuthenticator(dis=dis)

"""Sample-statistic modules (parameterised set pooling).

Parity with ``models/gim_basic_models.py:20-172``.  Parameter-free stats
are plain functions in ``ops.stats``; the modules here carry MLP
parameters.  Every module exposes ``n_stats`` (output width multiplier)
matching the reference contract used by the discriminator MLPs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from optimalstrategiesagainstgenerativeattacks_tpu.nn.blocks import MLP
from optimalstrategiesagainstgenerativeattacks_tpu.ops.stats import (
    custom_std,
    logvar_stat,
    mean_stat,
)


class MeanStat(nn.Module):
    """[B, S, D] -> [B, D] mean (``GIMMeanStat:20-34``)."""

    n_stats: int = 1

    def __call__(self, x):
        return mean_stat(x)


class StdStat(nn.Module):
    """[B, S, D] -> [B, D] safe std (``GIMStdStat:37-51``)."""

    n_stats: int = 1

    def __call__(self, x):
        return custom_std(x)


class LogVarStat(nn.Module):
    """[B, S, D] -> [B, D] log-variance (``GIMLogVarStat:54-68``)."""

    n_stats: int = 1

    def __call__(self, x):
        return logvar_stat(x)


class MeanStdStat(nn.Module):
    """mean ++ std (``GIMMeanStdStat:71-89``); n_stats=2."""

    n_stats: int = 2

    def __call__(self, x):
        return jnp.concatenate([mean_stat(x), custom_std(x)], axis=-1)


class MeanLogVarStat(nn.Module):
    """mean ++ logvar (``GIMMeanLogVarStat:92-110``); n_stats=2."""

    n_stats: int = 2

    def __call__(self, x):
        return jnp.concatenate([mean_stat(x), logvar_stat(x)], axis=-1)


class FCStat(nn.Module):
    """MLP per element then mean over the sample axis (``GIMFCStat:113-127``)."""

    style_dim: int
    n_stats: int = 1
    hidden_layers: Sequence[int] = ()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        dims = [self.style_dim, *self.hidden_layers, self.n_stats * self.style_dim]
        h = MLP(dims, dtype=self.dtype, name="stat")(x)
        return mean_stat(h)


class DoubleFCStat(nn.Module):
    """MLP -> mean -> MLP (``GIMDoubleFCStat:130-149``)."""

    style_dim: int
    n_stats: int = 1
    hidden_layers1: Sequence[int] = ()
    hidden_layers2: Sequence[int] = ()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        dims1 = [self.style_dim, *self.hidden_layers1, self.n_stats * self.style_dim]
        dims2 = [
            self.n_stats * self.style_dim,
            *self.hidden_layers2,
            self.n_stats * self.style_dim,
        ]
        h = MLP(dims1, dtype=self.dtype, name="stat1")(x)
        h = mean_stat(h)
        return MLP(dims2, dtype=self.dtype, name="stat2")(h)


class MeanStdFcStat(nn.Module):
    """mean ++ std ++ FC-stat (``GIMMeanStdFcStat:152-172``).

    The image authenticator's pooling stat (constructed with fc_n_stats=2
    and hidden (2s, 3s, 2s) at ``gim_img_models.py:454``).
    n_stats = 2 + fc_n_stats.
    """

    style_dim: int
    fc_n_stats: int = 2
    fc_hidden_layers: Sequence[int] = ()
    dtype: Optional[Any] = None

    @property
    def n_stats(self) -> int:
        return 2 + self.fc_n_stats

    @nn.compact
    def __call__(self, x):
        x1 = mean_stat(x)
        x2 = custom_std(x)
        x3 = FCStat(
            style_dim=self.style_dim,
            n_stats=self.fc_n_stats,
            hidden_layers=self.fc_hidden_layers,
            dtype=self.dtype,
            name="fc",
        )(x)
        return jnp.concatenate([x1, x2, x3], axis=-1)

"""Evaluation agents: authenticator/impersonator wrappers + naive attackers.

Parity with ``authentication_eval/agents.py``: an ``Authenticator`` wraps a
score function and threshold (default 0); an ``Impersonator`` wraps a
generation function; the two baseline attackers are the replay attacker
(repeat a random leaked image n times, :46-50) and the random-source
attacker (real sample of a random other dataset item, :53-62).

All tensors are NHWC numpy/jax arrays in [-1, 1] (samples [B, S, H, W, C]).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


class Authenticator:
    """Score-function agent: act -> (score, pred = score >= th)."""

    def __init__(self, au_model_func: Callable, th: float = 0.0):
        self.au_model_func = au_model_func
        self.th = th

    def act(self, test_sample, si_sample):
        out = self.au_model_func(test_sample=test_sample, si_sample=si_sample)
        out = np.asarray(out)
        pred = (out >= self.th).astype(np.int64)
        return out, pred


class Impersonator:
    """Generation-function agent: act(leaked, n) -> fake sample."""

    def __init__(self, im_model_func: Callable):
        self.im_model_func = im_model_func

    def act(self, leaked_sample, n: int):
        return self.im_model_func(leaked_sample=leaked_sample, n=n)


def replay_impersonator(leaked_sample, n: int, rng: Optional[np.random.Generator] = None):
    """Repeat one random leaked image n times per batch element."""
    rng = rng or np.random.default_rng()
    leaked = np.asarray(leaked_sample)
    m = leaked.shape[1]
    picks = [leaked[:, rng.integers(m)][:, None] for _ in range(n)]
    return np.concatenate(picks, axis=1)


def rand_source_impersonator(
    leaked_sample, n: int, gim_ds, rng: Optional[np.random.Generator] = None,
    normalize: bool = True,
):
    """Real sample of a random OTHER dataset item per batch element.

    ``gim_ds`` episodes are uint8; with ``normalize`` the result is shifted
    to [-1, 1] to match model space.
    """
    rng = rng or np.random.default_rng()
    batch_size = np.asarray(leaked_sample).shape[0]
    fakes = []
    for _ in range(batch_size):
        idx = int(rng.integers(len(gim_ds)))
        real = gim_ds[idx]["real_sample"].astype(np.float32)
        if normalize:
            real = real / 127.5 - 1.0
        fakes.append(real)
    fake = np.stack(fakes, axis=0)
    assert fake.shape[1] == n
    return fake

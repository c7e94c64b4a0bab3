"""GAN losses and the R1 gradient penalty, as pure functions.

Parity targets: the per-sample BCE-with-logits GAN loss
(``gim_img_trainer.py:90-94`` / ``gim_gaussian_trainer.py:78-82``, built
with ``reduce=False`` then meaned after the DataParallel gather) and the
R1-style penalty ``compute_grad2`` (``training/utils.py:115-124``), which
in torch is a double-backward; in JAX it is grad-of-grad through a jitted
closure.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Per-sample binary cross-entropy with logits against a constant target.

    Numerically stable form; returns the loss with the trailing singleton
    logit axis squeezed (matching the reference's ``loss.squeeze()``).
    """
    l = logits.astype(jnp.float32)
    t = jnp.float32(target)
    loss = jnp.maximum(l, 0.0) - l * t + jnp.log1p(jnp.exp(-jnp.abs(l)))
    return loss.squeeze(-1)


def gan_accuracy(out_on_real: jnp.ndarray, out_on_fake: jnp.ndarray):
    """(acc, acc_on_real, acc_on_fake) with pred = logit >= 0 (reference
    ``torch.ge(out, 0)`` convention)."""
    pred_real = (out_on_real >= 0).astype(jnp.float32)
    pred_fake = (out_on_fake >= 0).astype(jnp.float32)
    acc_on_real = pred_real.mean()
    acc_on_fake = (1.0 - pred_fake).mean()
    return 0.5 * (acc_on_real + acc_on_fake), acc_on_real, acc_on_fake


def grad2_penalty(
    score_fn: Callable[..., jnp.ndarray], inputs: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Per-sample squared gradient norm of ``sum(score_fn(*inputs))`` w.r.t.
    every input (R1 penalty, ``compute_grad2``).

    ``score_fn`` maps the inputs to per-sample scores [B, 1]; the result is
    [B].  Differentiable (the outer optimisation sees grad-of-grad).
    """
    inputs = tuple(inputs)

    def summed(*xs):
        return score_fn(*xs).sum()

    grads = jax.grad(summed, argnums=tuple(range(len(inputs))))(*inputs)
    batch = inputs[0].shape[0]
    total = jnp.zeros((batch,), jnp.float32)
    for g in grads:
        total = total + jnp.square(g.astype(jnp.float32)).reshape(batch, -1).sum(axis=1)
    return total

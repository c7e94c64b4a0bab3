"""Train state: the single pytree threaded through the jitted game step.

Replaces the reference's trainer-as-nn.Module + CheckpointIO registry +
GlobalStep counter (``gim_img_trainer.py:20-77``,
``training/utils.py:15-33``): both agents' params, both optimizer states,
the spectral-norm state, and the step counter live in one
``flax.struct`` dataclass that is donated to the train step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GameState:
    """Full mutable state of a GIM game (both players)."""

    step: jnp.ndarray  # int32 scalar; mirrors GlobalStep (starts at -1, pre-incremented)
    params_au: Any
    params_im: Any
    spectral_au: Any  # spectral-norm u/v vectors (empty dict for the gaussian game)
    spectral_im: Any
    opt_au: Any
    opt_im: Any
    rng: jax.Array

    @property
    def global_step(self) -> jnp.ndarray:
        return self.step


def num_parameters(tree: Any) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(tree))

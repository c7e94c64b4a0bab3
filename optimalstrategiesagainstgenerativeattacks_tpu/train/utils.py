"""Training utilities (parity with ``training/utils.py`` C14).

The torch-specific pieces map to functional equivalents:
  * ``GlobalStep``            -> ``GameState.step`` (train/state.py)
  * ``DataParallelMock``      -> the 8-device CPU host mesh (tests/conftest.py)
  * ``get_device``            -> JAX device/mesh selection (parallel/mesh.py)
  * ``compute_grad2``         -> ``losses.grad2_penalty`` (grad-of-grad)
  * ``save_args/load_args``   -> utils/config.py
  * ``get_latest_ckpt``       -> train/checkpoints.py
  * ``adjust_batch_size``     -> parallel/mesh.py
  * ``clones``                -> parameters are pytrees; ``jax.tree.map(jnp.copy, p)``

Implemented here: the EMA accumulator (``accumulate:96-101``), linear
interpolation (``lin_interpulation:87-88``), and freeze/unfreeze as an
optax gradient mask (the JAX analogue of flipping ``requires_grad``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def accumulate(params_ema: Any, params: Any, decay: float = 0.999) -> Any:
    """Polyak/EMA update: ema <- decay * ema + (1 - decay) * params."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), params_ema, params
    )


def lin_interpolation(a, b, t):
    """a + (b - a) * t, leafwise over pytrees or arrays."""
    if isinstance(a, (jnp.ndarray,)) or not jax.tree.leaves(a):
        return a + (b - a) * t
    return jax.tree.map(lambda x, y: x + (y - x) * t, a, b)


def freeze_mask(params: Any, predicate: Callable[[tuple], bool]) -> Any:
    """Boolean mask tree: True where ``predicate(path)`` says FROZEN."""
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    mask = {path: bool(predicate(path)) for path in flat}
    return flax.traverse_util.unflatten_dict(mask)


def freeze(optimizer: optax.GradientTransformation, frozen_mask: Any):
    """Wrap an optimizer so masked-True parameters receive zero updates
    (the functional analogue of ``freeze_module`` / ``unfreeze_module``)."""
    return optax.multi_transform(
        {"frozen": optax.set_to_zero(), "trainable": optimizer},
        jax.tree.map(lambda frozen: "frozen" if frozen else "trainable", frozen_mask),
    )


def num_parameters(tree: Any) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(tree))

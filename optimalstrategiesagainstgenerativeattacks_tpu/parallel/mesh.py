"""Device mesh, shardings, and the SPMD story of the framework.

The reference's only parallelism is single-process ``nn.DataParallel``
(replicate module, scatter batch, gather losses —
``gim_img_training.py:407-411``).  The TPU-native replacement (SURVEY
§2.3):

  * a ``Mesh`` with axes ``('data', 'model')`` laid out over ICI;
  * batches sharded over ``data`` (NamedSharding ``P('data')``); gradient
    and metric all-reduces are emitted automatically by XLA's SPMD
    partitioner from the replicated-parameter jit — the pmean/psum ride
    ICI, no NCCL analogue needed;
  * optionally, wide parameter matrices (the discriminator-head MLPs and
    the style linears at style_dim=512) tensor-shard their output
    dimension over ``model`` — XLA inserts the matching all-gathers /
    reduce-scatters.  ``model_parallel=1`` (pure DP) is the default and is
    sufficient for parity (models are tens of M params).

``adjust_batch_size`` preserves the reference's divisibility contract
(``training/utils.py:167-171``).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices=None, model_parallel: int = 1, data_axis: str = "data", model_axis: str = "model"
) -> Mesh:
    """Create a ('data', 'model') mesh over the given (or all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (data_axis, model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params: Any, mesh: Mesh, min_size: int = 1024) -> Any:
    """Sharding tree for a param pytree: tensor-shard the trailing axis of
    large matrices over the ``model`` axis when divisible; replicate
    everything else.  With a model axis of size 1 this is pure DP."""
    model_axis = mesh.axis_names[1]
    model_size = mesh.shape[model_axis]

    def rule(p):
        if (
            model_size > 1
            and p.ndim >= 2
            and p.shape[-1] >= min_size
            and p.shape[-1] % model_size == 0
        ):
            spec = [None] * (p.ndim - 1) + [model_axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with the leading axis sharded over data."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def constrain_data(x, mesh: Optional[Mesh]):
    """Inside-jit sharding constraint: leading axis over data (no-op without a mesh)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, batch_sharding(mesh))


def adjust_batch_size(ds_length: int, curr_batch_size: int, n_devices: int) -> int:
    """Largest batch <= min(batch, ds_length) divisible by n_devices
    (``training/utils.py:167-171``)."""
    batch_size = min(curr_batch_size, ds_length)
    batch_size = int(n_devices * math.floor(batch_size / n_devices))
    assert batch_size % n_devices == 0 and batch_size > 0
    return batch_size

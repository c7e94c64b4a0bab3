"""SPMD correctness: sharded execution must match single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np

from optimalstrategiesagainstgenerativeattacks_tpu.models import gaussian as gmodels
from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import (
    adjust_batch_size,
    batch_sharding,
    create_mesh,
    param_shardings,
    shard_batch,
)
from optimalstrategiesagainstgenerativeattacks_tpu.train import gaussian as gtrain
from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import GaussianGameConfig


def test_mesh_step_matches_single_device():
    """The data-parallel gaussian step must produce the same params and
    metrics as the unsharded step (same rng, same synthesised batch)."""
    cfg = GaussianGameConfig(batch_size=64, src_dim=2, m=1, n=4, k=4)
    au = gmodels.get_au(cfg.src_dim)
    im = gmodels.get_im(cfg.src_dim)

    state1, oa, oi = gtrain.create_state(cfg, au, im, jax.random.PRNGKey(0))
    state2, _, _ = gtrain.create_state(cfg, au, im, jax.random.PRNGKey(0))

    single = gtrain.make_train_fn(cfg, au, im, oa, oi, mesh=None, n_steps=3)
    mesh = create_mesh()
    sharded = gtrain.make_train_fn(cfg, au, im, oa, oi, mesh=mesh, n_steps=3)

    s1, m1 = single(state1)
    s2, m2 = sharded(state2)
    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m2[k]), rtol=5e-4, atol=1e-5, err_msg=k
        )
    for a, b in zip(jax.tree.leaves(s1.params_au), jax.tree.leaves(s2.params_au)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_param_shardings_tensor_parallel():
    mesh = create_mesh(model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    params = {
        "big": jnp.zeros((64, 2048)),
        "small": jnp.zeros((64, 8)),
        "vec": jnp.zeros((2048,)),
    }
    sh = param_shardings(params, mesh, min_size=1024)
    assert sh["big"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["vec"].spec == jax.sharding.PartitionSpec()


def test_shard_batch_places_on_mesh():
    mesh = create_mesh()
    batch = {"x": np.zeros((16, 3), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding == batch_sharding(mesh)


def test_adjust_batch_size():
    assert adjust_batch_size(1000, 128, 8) == 128
    assert adjust_batch_size(100, 128, 8) == 96
    assert adjust_batch_size(9, 128, 8) == 8

"""Shape-grouped optimizer stacking (``ops/packing.py``): exactness tests.

Stacking same-shape leaves before the Adam elementwise ops is a pure memory
permutation; the wrapped optimizer must match the plain one to within 1-2
f32 ulp (XLA's fused 1/sqrt rewrite is the only program-shape-dependent
op) — including under ``optax.multi_transform`` (MaskedNode leaves) and
with milestone (piecewise-constant) schedules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.models import image as imodels
from optimalstrategiesagainstgenerativeattacks_tpu.ops.packing import (
    _pack,
    _unpack,
    stack_same_shape,
)
from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain
from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import ImageGameConfig


def _tree(seed=0):
    """A pytree with repeated shapes (grouped), unique shapes (singletons),
    and mixed dtypes."""
    r = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(r.normal(size=s), jnp.float32)
    return {
        "a": {"w": mk(3, 4), "b": mk(4)},
        "c": {"w": mk(3, 4), "b": mk(4)},
        "solo": mk(2, 5, 7),
        "scale": mk(4),
        "halfp": jnp.asarray(r.normal(size=(4,)), jnp.bfloat16),
    }


def test_pack_unpack_roundtrip():
    t = _tree()
    packed, meta = _pack(t)
    # the three f32 (4,) leaves share one stacked group; bf16 (4,) is separate
    shapes = sorted(tuple(v.shape) for v in packed.values())
    assert (3, 4) in shapes  # stacked group of the three (4,) f32 leaves
    back = _unpack(packed, meta)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(x, y), t, back)


@pytest.mark.parametrize("schedule", ["constant", "milestones"])
def test_stacked_adam_matches_plain(schedule):
    if schedule == "constant":
        lr = optax.constant_schedule(1e-3)
    else:
        lr = optax.piecewise_constant_schedule(1e-3, {2: 0.3})
    params = _tree(0)
    plain = optax.adam(lr, b1=0.9, b2=0.999)
    stacked = stack_same_shape(optax.adam(lr, b1=0.9, b2=0.999))
    s_p, s_s = plain.init(params), stacked.init(params)

    @jax.jit
    def step(params, s_p, s_s, seed):
        grads = jax.tree.map(
            lambda x: jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(7), seed),
                                        x.shape, x.dtype), params)
        u_p, s_p = plain.update(grads, s_p, params)
        u_s, s_s = stacked.update(grads, s_s, params)
        return u_p, u_s, s_p, s_s

    for i in range(4):
        u_p, u_s, s_p, s_s = step(params, s_p, s_s, i)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=3e-7, atol=1e-9),
            u_p, u_s)
        params = optax.apply_updates(params, u_p)


def test_stacked_under_multi_transform():
    params = {"main": _tree(1), "noise": {"w": jnp.ones((4,)), "v": jnp.ones((3, 4))}}
    labels = lambda p: {"main": jax.tree.map(lambda _: "main", p["main"]),
                        "noise": jax.tree.map(lambda _: "noise", p["noise"])}
    mk = lambda wrap: optax.multi_transform(
        {"main": wrap(optax.adam(1e-3)), "noise": wrap(optax.adam(1e-4))}, labels)
    plain, stacked = mk(lambda o: o), mk(stack_same_shape)
    s_p, s_s = plain.init(params), stacked.init(params)
    grads = jax.tree.map(lambda x: x * 0.1 + 1.0, params)
    for _ in range(3):
        u_p, s_p = plain.update(grads, s_p, params)
        u_s, s_s = stacked.update(grads, s_s, params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=3e-7, atol=1e-9),
            u_p, u_s)


def test_image_game_step_with_stack_opt_matches():
    """Two real train steps: stack_opt=True matches False to f32 tolerance."""
    kw = dict(batch_size=2, m=1, n=2, k=2, img_size=16, img_channels=1,
              style_dim=32, compute_dtype="float32", num_workers=0)
    r = np.random.default_rng(3)
    batch = {
        "real_sample": r.integers(0, 255, (2, 2, 16, 16, 1), dtype=np.uint8),
        "leaked_sample": r.integers(0, 255, (2, 1, 16, 16, 1), dtype=np.uint8),
        "si_sample": r.integers(0, 255, (2, 2, 16, 16, 1), dtype=np.uint8),
    }
    results = []
    for stack in (False, True):
        cfg = ImageGameConfig(stack_opt=stack, **kw)
        au = imodels.get_au(cfg.img_size, cfg.img_channels, cfg.style_dim)
        im = imodels.get_im(cfg.img_size, cfg.img_channels, cfg.style_dim)
        state, opt_au, opt_im, _ = itrain.create_state(cfg, au, im, jax.random.PRNGKey(0))
        step_fn = itrain.make_train_step(cfg, au, im, opt_au, opt_im)
        for seed in (0, 1):
            state, metrics, _ = step_fn(state, batch)
        results.append((jax.device_get(state.params_au), jax.device_get(state.params_im)))
    for a, b in zip(results[0], results[1]):
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=5e-5, atol=1e-6), a, b)

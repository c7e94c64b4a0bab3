"""Encoder rematerialisation (``Encoder.remat``): identical outputs AND
gradients from the same variables, in both the vmapped and unrolled pair
layouts — remat changes only what the backward pass stores, never the math
or the parameter/checkpoint layout."""

import jax
import jax.numpy as jnp
import numpy as np

from optimalstrategiesagainstgenerativeattacks_tpu.models.image import EncoderPair

IMG, STYLE, C = 16, 32, 1


def _pair(**kw):
    return EncoderPair(img_size=IMG, img_channels=C, style_dim=STYLE, **kw)


def test_remat_identity_outputs_and_grads():
    base = _pair()
    rem = _pair(remat=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, IMG, IMG, C))
    v = jax.jit(base.init)(jax.random.PRNGKey(0), x)
    vr = jax.jit(rem.init)(jax.random.PRNGKey(0), x)
    # same init: remat does not move variables
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vr)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), v, vr)

    def loss(mod):
        def f(params, x):
            s, e = mod.apply({**v, "params": params}, x)
            return (s.astype(jnp.float32).sum() + (e.astype(jnp.float32) ** 2).sum())
        return f

    (l0, g0x), g0p = (
        jax.jit(jax.value_and_grad(loss(base), argnums=1))(v["params"], x),
        jax.jit(jax.grad(loss(base), argnums=0))(v["params"], x),
    )
    (l1, g1x), g1p = (
        jax.jit(jax.value_and_grad(loss(rem), argnums=1))(v["params"], x),
        jax.jit(jax.grad(loss(rem), argnums=0))(v["params"], x),
    )
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0x), np.asarray(g1x), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g0p), jax.tree.leaves(g1p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_remat_identity_unrolled_pair():
    base = _pair(unroll_pair=True)
    rem = _pair(unroll_pair=True, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, IMG, IMG, C))
    v = jax.jit(base.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, x: base.apply(v, x))(v, x)
    out_r = jax.jit(lambda v, x: rem.apply(v, x))(v, x)
    for a, b in zip(out, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_remat_depth_identity():
    """Depth-limited remat (first N blocks only) is the same math too."""
    base = _pair()
    rem = _pair(remat=True, remat_depth=1)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, IMG, IMG, C))
    v = jax.jit(base.init)(jax.random.PRNGKey(0), x)

    def loss(mod):
        def f(params):
            s, e = mod.apply({**v, "params": params}, x)
            return s.astype(jnp.float32).sum() + (e.astype(jnp.float32) ** 2).sum()
        return f

    g0 = jax.jit(jax.grad(loss(base)))(v["params"])
    g1 = jax.jit(jax.grad(loss(rem)))(v["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_remat_grad_of_grad():
    """The R1 penalty differentiates the authenticator score twice; remat
    must compose with vjp-of-vjp."""
    rem = _pair(remat=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, IMG, IMG, C))
    v = jax.jit(rem.init)(jax.random.PRNGKey(0), x)

    def score(x):
        s, e = rem.apply(v, x)
        return (s.astype(jnp.float32).sum() + e.astype(jnp.float32).sum())

    def sq_grad(x):
        return (jax.grad(score)(x).astype(jnp.float32) ** 2).sum()

    g2 = jax.jit(jax.grad(sq_grad))(x)
    assert np.isfinite(np.asarray(g2)).all()
    base = _pair()

    def score_b(x):
        s, e = base.apply(v, x)
        return (s.astype(jnp.float32).sum() + e.astype(jnp.float32).sum())

    g2b = jax.jit(jax.grad(lambda x: (jax.grad(score_b)(x).astype(jnp.float32) ** 2).sum()))(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2b), rtol=1e-4, atol=1e-5)

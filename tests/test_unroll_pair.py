"""Unrolled src/env encoder pair (``EncoderPair.unroll_pair``).

The unrolled path must (a) leave the parameter/checkpoint layout EXACTLY as
the vmapped path (init goes through the same nn.vmap), and (b) produce the
same outputs from the same variables, for both players, to f32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.models.image import (
    EncoderPair,
    get_au,
    get_im,
)

IMG, STYLE, C = 16, 32, 1


def _same_tree(a, b):
    ta, tb = jax.tree_util.tree_structure(a), jax.tree_util.tree_structure(b)
    assert ta == tb
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(x, y), a, b)


def test_encoder_pair_unrolled_matches_vmapped():
    pv = EncoderPair(img_size=IMG, img_channels=C, style_dim=STYLE)
    pu = EncoderPair(img_size=IMG, img_channels=C, style_dim=STYLE, unroll_pair=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, IMG, IMG, C))
    v = jax.jit(pv.init)(jax.random.PRNGKey(0), x)
    vu = jax.jit(pu.init)(jax.random.PRNGKey(0), x)
    _same_tree(v, vu)  # init identical: same layout AND values
    sv, ev = jax.jit(lambda v, x: pv.apply(v, x))(v, x)
    su, eu = jax.jit(lambda v, x: pu.apply(v, x))(v, x)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(su), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(eu), rtol=1e-5, atol=1e-5)


def test_unrolled_pair_rejects_update_sn():
    pu = EncoderPair(img_size=IMG, img_channels=C, style_dim=STYLE, unroll_pair=True)
    x = jnp.zeros((2, IMG, IMG, C))
    v = jax.jit(pu.init)(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="unroll_pair"):
        pu.apply(v, x, True, mutable=["spectral"])


def test_au_forward_matches_across_unroll():
    au_v = get_au(IMG, C, STYLE)
    au_u = get_au(IMG, C, STYLE, unroll_encoder_pair=True)
    test = jax.random.normal(jax.random.PRNGKey(2), (2, 3, IMG, IMG, C))
    si = jax.random.normal(jax.random.PRNGKey(3), (2, 2, IMG, IMG, C))
    v = jax.jit(au_v.init)(jax.random.PRNGKey(0), test, si)
    out_v = jax.jit(lambda v: au_v.apply(v, test, si))(v)
    out_u = jax.jit(lambda v: au_u.apply(v, test, si))(v)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_u), rtol=1e-5, atol=1e-5)


def test_im_forward_matches_across_unroll():
    """Unroll equivalence inside the impersonator.

    The ENCODER outputs must match to f32 tolerance from the im's own
    variable tree.  The full generated image is NOT compared bitwise: the
    untrained generator's instance norms chaotically amplify f32
    reassociation differences between any two program layouts (divergence
    up to ~5e-2 was measured even between the monolithic and split steps,
    see STATUS round-3 log), so the end-to-end contract here is
    shape/finiteness, with the numerics pinned at the encoder boundary.
    """
    im_v = get_im(IMG, C, STYLE)
    im_u = get_im(IMG, C, STYLE, unroll_encoder_pair=True)
    leaked = jax.random.normal(jax.random.PRNGKey(4), (2, 1, IMG, IMG, C))
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 3, STYLE))
    k = jax.random.PRNGKey(0)
    v = jax.jit(lambda k: im_v.init({"params": k, "noise": k}, leaked, 3))(k)

    enc_vars = {col: t["encoders"] for col, t in v.items() if "encoders" in t}
    pv = EncoderPair(img_size=IMG, img_channels=C, style_dim=STYLE)
    pu = EncoderPair(img_size=IMG, img_channels=C, style_dim=STYLE, unroll_pair=True)
    x = leaked.reshape(2, IMG, IMG, C)
    sv, ev = jax.jit(lambda v_, x_: pv.apply(v_, x_))(enc_vars, x)
    su, eu = jax.jit(lambda v_, x_: pu.apply(v_, x_))(enc_vars, x)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(su), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(eu), rtol=1e-5, atol=1e-5)

    out_v = jax.jit(lambda v: im_v.apply(v, leaked, 3, z=z))(v)
    out_u = jax.jit(lambda v: im_u.apply(v, leaked, 3, z=z))(v)
    assert out_u.shape == out_v.shape
    assert bool(jnp.isfinite(out_u).all())

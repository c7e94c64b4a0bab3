"""Channel-split img2img input (``GIMFaceImpersonator.split_gen_input``).

conv(concat(a, b), K) must equal conv(a, K[:, :, :Ca]) + conv(b, K[:, :, Ca:])
exactly (linear algebra on kernel slices); the split path exists so XLA can
drop the input-gradient convolution of the no-grad leaked channels (see
nn.blocks.SNConv).  Contract: (a) identical init layout AND values, (b) the
same outputs from the same variables to f32 reassociation tolerance, at the
SNConv / ResBlockDown / Img2ImgDownModule levels, (c) the full impersonator
forward stays shape-correct and finite (the untrained generator's instance
norms chaotically amplify f32 sum-order differences downstream, so the
end-to-end image is not compared bitwise — same policy as
tests/test_unroll_pair.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from optimalstrategiesagainstgenerativeattacks_tpu.models.image import (
    Img2ImgDownModule,
    get_im,
)
from optimalstrategiesagainstgenerativeattacks_tpu.nn.blocks import ResBlockDown, SNConv

IMG, STYLE, C = 16, 32, 1


def _same_tree(a, b):
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(x, y), a, b)


def _parts(key, b=3, h=8, w=8, c1=2, c2=3):
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (b, h, w, c1))
    bb = jax.random.normal(kb, (b, h, w, c2))
    return a, bb


def test_snconv_tuple_matches_concat():
    a, b = _parts(jax.random.PRNGKey(0))
    cat = jnp.concatenate([a, b], axis=-1)
    conv = SNConv(7, kernel_size=3, padding=1)
    v_cat = jax.jit(conv.init)(jax.random.PRNGKey(1), cat)
    v_tup = jax.jit(conv.init)(jax.random.PRNGKey(1), (a, b))
    _same_tree(v_cat, v_tup)  # same params/state from either input form
    y_cat = jax.jit(lambda v: conv.apply(v, cat))(v_cat)
    y_tup = jax.jit(lambda v: conv.apply(v, (a, b)))(v_cat)
    np.testing.assert_allclose(np.asarray(y_cat), np.asarray(y_tup), rtol=1e-5, atol=1e-6)


def test_resblockdown_tuple_matches_concat():
    a, b = _parts(jax.random.PRNGKey(2))
    cat = jnp.concatenate([a, b], axis=-1)
    blk = ResBlockDown(16, conv_size=3, padding=1)
    v = jax.jit(blk.init)(jax.random.PRNGKey(3), cat)
    v_tup = jax.jit(blk.init)(jax.random.PRNGKey(3), (a, b))
    _same_tree(v, v_tup)
    y_cat = jax.jit(lambda v_: blk.apply(v_, cat))(v)
    y_tup = jax.jit(lambda v_: blk.apply(v_, (a, b)))(v)
    np.testing.assert_allclose(np.asarray(y_cat), np.asarray(y_tup), rtol=1e-5, atol=1e-6)


def test_img2img_down_module_tuple_matches_concat():
    a, b = _parts(jax.random.PRNGKey(4), b=2, h=IMG, w=IMG, c1=1, c2=1)
    cat = jnp.concatenate([a, b], axis=-1)
    mod = Img2ImgDownModule(img_size=IMG, img_channels=2, style_dim=STYLE)
    v = jax.jit(mod.init)(jax.random.PRNGKey(5), cat)
    v_tup = jax.jit(mod.init)(jax.random.PRNGKey(5), (a, b))
    _same_tree(v, v_tup)
    y_cat = jax.jit(lambda v_: mod.apply(v_, cat))(v)
    y_tup = jax.jit(lambda v_: mod.apply(v_, (a, b)))(v)
    np.testing.assert_allclose(np.asarray(y_cat), np.asarray(y_tup), rtol=2e-4, atol=2e-4)


def test_im_split_gen_input_init_and_forward():
    im_s = get_im(IMG, C, STYLE)  # split on by default
    im_c = get_im(IMG, C, STYLE, split_gen_input=False)
    leaked = jax.random.normal(jax.random.PRNGKey(6), (2, 1, IMG, IMG, C))
    z = jax.random.normal(jax.random.PRNGKey(7), (2, 3, STYLE))
    k = jax.random.PRNGKey(0)
    v_s = jax.jit(lambda k_: im_s.init({"params": k_, "noise": k_}, leaked, 3))(k)
    v_c = jax.jit(lambda k_: im_c.init({"params": k_, "noise": k_}, leaked, 3))(k)
    _same_tree(v_s, v_c)  # checkpoint layout/value identical across the knob
    out_s = jax.jit(lambda v: im_s.apply(v, leaked, 3, z=z))(v_c)
    out_c = jax.jit(lambda v: im_c.apply(v, leaked, 3, z=z))(v_c)
    assert out_s.shape == out_c.shape
    assert bool(jnp.isfinite(out_s).all())

    # the split path's gradients must flow to every impersonator param
    def loss(v, mod):
        return jnp.square(mod.apply(v, leaked, 3, z=z)).mean()

    g = jax.jit(lambda v: jax.grad(lambda p: loss({"params": p, **{c: t for c, t in v.items() if c != "params"}}, im_s))(v["params"]))(v_c)
    leaves = jax.tree.leaves(jax.tree.map(lambda x: jnp.abs(x).sum(), g))
    assert all(bool(jnp.isfinite(l)) for l in leaves)
    assert sum(float(l) for l in leaves) > 0.0

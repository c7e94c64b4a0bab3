"""Shape/semantics tests for the block library, mirroring the reference's
inline tests (model_blocks.py:871-924) plus spectral-norm behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.nn import blocks
from optimalstrategiesagainstgenerativeattacks_tpu.ops.adain import ada_in, instance_norm
from optimalstrategiesagainstgenerativeattacks_tpu.ops.image_ops import (
    avg_pool2d,
    blur3x3,
    upscale2d,
)


def test_ada_in_shapes_and_stats(rng):
    x = jax.random.normal(rng, (2, 8, 8, 3))
    mean_s = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
    std_s = jnp.array([[2.0, 1.0, 0.5], [1.0, 1.0, 1.0]])
    y = ada_in(x, mean_s, std_s)
    assert y.shape == x.shape
    got_mean = np.asarray(y.mean(axis=(1, 2)))
    np.testing.assert_allclose(got_mean, np.asarray(mean_s), atol=1e-3)


def test_instance_norm_zero_mean_unit_var(rng):
    x = jax.random.normal(rng, (2, 8, 8, 3)) * 5 + 2
    y = instance_norm(x)
    np.testing.assert_allclose(np.asarray(y.mean(axis=(1, 2))), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y.var(axis=(1, 2))), 1.0, atol=1e-2)


def test_upscale2d_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upscale2d(x, 2)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(y[0, :2, :4, 0]), [[0, 0, 1, 1], [0, 0, 1, 1]])


def test_avg_pool2d():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = avg_pool2d(x, 2)
    assert y.shape == (1, 2, 2, 1)
    assert float(y[0, 0, 0, 0]) == pytest.approx((0 + 1 + 4 + 5) / 4)


def test_blur3x3_preserves_constant():
    x = jnp.ones((1, 8, 8, 3)) * 2.0
    y = blur3x3(x)
    assert y.shape == x.shape
    # interior pixels of a constant image stay constant under a normalised blur
    np.testing.assert_allclose(np.asarray(y[:, 1:-1, 1:-1, :]), 2.0, rtol=1e-5)


def test_mlp_shapes(rng):
    mlp = blocks.MLP([512, 512, 512, 512, 512, 4])
    x = jax.random.normal(rng, (2, 5, 512))
    v = mlp.init(rng, x)
    assert mlp.apply(v, x).shape == (2, 5, 4)


def test_res_block_down(rng):
    m = blocks.ResBlockDown(16)
    x = jax.random.normal(rng, (2, 8, 8, 4))
    v = m.init(rng, x)
    out, muts = m.apply(v, x, True, mutable=["spectral"])
    assert out.shape == (2, 4, 4, 16)


def test_res_block_up(rng):
    m = blocks.ResBlockUp(8)
    x = jax.random.normal(rng, (2, 1, 1, 16))
    v = m.init(rng, x)
    out = m.apply(v, x)
    assert out.shape == (2, 2, 2, 8)


def test_self_attention_identity_at_init(rng):
    # gamma starts at 0 so the block is an identity at init (SelfAttention:529)
    m = blocks.SelfAttention()
    x = jax.random.normal(rng, (2, 4, 4, 16))
    v = m.init(rng, x)
    out = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_img_attention(rng):
    # mirrors test_img_attention (model_blocks.py:909-917) at reduced size
    m = blocks.ImgAttention(img1_channels=3)
    x1 = jax.random.normal(rng, (2, 16, 16, 3))
    x2 = jax.random.normal(rng, (2, 16, 16, 8))
    v = m.init(rng, x1, x2)
    out = m.apply(v, x1, x2)
    assert out.shape == (2, 16, 16, 3)


def test_ada_res_block2(rng):
    m = blocks.AdaResBlock2(channels=16, style_dim=8)
    x = jax.random.normal(rng, (2, 4, 4, 16))
    s = jax.random.normal(rng, (2, 8))
    v = m.init(rng, x, s)
    assert m.apply(v, x, s).shape == x.shape


def test_ada_res_block_up2(rng):
    m = blocks.AdaResBlockUp2(in_channels=16, out_channels=8)
    x = jax.random.normal(rng, (2, 4, 4, 16))
    s = jax.random.normal(rng, (2, 8))
    v = m.init(rng, x, s)
    assert m.apply(v, x, s).shape == (2, 8, 8, 8)


def test_legacy_ada_res_blocks(rng):
    x = jax.random.normal(rng, (2, 4, 4, 16))
    s1 = jax.random.normal(rng, (2, 32))
    m = blocks.AdaResBlock()
    v = m.init(rng, x, s1, s1)
    assert m.apply(v, x, s1, s1).shape == x.shape

    up = blocks.AdaResBlockUp(out_channels=8)
    s2 = jax.random.normal(rng, (2, 16))
    v = up.init(rng, x, s1, s2)
    assert up.apply(v, x, s1, s2).shape == (2, 8, 8, 8)

    d = blocks.ResBlockD()
    v = d.init(rng, x)
    assert d.apply(v, x).shape == x.shape


def test_sg_kit_shapes(rng):
    style = jax.random.normal(rng, (2, 8))
    x = jax.random.normal(rng, (2, 4, 4, 16))

    dec = blocks.SGDecoderBlock(out_channels=8)
    v = dec.init({"params": rng, "noise": rng}, x, style, style)
    out = dec.apply(v, x, style, style, rngs={"noise": rng})
    assert out.shape == (2, 8, 8, 8)

    enc = blocks.SGEncoderBlock(out_channels1=8, out_channels2=8, style_dim=8)
    v = enc.init(rng, x)
    h, s1, s2 = enc.apply(v, x)
    assert h.shape == (2, 2, 2, 8) and s1.shape == (2, 8) and s2.shape == (2, 8)

    dis = blocks.SGDisBlock(out_channels1=8, out_channels2=8)
    v = dis.init(rng, x)
    assert dis.apply(v, x).shape == (2, 2, 2, 8)

    cib = blocks.SGConstInputBlock(channels=16, init_img_size=4)
    v = cib.init({"params": rng, "noise": rng}, style, style)
    assert cib.apply(v, style, style, rngs={"noise": rng}).shape == (2, 4, 4, 16)

    toi = blocks.SGToImgBlock(img_channels=3)
    v = toi.init(rng, x)
    assert toi.apply(v, x).shape == (2, 4, 4, 3)

    froi = blocks.SGFromImgBlock(out_channels=16)
    v = froi.init(rng, jnp.ones((2, 4, 4, 3)))
    assert froi.apply(v, jnp.ones((2, 4, 4, 3))).shape == (2, 4, 4, 16)


def test_res_mlps(rng):
    x = jax.random.normal(rng, (2, 8))
    m = blocks.ResMLP([8, 16, 8])
    v = m.init(rng, x)
    assert m.apply(v, x).shape == (2, 8)
    m2 = blocks.ResMLP2([8, 16, 8])
    v2 = m2.init(rng, x)
    assert m2.apply(v2, x).shape == (2, 8)
    # replay init: skip linear becomes near-identity on the style block
    newp = blocks.init_resmlp_to_replay(v["params"], style_dim=8, key=rng)
    w = np.asarray(newp["linear"]["kernel"])
    np.testing.assert_allclose(np.diag(w[:8, :8]), 1.0, atol=1e-2)


def test_spectral_norm_normalises_kernel(rng):
    """After many power iterations, the effective kernel has unit top
    singular value (torch spectral_norm semantics)."""
    m = blocks.SNConv(features=8, kernel_size=3, padding=1)
    x = jax.random.normal(rng, (1, 4, 4, 4))
    v = m.init(rng, x)
    state = v
    apply_fn = jax.jit(
        lambda s, x: m.apply(
            {"params": s["params"], "spectral": s["spectral"]}, x, True,
            mutable=["spectral"],
        )
    )
    for _ in range(50):
        _, muts = apply_fn(state, x)
        state = {"params": state["params"], "spectral": muts["spectral"]}
    kernel = np.asarray(state["params"]["kernel"])
    w = kernel.transpose(3, 2, 0, 1).reshape(8, -1)
    u = np.asarray(state["spectral"]["u"])
    vvec = np.asarray(state["spectral"]["v"])
    sigma = u @ w @ vvec
    true_sigma = np.linalg.svd(w, compute_uv=False)[0]
    assert sigma == pytest.approx(true_sigma, rel=1e-3)


def test_spectral_norm_eval_does_not_mutate(rng):
    m = blocks.SNConv(features=4, kernel_size=1)
    x = jax.random.normal(rng, (1, 4, 4, 4))
    v = m.init(rng, x)
    # eval path works without mutable collections
    out = m.apply(v, x, False)
    assert out.shape == (1, 4, 4, 4)


def test_snconv_folded_upscale_matches_explicit(rng):
    """SNConv(upscale=2) == SNConv(upscale2d(x)) exactly (algebraic fold of
    nearest upsampling into the conv kernel; blocks._fold_kernel_for_upscale2)."""
    from optimalstrategiesagainstgenerativeattacks_tpu.ops.image_ops import upscale2d

    for ks, pad in ((3, 1), (9, 4)):
        m_ref = blocks.SNConv(features=6, kernel_size=ks, padding=pad)
        m_fold = blocks.SNConv(features=6, kernel_size=ks, padding=pad, upscale=2)
        x = jax.random.normal(jax.random.fold_in(rng, ks), (2, 5, 5, 4))
        v = m_ref.init(rng, upscale2d(x))  # same param shapes for both modules
        ref = m_ref.apply(v, upscale2d(x), False)
        out = m_fold.apply(v, x, False)
        assert out.shape == ref.shape == (2, 10, 10, 6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_snconv_folded_downscale_matches_explicit(rng):
    """SNConv(downscale=2) == avg_pool2d(SNConv(x)) exactly (algebraic fold of
    2x2 average pooling into a stride-2 conv; blocks._fold_kernel_for_downscale2)."""
    from optimalstrategiesagainstgenerativeattacks_tpu.ops.image_ops import avg_pool2d

    for ks, pad in ((3, 1), (9, 4)):
        m_ref = blocks.SNConv(features=6, kernel_size=ks, padding=pad)
        m_fold = blocks.SNConv(features=6, kernel_size=ks, padding=pad, downscale=2)
        x = jax.random.normal(jax.random.fold_in(rng, 100 + ks), (2, 12, 12, 4))
        v = m_ref.init(rng, x)  # same param shapes for both modules
        ref = avg_pool2d(m_ref.apply(v, x, False))
        out = m_fold.apply(v, x, False)
        assert out.shape == ref.shape == (2, 6, 6, 6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pool_conv_commutation_exact(rng):
    """1x1 conv commutes with avg-pool / nearest-upsample (the ResBlock skip
    reordering): conv(pool(x)) == pool(conv(x)) and up(conv(x)) == conv(up(x))."""
    from optimalstrategiesagainstgenerativeattacks_tpu.ops.image_ops import (
        avg_pool2d,
        upscale2d,
    )

    m = blocks.SNConv(features=6, kernel_size=1, padding=0)
    x = jax.random.normal(rng, (2, 8, 8, 4))
    v = m.init(rng, x)
    np.testing.assert_allclose(
        np.asarray(m.apply(v, avg_pool2d(x), False)),
        np.asarray(avg_pool2d(m.apply(v, x, False))),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(upscale2d(m.apply(v, x, False))),
        np.asarray(m.apply(v, upscale2d(x), False)),
        atol=1e-5,
    )


def test_snconv_im2col_matches_conv(rng):
    """SNConv(im2col=True) == the lax.conv lowering on the same params —
    the dense-matmul path for tiny spatial maps (4x4 AdaIN res stage) is a
    pure implementation toggle, identical params/checkpoints."""
    m_ref = blocks.SNConv(features=8, kernel_size=3, padding=1)
    m_mat = blocks.SNConv(features=8, kernel_size=3, padding=1, im2col=True)
    x = jax.random.normal(jax.random.fold_in(rng, 7), (6, 4, 4, 8))
    v = m_ref.init(rng, x)
    ref = m_ref.apply(v, x, False)
    out = m_mat.apply(v, x, False)
    assert out.shape == ref.shape == (6, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # gradients agree too (the backward runs through slice-adds, not conv)
    g_ref = jax.grad(lambda p: (m_ref.apply({**v, "params": p}, x, False) ** 2).sum())(v["params"])
    g_mat = jax.grad(lambda p: (m_mat.apply({**v, "params": p}, x, False) ** 2).sum())(v["params"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_mat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


# ---------------------------------------------------------------------------
# Matmul lowerings for MXU-hostile conv geometries (round 3):
# blocks._conv2d_auto can dispatch 1x1 / small-in_ch / small-out_ch stride-1
# convs to exact matmul formulations.  Measured SLOWER end-to-end on the chip
# (see the evidence block above _conv1x1_matmul) so the flags default OFF;
# these tests force them on and identity-pin every lowering against lax.conv,
# including gradients and the grad-of-grad the R1 penalty needs, so the
# opt-in knobs stay correct.
# ---------------------------------------------------------------------------


@pytest.fixture(autouse=False)
def lowerings_on(monkeypatch):
    monkeypatch.setattr(blocks, "_L_1X1", True)
    monkeypatch.setattr(blocks, "_L_IM2COL", True)
    monkeypatch.setattr(blocks, "_L_SMALL_COUT", True)


def _ref_conv(x, k, stride=1, padding=0):
    return blocks._conv2d(x, k, stride, padding, None)


@pytest.mark.parametrize(
    "ci,co,ks,pad",
    [
        (1, 128, 9, 4),   # encoder / img2img entry conv (small in_ch)
        (3, 64, 9, 4),    # vox entry conv
        (128, 1, 9, 4),   # to-image conv (small out_ch)
        (64, 2, 3, 1),    # small out_ch, 3x3
        (1, 1, 3, 1),     # last up-block conv_r2
        (256, 32, 1, 0),  # attention C/8 1x1 projection
        (4, 6, 1, 0),     # 1x1, both small
    ],
)
def test_conv2d_auto_matches_lax_conv(rng, lowerings_on, ci, co, ks, pad):
    kx, kk = jax.random.split(rng)
    x = jax.random.normal(kx, (2, 12, 12, ci), jnp.float32)
    k = jax.random.normal(kk, (ks, ks, ci, co), jnp.float32) / ks
    out = blocks._conv2d_auto(x, k, 1, pad, None)
    ref = _ref_conv(x, k, 1, pad)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("ci,co,ks,pad", [(1, 16, 9, 4), (24, 1, 9, 4)])
def test_conv2d_auto_gradients_match(rng, lowerings_on, ci, co, ks, pad):
    """d/dx and d/dk of the matmul lowerings == those of lax.conv."""
    kx, kk, kg = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (2, 10, 10, ci), jnp.float32)
    k = jax.random.normal(kk, (ks, ks, ci, co), jnp.float32) / ks
    cot = jax.random.normal(kg, (2, 10, 10, co), jnp.float32)

    def loss(fn, x, k):
        return (fn(x, k) * cot).sum()

    gx_a, gk_a = jax.grad(
        lambda x, k: loss(lambda a, b: blocks._conv2d_auto(a, b, 1, pad, None), x, k),
        argnums=(0, 1),
    )(x, k)
    gx_r, gk_r = jax.grad(
        lambda x, k: loss(lambda a, b: _ref_conv(a, b, 1, pad), x, k), argnums=(0, 1)
    )(x, k)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_r), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk_a), np.asarray(gk_r), atol=3e-4)


def test_conv2d_auto_grad_of_grad(rng, lowerings_on):
    """The lowerings are plain jnp ops, so the R1 grad-of-grad path (second
    differentiation through the entry convs) must work and match lax.conv."""
    kx, kk = jax.random.split(rng)
    x = jax.random.normal(kx, (2, 8, 8, 1), jnp.float32)
    k = jax.random.normal(kk, (3, 3, 1, 16), jnp.float32) / 3

    def make_penalty(fn):
        def score(x, k):
            return (fn(x, k, 1, 1, None) ** 2).sum()

        def penalty(k):
            g = jax.grad(score, argnums=0)(x, k)
            return (g ** 2).sum()

        return penalty

    p_a = make_penalty(blocks._conv2d_auto)
    p_r = make_penalty(blocks._conv2d)
    np.testing.assert_allclose(float(p_a(k)), float(p_r(k)), rtol=1e-5)
    ga = jax.grad(p_a)(k)
    gr = jax.grad(p_r)(k)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), rtol=1e-4, atol=1e-4)


def test_snconv_upscale_small_cout_matches_explicit(rng, lowerings_on):
    """SNConv(upscale=2, features<=_SMALLC) takes the stencil-matmul path;
    it must equal SNConv applied to the explicitly upsampled input."""
    for ks, pad in ((3, 1), (9, 4)):
        m_ref = blocks.SNConv(features=2, kernel_size=ks, padding=pad)
        m_fold = blocks.SNConv(features=2, kernel_size=ks, padding=pad, upscale=2)
        x = jax.random.normal(jax.random.fold_in(rng, ks), (2, 5, 5, 24))
        v = m_ref.init(rng, upscale2d(x))
        ref = m_ref.apply(v, upscale2d(x), False)
        out = m_fold.apply(v, x, False)
        assert out.shape == ref.shape == (2, 10, 10, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_snconv_parts_small_cin_matches_concat(rng, lowerings_on):
    """Tuple-input SNConv (im2col per part) == the same conv on the concat."""
    m = blocks.SNConv(features=32, kernel_size=9, padding=4)
    x1 = jax.random.normal(jax.random.fold_in(rng, 0), (2, 10, 10, 1))
    x2 = jax.random.normal(jax.random.fold_in(rng, 1), (2, 10, 10, 1))
    xc = jnp.concatenate([x1, x2], axis=-1)
    v = m.init(rng, xc)
    ref = m.apply(v, xc, False)
    out = m.apply(v, (x1, x2), False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

"""Model-level shape tests mirroring the reference inline tests
(gim_img_models.py:469-499, gim_gaussian_models.py:113-149) at reduced size,
plus exact parameter-count parity checks against the torch reference
(verified by executing /root/reference with identical dims)."""

import jax
import jax.numpy as jnp
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.models import gaussian, image


def _n_params(tree):
    return sum(int(p.size) for p in jax.tree.leaves(tree))


def test_gaussian_au_shapes(rng):
    au = gaussian.get_au(src_dim=16)
    x = jax.random.normal(rng, (4, 5, 16))
    a = jax.random.normal(rng, (4, 3, 16))
    v = au.init(rng, x, a)
    out = au.apply(v, x, a)
    assert out.shape == (4, 1)


def test_gaussian_au_param_parity(rng):
    # torch reference with src_dim=4: 117 params (dis MLP (16,4,8,1))
    au = gaussian.get_au(src_dim=4)
    v = au.init(rng, jnp.ones((2, 5, 4)), jnp.ones((2, 3, 4)))
    assert _n_params(v["params"]) == 117


def test_gaussian_im_shapes_and_params(rng):
    im = gaussian.get_im(src_dim=4)
    leaked = jax.random.normal(rng, (4, 2, 4))
    v = im.init({"params": rng, "noise": rng}, leaked, 5)
    out = im.apply(v, leaked, 5, rngs={"noise": rng})
    assert out.shape == (4, 5, 4)
    # torch reference: 20 params in the mapper MLP ([4,4]); the reference's
    # unused out_mlp (gim_gaussian_models.py:73) is intentionally omitted
    assert _n_params(v["params"]) == 20


def test_gaussian_im_remove_noise_mean(rng):
    im = gaussian.get_im(src_dim=4)
    leaked = jax.random.normal(rng, (4, 2, 4))
    v = im.init({"params": rng, "noise": rng}, leaked, 5)
    out = im.apply(v, leaked, 5, True, rngs={"noise": rng})
    # with noise mean removed, the fake sample mean equals the leaked mean
    fake_mean = out.mean(axis=1)
    leaked_mean = leaked.mean(axis=1)
    assert jnp.allclose(fake_mean, leaked_mean, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_image_models():
    key = jax.random.PRNGKey(0)
    au = image.get_au(img_size=16, img_channels=1, style_dim=64)
    im = image.get_im(img_size=16, img_channels=1, style_dim=64)
    test = jnp.ones((2, 3, 16, 16, 1))
    si = jnp.ones((2, 2, 16, 16, 1))
    leaked = jnp.ones((2, 1, 16, 16, 1))
    av = jax.jit(lambda k: au.init(k, test, si))(key)
    iv = jax.jit(lambda k: im.init({"params": k, "noise": k}, leaked, 3))(key)
    return au, im, av, iv


def test_image_au_shapes(tiny_image_models, rng):
    au, _, av, _ = tiny_image_models
    test = jax.random.normal(rng, (2, 3, 16, 16, 1))
    si = jax.random.normal(rng, (2, 2, 16, 16, 1))
    out = jax.jit(lambda v, t, s: au.apply(v, t, s))(av, test, si)
    assert out.shape == (2, 1)


def test_image_au_param_parity(tiny_image_models):
    # torch reference at img16/c1/style64: 431459 params
    _, _, av, _ = tiny_image_models
    assert _n_params(av["params"]) == 431459


def test_image_im_shapes(tiny_image_models, rng):
    _, im, _, iv = tiny_image_models
    leaked = jax.random.normal(rng, (2, 1, 16, 16, 1))
    fake, muts = jax.jit(
        lambda v, x, k: im.apply(v, x, 3, rngs={"noise": k}, mutable=["spectral"])
    )(iv, leaked, rng)
    assert fake.shape == (2, 3, 16, 16, 1)
    # tanh output range
    assert float(jnp.abs(fake).max()) <= 1.0


def test_image_im_param_parity(tiny_image_models):
    # torch reference at img16/c1/style64: 1491955 total, of which 634 are the
    # never-invoked img_att (use_img_att=False); we materialise 1491321
    _, _, _, iv = tiny_image_models
    assert _n_params(iv["params"]) == 1491321


def test_image_au_fused_encode_matches_forward(tiny_image_models, rng):
    """encode_flat + discriminate must equal the plain forward."""
    au, _, av, _ = tiny_image_models
    test = jax.random.normal(rng, (2, 3, 16, 16, 1))
    si = jax.random.normal(jax.random.fold_in(rng, 1), (2, 2, 16, 16, 1))

    direct = au.apply(av, test, si)

    b, n = test.shape[:2]
    k = si.shape[1]
    flat = jnp.concatenate(
        [test.reshape(b * n, 16, 16, 1), si.reshape(b * k, 16, 16, 1)], axis=0
    )
    src, env = au.apply(av, flat, False, method=au.encode_flat)
    test_src, si_src = src[: b * n].reshape(b, n, -1), src[b * n :].reshape(b, k, -1)
    test_env, si_env = env[: b * n].reshape(b, n, -1), env[b * n :].reshape(b, k, -1)
    fused = au.apply(
        av, test_src, test_env, si_src, si_env, method=au.discriminate
    )
    assert jnp.allclose(direct, fused, atol=1e-4)


def test_image_im_with_img_att(rng):
    im = image.get_im(img_size=16, img_channels=1, style_dim=32, use_img_att=True)
    leaked = jnp.ones((1, 1, 16, 16, 1))
    iv = jax.jit(lambda k: im.init({"params": k, "noise": k}, leaked, 2))(
        jax.random.PRNGKey(1)
    )
    fake, _ = jax.jit(
        lambda v, x, k: im.apply(v, x, 2, rngs={"noise": k}, mutable=["spectral"])
    )(iv, leaked, rng)
    assert fake.shape == (1, 2, 16, 16, 1)
    assert "img_att" in iv["params"]

"""Baseline model tests: ArcFace (SE-IR backbone + margin head) and Siamese."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.baselines.arcface import (
    ArcFace,
    ArcfaceHead,
    Backbone,
    get_blocks,
    l2_norm,
)
from optimalstrategiesagainstgenerativeattacks_tpu.baselines.siamese import (
    ProtonetEmbeddingNet,
    SiameseNet,
    SimpleEmbeddingNet,
)


def test_get_blocks_unit_counts():
    assert [len(b) for b in get_blocks(50)] == [3, 4, 14, 3]
    assert [len(b) for b in get_blocks(100)] == [3, 13, 30, 3]
    assert [len(b) for b in get_blocks(152)] == [3, 8, 36, 3]
    with pytest.raises(ValueError):
        get_blocks(18)


def test_arcface_forward_shapes(rng):
    # mirrors test_arc_face (baselines/arcface/models.py:263-278) at img 32
    batch, channels, img, emb, n_classes = 2, 1, 32, 512, 11
    emb_model = Backbone(num_layers=50, drop_ratio=0.6, mode="ir_se",
                         img_size=img, img_channels=channels, emb_dim=emb)
    model = ArcFace(emb_model=emb_model, embedding_size=emb, n_classes=n_classes)
    x = jax.random.normal(rng, (batch, img, img, channels))
    label = jnp.array([1, 5])
    variables = model.init({"params": rng, "dropout": rng}, x, label)
    e, out = model.apply(
        variables, x, label, rngs={"dropout": rng}, mutable=["batch_stats"]
    )[0]
    assert e.shape == (batch, emb)
    assert out.shape == (batch, n_classes)
    # embeddings are l2-normalised
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=1), 1.0, rtol=1e-4)


def test_arcface_predict(rng):
    emb_model = Backbone(num_layers=50, mode="ir", img_size=32, img_channels=1)
    model = ArcFace(emb_model=emb_model, embedding_size=512, n_classes=5, th=1.5)
    x = jax.random.normal(rng, (2, 32, 32, 1))
    variables = model.init({"params": rng, "dropout": rng}, x, jnp.array([0, 1]))
    score, pred = model.apply(variables, x, x, method=model.predict)
    # identical inputs -> zero distance -> score 0 >= th? no, th=1.5 > 0 -> False... score=0 < 1.5
    np.testing.assert_allclose(np.asarray(score), 0.0, atol=1e-4)
    assert pred.shape == (2,)


def test_arcface_head_margin_applies_to_target_only(rng):
    head = ArcfaceHead(embedding_size=8, classnum=4)
    emb = l2_norm(jax.random.normal(rng, (3, 8)))
    label = jnp.array([0, 1, 2])
    v = head.init(rng, emb, label)
    with_margin = head.apply(v, emb, label)
    plain = 64.0 * jnp.clip(
        emb @ l2_norm(v["params"]["kernel"], axis=0), -1, 1
    )
    diff = np.asarray(with_margin - plain)
    # margin lowers the target-class logit, leaves the others untouched
    for i, lbl in enumerate([0, 1, 2]):
        assert diff[i, lbl] < 0
        others = np.delete(diff[i], lbl)
        np.testing.assert_allclose(others, 0.0, atol=1e-4)


def test_protonet_siamese(rng):
    enc = ProtonetEmbeddingNet(inp_n_channels=1, inp_img_size=32)
    assert enc.embedding_dim == 64 * 2 * 2
    model = SiameseNet(embedding_net=enc, embedding_dim=enc.embedding_dim)
    x1 = jax.random.normal(rng, (2, 32, 32, 1))
    x2 = jax.random.normal(rng, (2, 32, 32, 1))
    variables = model.init(rng, x1, x2)
    out, _ = model.apply(variables, x1, x2, mutable=["batch_stats"])
    assert out.shape == (2, 1)
    # encode method works standalone (used by the eval adapter)
    emb = model.apply(variables, x1, False, method=model.encode)
    assert emb.shape == (2, enc.embedding_dim)


def test_simple_embedding_net(rng):
    m = SimpleEmbeddingNet()
    x = jax.random.normal(rng, (2, 28, 28, 1))
    v = m.init(rng, x)
    assert m.apply(v, x).shape == (2, 2)

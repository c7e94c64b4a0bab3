"""Siamese baseline authenticator (protonet encoder + abs-diff classifier).

Parity with ``baselines/siamese/models.py``: 4-block conv-BN-ReLU-maxpool
protonet encoder (:14-56), the simple embedding nets (:59-95), and
``SiameseNet`` with encode / classify(|e1-e2|) / forward (:97-114).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from optimalstrategiesagainstgenerativeattacks_tpu.ops.image_ops import max_pool2d

Dtype = Any


class ProtonetEmbeddingNet(nn.Module):
    """4x [conv3x3 -> BN -> ReLU -> maxpool2] (``ProtonetEmbeddingNet:14-56``)."""

    inp_n_channels: int
    inp_img_size: int
    hidden_dim: int = 64
    z_dim: int = 64
    dtype: Optional[Dtype] = None

    @property
    def embedding_dim(self) -> int:
        out_img_size = self.inp_img_size // (2**4)
        return self.z_dim * out_img_size * out_img_size

    @nn.compact
    def __call__(self, x, train: bool = True):
        dims = [self.hidden_dim, self.hidden_dim, self.hidden_dim, self.z_dim]
        for i, d in enumerate(dims):
            x = nn.Conv(d, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
            x = max_pool2d(x, 2)
        return x.reshape(x.shape[0], -1)


class SimpleEmbeddingNet(nn.Module):
    """conv5-PReLU-pool x2 -> 3-layer MLP head (``SimpleEmbeddingNet:59-77``)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        from optimalstrategiesagainstgenerativeattacks_tpu.baselines.arcface import PReLU

        x = nn.Conv(32, (5, 5), padding=0, dtype=self.dtype, name="conv1")(x)
        x = PReLU(name="prelu1")(x)
        x = max_pool2d(x, 2)
        x = nn.Conv(64, (5, 5), padding=0, dtype=self.dtype, name="conv2")(x)
        x = PReLU(name="prelu2")(x)
        x = max_pool2d(x, 2)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(256, name="fc1")(x)
        x = PReLU(name="prelu3")(x)
        x = nn.Dense(256, name="fc2")(x)
        x = PReLU(name="prelu4")(x)
        return nn.Dense(2, name="fc3")(x)


class SimpleEmbeddingNetL2(SimpleEmbeddingNet):
    """L2-normalised variant (``SimpleEmbeddingNetL2:80-89``)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = super().__call__(x, train)
        return out / jnp.sqrt(jnp.square(out).sum(axis=1, keepdims=True))


class SiameseNet(nn.Module):
    """encode / classify(|e1 - e2|) / forward (``SiameseNet:97-114``)."""

    embedding_net: nn.Module
    embedding_dim: int

    def setup(self):
        self.fc = nn.Dense(1)

    def encode(self, x, train: bool = True):
        return self.embedding_net(x, train)

    def classify(self, emb1, emb2):
        return self.fc(jnp.abs(emb1 - emb2))

    def __call__(self, x1, x2, train: bool = True):
        emb1 = self.encode(x1, train)
        emb2 = self.encode(x2, train)
        return self.classify(emb1, emb2)

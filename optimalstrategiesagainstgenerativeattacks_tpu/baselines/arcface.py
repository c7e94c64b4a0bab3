"""ArcFace baseline authenticator: SE-IR ResNet backbone + angular-margin head.

Parity with ``baselines/arcface/models.py``: SE module (:22-38),
bottleneck_IR / bottleneck_IR_SE (:41-86), 50/100/152-layer block specs
(:89-117), ``Backbone`` (:120-164) with the img-size-dependent output
head, additive-angular-margin head (s=64, m=0.5, :170-208), and
``predict(x1, x2)`` = -||emb1 - emb2||^2 vs threshold (:231-237).

TPU notes: NHWC; BatchNorm is flax ``nn.BatchNorm`` with batch stats in
the ``batch_stats`` collection — construct ``Backbone(bn_axis_name='data')``
for cross-replica stat sync when the backbone runs inside a mapped context
(shard_map/pmap) with that axis (the only cross-replica statistic in the
project, SURVEY §7); the default (None) computes per-shard stats.  PReLU carries a learnable per-channel slope.
The reference ships no training script for these; this framework adds one
(``train_arcface_baseline.py``).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from optimalstrategiesagainstgenerativeattacks_tpu.nn.init import uniform_pm1
from optimalstrategiesagainstgenerativeattacks_tpu.ops.image_ops import max_pool2d

Dtype = Any


def l2_norm(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / norm


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch nn.PReLU(num_parameters=C))."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        alpha = self.param("alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32), (c,))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class SEModule(nn.Module):
    """Squeeze-and-excitation gate (``SEModule:22-38``)."""

    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class BottleneckIR(nn.Module):
    """IR residual unit (``bottleneck_IR:41-58``); optional SE gate."""

    depth: int
    stride: int
    use_se: bool = False
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis_name, name=name,
        )
        if in_ch == self.depth:
            shortcut = x if self.stride == 1 else max_pool2d(x, 1, self.stride)
        else:
            shortcut = nn.Conv(
                self.depth, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="shortcut_conv",
            )(x)
            shortcut = bn("shortcut_bn")(shortcut)

        res = bn("bn1")(x)
        res = nn.Conv(self.depth, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                      name="conv1")(res)
        res = PReLU(name="prelu")(res)
        res = nn.Conv(self.depth, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(res)
        res = bn("bn2")(res)
        if self.use_se:
            res = SEModule(dtype=self.dtype, name="se")(res)
        return res + shortcut


def get_blocks(num_layers: int) -> Sequence[Sequence[Tuple[int, int]]]:
    """(depth, stride) unit specs for 50/100/152 layers (``get_blocks:100-117``)."""
    if num_layers == 50:
        units = [3, 4, 14, 3]
    elif num_layers == 100:
        units = [3, 13, 30, 3]
    elif num_layers == 152:
        units = [3, 8, 36, 3]
    else:
        raise ValueError("num_layers should be 50, 100, or 152")
    depths = [64, 128, 256, 512]
    blocks = []
    for depth, n_units in zip(depths, units):
        blocks.append([(depth, 2)] + [(depth, 1)] * (n_units - 1))
    return blocks


class Backbone(nn.Module):
    """SE-IR ResNet embedding backbone (``Backbone:120-164``)."""

    num_layers: int = 50
    drop_ratio: float = 0.6
    mode: str = "ir_se"  # 'ir' | 'ir_se'
    img_size: int = 64
    img_channels: int = 3
    emb_dim: int = 512
    dtype: Optional[Dtype] = None
    # set to a mapped axis name (e.g. 'data' under shard_map/pmap) for
    # cross-replica batch-stat sync — the only cross-replica statistic in
    # the project (SURVEY §7)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.mode in ("ir", "ir_se")
        if self.img_size == 64:
            last_img_size = 4
        elif self.img_size == 32:
            last_img_size = 2
        else:
            raise ValueError("img_size must be 32 or 64")
        use_se = self.mode == "ir_se"

        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="input_conv")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, axis_name=self.bn_axis_name,
                         name="input_bn")(h)
        h = PReLU(name="input_prelu")(h)

        for bi, block in enumerate(get_blocks(self.num_layers)):
            for ui, (depth, stride) in enumerate(block):
                h = BottleneckIR(depth=depth, stride=stride, use_se=use_se,
                                 dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                                 name=f"block{bi}_unit{ui}")(h, train)

        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, axis_name=self.bn_axis_name,
                         name="out_bn")(h)
        h = nn.Dropout(self.drop_ratio, deterministic=not train)(h)
        h = h.reshape(h.shape[0], -1)
        assert h.shape[-1] == 512 * last_img_size * last_img_size
        h = nn.Dense(self.emb_dim, name="out_dense")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         use_scale=True, use_bias=True,
                         axis_name=self.bn_axis_name, name="out_bn1d")(h)
        return l2_norm(h.astype(jnp.float32))


class ArcfaceHead(nn.Module):
    """Additive-angular-margin softmax head (``ArcfaceHead:170-208``)."""

    embedding_size: int = 512
    classnum: int = 51332
    s: float = 64.0
    m: float = 0.5

    @nn.compact
    def __call__(self, embeddings, label):
        kernel = self.param(
            "kernel", uniform_pm1, (self.embedding_size, self.classnum), jnp.float32
        )
        cos_m, sin_m = math.cos(self.m), math.sin(self.m)
        mm = sin_m * self.m
        threshold = math.cos(math.pi - self.m)

        kernel_norm = l2_norm(kernel, axis=0)
        cos_theta = jnp.clip(embeddings @ kernel_norm, -1.0, 1.0)
        sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta**2, 0.0, None))
        cos_theta_m = cos_theta * cos_m - sin_theta * sin_m
        # keep theta+m within [0, pi]: fall back to cosface beyond it
        keep_val = cos_theta - mm
        cos_theta_m = jnp.where(cos_theta - threshold <= 0, keep_val, cos_theta_m)

        one_hot = jax.nn.one_hot(label, self.classnum, dtype=cos_theta.dtype)
        output = jnp.where(one_hot > 0, cos_theta_m, cos_theta)
        return output * self.s


class ArcFace(nn.Module):
    """Backbone + margin head with verification ``predict`` (``ArcFace:213-237``)."""

    emb_model: nn.Module
    embedding_size: int
    n_classes: int
    th: float = 1.5

    def setup(self):
        self.head = ArcfaceHead(
            embedding_size=self.embedding_size, classnum=self.n_classes
        )

    def __call__(self, x, label, train: bool = True):
        emb = self.emb_model(x, train)
        out = self.head(emb, label)
        return emb, out

    def embed(self, x, train: bool = False):
        return self.emb_model(x, train)

    def predict(self, x1, x2, train: bool = False):
        emb1 = self.emb_model(x1, train)
        emb2 = self.emb_model(x2, train)
        diff = emb1 - emb2
        score = -jnp.sum(jnp.square(diff), axis=1)
        return score, score >= self.th

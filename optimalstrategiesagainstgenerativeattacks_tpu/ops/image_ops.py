"""Spatial image ops, NHWC: nearest upscale, depthwise blur, pooling.

TPU-first notes: nearest upscale is a reshape+broadcast (no gather);
average pooling is ``lax.reduce_window``; the 3x3 [1,2,1] blur is a
depthwise conv with ``feature_group_count=C`` so XLA keeps it on the
convolution path.  Parity targets: ``model_blocks.upscale2d`` (:177-195),
``BlurLayer`` (:227-251), torch ``AvgPool2d(2)`` / ``AdaptiveMaxPool2d``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def upscale2d(x: jnp.ndarray, factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """Nearest-neighbour upscale of NHWC by an integer factor."""
    assert x.ndim == 4
    if gain != 1:
        x = x * gain
    if factor == 1:
        return x
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def _window_view(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/w, w, W/w, w, C] non-overlapping window view.

    Pooling with window == stride (the only case the models use) is a
    reshape + reduction: friendlier to XLA's TPU tiling than
    ``lax.reduce_window``, and — load-bearing — ``reduce_window`` has no
    bfloat16 linearization rule in JAX 0.9 (jit-of-grad fails), while
    reshaped reductions differentiate fine.
    """
    b, h, w, c = x.shape
    assert h % window == 0 and w % window == 0, (x.shape, window)
    return x.reshape(b, h // window, window, w // window, window, c)


def avg_pool2d(x: jnp.ndarray, window: int = 2, stride: int | None = None) -> jnp.ndarray:
    """Average pooling over NHWC with a square window (valid padding)."""
    stride = stride or window
    if stride == window:
        # accumulate in the INPUT dtype: jnp.mean's default f32 upcast of a
        # bfloat16 input gets hoisted by XLA into the producer fusion, which
        # then materialises a full f32 copy of the upstream conv output to
        # HBM next to the bf16 one (profiled at ~1.9 ms per down block per
        # encoder at flagship, ~3.8 ms at vox shapes, round 3). A 2x2 mean
        # of four bf16 values loses nothing the game's bf16 compute path
        # hasn't already given up; float32 inputs are unaffected.
        return _window_view(x, window).mean(axis=(2, 4), dtype=x.dtype)
    out = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    ) / (window * window)
    return out.astype(x.dtype)


def max_pool2d(x: jnp.ndarray, window: int = 2, stride: int | None = None) -> jnp.ndarray:
    """Max pooling over NHWC with a square window (valid padding)."""
    stride = stride or window
    if stride == window:
        return _window_view(x, window).max(axis=(2, 4))
    out = lax.reduce_window(
        x.astype(jnp.float32),
        -jnp.inf,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return out.astype(x.dtype)


def adaptive_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Global spatial max: NHWC -> [B, C] (AdaptiveMaxPool2d((1,1)) + flatten)."""
    return x.max(axis=(1, 2))


def adaptive_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Global spatial mean: NHWC -> [B, C]."""
    return x.mean(axis=(1, 2))


def blur3x3(x: jnp.ndarray, normalize: bool = True, stride: int = 1) -> jnp.ndarray:
    """Depthwise [1,2,1] x [1,2,1] blur over NHWC (StyleGAN BlurLayer)."""
    k1d = np.array([1.0, 2.0, 1.0], dtype=np.float32)
    k = np.outer(k1d, k1d)
    if normalize:
        k = k / k.sum()
    c = x.shape[-1]
    # HWIO with feature groups: [3, 3, 1, C]
    kernel = jnp.asarray(np.tile(k[:, :, None, None], (1, 1, 1, c)), dtype=x.dtype)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """LeakyReLU with the project-wide default slope of 0.2."""
    return jnp.where(x >= 0, x, negative_slope * x)

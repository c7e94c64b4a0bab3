"""Adaptive instance normalisation and instance norm, NHWC.

``ada_in`` re-normalises each channel's spatial statistics to style-supplied
mean/std (reference ``models/model_blocks.py:611-630``).  Two semantics
quirks of the reference are preserved exactly:

  * the feature std uses the *unbiased* (N-1) estimator (torch.std default)
    and epsilon is added to the *std*, not the variance;
  * plain InstanceNorm (torch ``nn.InstanceNorm2d``) uses the *biased*
    estimator with eps added to the variance.

Both are single-pass channel reductions over H*W followed by an affine —
ideal fusion targets.  XLA already fuses these chains well; a hand-fused
Pallas kernel is provided in ``ops/pallas/adain_pallas.py`` for the hot
generator path and is dispatched via ``ada_in(..., use_pallas=...)``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Pallas dispatch: fused AdaIN kernel on TPU when enabled (see
# ops/pallas/adain_pallas.py).  Off by default until flipped per-run;
# OSGA_USE_PALLAS=1 or set_use_pallas(True) enables it.
_USE_PALLAS = os.environ.get("OSGA_USE_PALLAS", "0") == "1"
_TPU_BACKENDS = ("tpu", "axon")


def set_use_pallas(enabled: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = enabled


def use_pallas() -> bool:
    return _USE_PALLAS and jax.default_backend() in _TPU_BACKENDS


def ada_in(
    feature: jnp.ndarray,
    mean_style: jnp.ndarray,
    std_style: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """AdaIN over NHWC features.

    Args:
      feature: [B, H, W, C].
      mean_style: [B, C] target channel means.
      std_style: [B, C] target channel stds.
    Returns:
      [B, H, W, C] re-normalised feature.
    """
    if use_pallas():
        from optimalstrategiesagainstgenerativeattacks_tpu.ops.pallas.adain_pallas import (
            ada_in_pallas,
        )

        return ada_in_pallas(
            feature,
            mean_style.astype(jnp.float32),
            std_style.astype(jnp.float32),
            eps,
        )
    b, h, w, c = feature.shape
    n = h * w
    f32 = feature.astype(jnp.float32)
    # single-pass stats: sum and sum-of-squares are sibling reductions over
    # the same input, which XLA fuses into ONE read of the (large) feature
    # tensor instead of the two passes a mean-then-centered-variance form
    # forces.  f32 accumulation over bf16 activations keeps the
    # cancellation error well below bf16 quantisation.
    s1 = f32.sum(axis=(1, 2), keepdims=True)                  # [B,1,1,C]
    s2 = jnp.square(f32).sum(axis=(1, 2), keepdims=True)
    mean_feat = s1 / n
    # unbiased std to match torch.std(feature, dim=2)
    var = jnp.maximum(s2 - n * jnp.square(mean_feat), 0.0) / max(n - 1, 1)
    std_feat = jnp.sqrt(var) + eps
    mean_style = mean_style.astype(jnp.float32)[:, None, None, :]
    std_style = std_style.astype(jnp.float32)[:, None, None, :]
    out = std_style * (f32 - mean_feat) / std_feat + mean_style
    return out.astype(feature.dtype)


def instance_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """InstanceNorm2d over NHWC; biased variance, eps on variance (torch semantics).

    Args:
      x: [B, H, W, C].
      scale, bias: optional [C] affine parameters.
    """
    f32 = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2]
    # single-pass sum / sum-of-squares (see ada_in): one read of x for the
    # stats instead of two
    s1 = f32.sum(axis=(1, 2), keepdims=True)
    s2 = jnp.square(f32).sum(axis=(1, 2), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    out = (f32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def pixel_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """PixelNorm over the channel axis (NHWC): x * rsqrt(mean_c(x^2) + eps)."""
    f32 = x.astype(jnp.float32)
    out = f32 * jnp.reciprocal(jnp.sqrt(jnp.mean(jnp.square(f32), axis=-1, keepdims=True) + eps))
    return out.astype(x.dtype)

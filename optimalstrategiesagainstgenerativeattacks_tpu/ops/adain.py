"""Adaptive instance normalisation and instance norm, NHWC.

``ada_in`` re-normalises each channel's spatial statistics to style-supplied
mean/std (reference ``models/model_blocks.py:611-630``).  Two semantics
quirks of the reference are preserved exactly:

  * the feature std uses the *unbiased* (N-1) estimator (torch.std default)
    and epsilon is added to the *std*, not the variance;
  * plain InstanceNorm (torch ``nn.InstanceNorm2d``) uses the *biased*
    estimator with eps added to the variance.

Both are single-pass channel reductions over H*W followed by an affine —
ideal fusion targets, and XLA's own fusions already run them at the HBM
roofline.  Hand-fused Pallas kernels for AdaIN and the attention core were
built and measured in rounds 1-2 and RETIRED: with honest value-fetch sync
the Pallas variant was *slower* end-to-end (72.6 vs 62.5 ms/step at
style 128), the profiled stat bucket the kernels targeted shrank to
~14 ms/step once the convert/reduce chains fused (see STATUS.md), and the
Pallas custom-calls inflated the flagship module enough to OOM this
platform's remote compile server.  The git history (tag: pre-Pallas-retire
state at commit 79a0a33) retains the kernels and their parity tests.
"""

from __future__ import annotations

import jax.numpy as jnp


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

"""Reusable Flax block library for the GIM models (NHWC, TPU-first).

Capability parity with the reference block library
(``models/model_blocks.py``, ~25 modules), re-designed for XLA:

  * All tensors are NHWC; convolutions are ``lax.conv_general_dilated``
    with HWIO kernels so XLA tiles them onto the MXU.
  * Spectral normalisation (pervasive in the reference via
    ``nn.utils.spectral_norm``) is explicit functional state: each SN conv
    keeps persistent ``u``/``v`` power-iteration vectors in a ``spectral``
    variable collection.  Passing ``update_sn=True`` (train step, with
    ``mutable=['spectral']``) runs one power iteration and stores the new
    vectors; ``update_sn=False`` (eval) re-uses the stored ones.  Sigma is
    computed as u^T W v with u, v stop-gradiented, so gradients flow
    through W exactly as in torch.
  * Compute dtype is a per-module ``dtype`` attribute (bfloat16 on TPU);
    parameters and normalisation statistics stay float32.

Every class documents the reference line range it matches.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from optimalstrategiesagainstgenerativeattacks_tpu.nn.init import (
    kaiming_normal,
    torch_bias_init,
    torch_kernel_init,
    zeros_init,
    ones_init,
)
from optimalstrategiesagainstgenerativeattacks_tpu.ops.adain import (
    ada_in,
    instance_norm,
    pixel_norm,
)
from optimalstrategiesagainstgenerativeattacks_tpu.ops.image_ops import (
    avg_pool2d,
    blur3x3,
    leaky_relu,
    upscale2d,
)

Dtype = Any

########################################################################################################################
# Primitive layers
########################################################################################################################


def _conv2d(x, kernel, stride: int, padding: int, dtype: Optional[Dtype]):
    """NHWC conv with HWIO kernel, symmetric int padding.

    No explicit ``preferred_element_type``: its conv transpose rule cannot
    mix a float32 cotangent with bfloat16 operands, and the TPU MXU
    accumulates bf16 convolutions in float32 internally anyway.
    """
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    else:
        x = x.astype(kernel.dtype)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class Dense(nn.Module):
    """Linear layer with torch-default init and configurable compute dtype."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_kernel_init
    bias_init: Optional[Callable] = None  # None -> torch default (fan_in uniform)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features), jnp.float32
        )
        h = x
        k = kernel
        if self.dtype is not None:
            h = h.astype(self.dtype)
            k = k.astype(self.dtype)
        y = jnp.matmul(h, k, preferred_element_type=jnp.float32)
        if self.use_bias:
            bias_init = self.bias_init or torch_bias_init(in_features)
            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype) if self.dtype is not None else y


class Conv(nn.Module):
    """Plain conv (no spectral norm) with torch-default init, NHWC."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = torch_kernel_init
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        ks = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (ks, ks, in_ch, self.features), jnp.float32
        )
        y = _conv2d(x, kernel, self.stride, self.padding, self.dtype)
        if self.use_bias:
            bias_init = self.bias_init or torch_bias_init(in_ch * ks * ks)
            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            # add in the compute dtype: an f32 bias would promote (and
            # materialise) the whole conv output in f32 — 2x HBM traffic
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype) if self.dtype is not None else y


def _l2_normalize(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


def _fold_kernel_for_upscale2(kernel):
    """HWIO kernel K -> K' with conv(nearest_up2(x), K) == lhs-dilated conv(x, K').

    Nearest 2x upsampling is zero-insertion convolved with ones(2, 2), so the
    composition folds into a single convolution with K' = K (*) ones(2, 2)
    (size (kh+1, kw+1)) over the 2x-dilated input.  Exact algebra — it removes
    the 4x-sized upsampled intermediate AND the 4x duplicated conv work.
    """
    kp = jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return kp[:-1, :-1] + kp[1:, :-1] + kp[:-1, 1:] + kp[1:, 1:]


def _fold_kernel_for_downscale2(kernel):
    """HWIO kernel K -> K' with avg_pool2(conv(x, K)) == stride-2 conv(x, K').

    2x2 average pooling of the conv output averages four neighbouring conv
    windows, so the composition folds into one stride-2 convolution with
    K' = (K (*) ones(2, 2)) / 4 (size (kh+1, kw+1)) and padding
    (p, kh - p).  Exact algebra — it removes the full-resolution conv
    output entirely: 2.25x fewer conv FLOPs at 3x3, 3.24x at the img2img
    9x9 blocks, forward and backward.
    """
    kp = jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return (kp[:-1, :-1] + kp[1:, :-1] + kp[:-1, 1:] + kp[1:, 1:]) * 0.25


# ---------------------------------------------------------------------------
# Matmul lowerings for MXU-hostile conv geometries (round 3) — measured on
# the chip and REJECTED as defaults; kept as opt-in env knobs.
#
# XLA's TPU conv emitter falls back to batch-in-lanes codegen whenever the
# produced feature dim (output channels in forward, input channels in the
# input-gradient) sits far below the 128-lane MXU width; those convs then run
# ~25x off roofline (profiled 12.3 ms of the 148 ms flagship step: the
# 1/2-channel entry-conv input-gradients, the to-image 9x9 forward, and the
# attention C/8 1x1 projections).  Three exact rewrites keep the work on the
# MXU.  All are plain jnp (matmul + pad + slice), so autodiff derives equally
# MXU-friendly backward AND higher-order derivatives (the R1 grad-of-grad
# path differentiates them twice) — deliberately NOT a custom_vjp.
#
# On-chip A/B (same warm cache, device-resident batches, round 3):
#   flagship (B128 img32x1 style512):  147.9 ms/step lax.conv baseline
#     -> 166.9 ms all three lowerings on, 161.5 ms without im2col — the
#     im2col cols (ks^2 blow-up) and the 81-slice shift-add epilogues cost
#     more HBM traffic than the batch-in-lanes kernels they replace, which
#     overlap with the wide convs' MXU time anyway.
#   vox (B128 img64x3 reg=10, grad-of-grad): 477.7 -> 1163.3 ms/step — the
#     doubly-differentiated concat/slice chains materialise enormous
#     intermediates under the R1 penalty.
# Defaults are therefore OFF (identical programs to the lax.conv path);
# enable individually with OSGA_LOWER_1X1 / OSGA_LOWER_IM2COL /
# OSGA_LOWER_SMALL_COUT=1.  Identity + grad + grad-of-grad pins stay in
# tests/test_blocks.py (they force the flags on).
# ---------------------------------------------------------------------------

_SMALLC = 8


def _cast2(x, kernel, dtype):
    if dtype is not None:
        return x.astype(dtype), kernel.astype(dtype)
    return x.astype(kernel.dtype), kernel


def _conv1x1_matmul(x, kernel, dtype):
    """1x1 stride-1 conv == per-pixel matmul (exact; same contraction).

    The conv emitter is batch-in-lanes at out_ch < 128 — the attention C/8
    projections cost ~1 ms each at flagship — while the reshaped matmul is
    layout-friendly at any width.
    """
    h, k = _cast2(x, kernel, dtype)
    lead = h.shape[:-1]
    y = h.reshape(-1, h.shape[-1]) @ k.reshape(k.shape[2], k.shape[3])
    return y.reshape(*lead, k.shape[3])


def _conv2d_im2col(x, kernel, padding, dtype):
    """stride-1 conv with small in_ch as ONE im2col matmul (exact).

    cols blow up by ks*ks, but at in_ch <= _SMALLC that is small next to
    the wide-output activations.  The real win is the input gradient:
    d(cols) = dy @ K^T is a ks*ks*in_ch-column MXU matmul where lax.conv's
    input-gradient at in_ch<=2 is a batch-in-lanes conv (4.7 ms for the
    img2img entry pair + 2.1 ms for the encoder entry, flagship profile).
    """
    h, k = _cast2(x, kernel, dtype)
    ks = kernel.shape[0]
    p = padding
    if p:
        h = jnp.pad(h, ((0, 0), (p, p), (p, p), (0, 0)))
    ho = x.shape[1] + 2 * p - ks + 1
    wo = x.shape[2] + 2 * p - ks + 1
    # concat order (dy, dx, channel) == HWIO kernel reshape order
    cols = jnp.concatenate(
        [h[:, dy : dy + ho, dx : dx + wo, :] for dy in range(ks) for dx in range(ks)],
        axis=-1,
    )
    fan = ks * ks * kernel.shape[2]
    y = cols.reshape(-1, fan) @ k.reshape(fan, kernel.shape[3])
    return y.reshape(x.shape[0], ho, wo, kernel.shape[3])


def _shift_add(m, ks, padding, co):
    """out[b,q,o] = sum_t m[b, q + t - padding, t*co + o] (zero outside) —
    the tap sum completing a stencil-matmul conv; accumulates in f32 like
    the MXU loop it replaces."""
    b, h, w, _ = m.shape
    p = padding
    mp = jnp.pad(m, ((0, 0), (p, p), (p, p), (0, 0))) if p else m
    ho = h + 2 * p - ks + 1
    wo = w + 2 * p - ks + 1
    acc = None
    for ty in range(ks):
        for tx in range(ks):
            t = ty * ks + tx
            s = mp[:, ty : ty + ho, tx : tx + wo, t * co : (t + 1) * co]
            s = s.astype(jnp.float32)
            acc = s if acc is None else acc + s
    return acc.astype(m.dtype)


def _conv2d_small_cout(x, kernel, padding, dtype, upscale: int = 1):
    """stride-1 conv with small out_ch as channel matmul + tap shift-add.

    M[b,r,(t,o)] = x[b,r,:] @ K[t,:,o] runs the whole channel contraction
    on the MXU (ks*ks*out_ch output columns); the remaining tap sum is an
    HBM-roofline slice-add fusion.  With upscale=2 the per-pixel matmul
    commutes with nearest upsampling, so M is computed at LOW resolution
    and upsampled — the lhs-dilated folded conv at out_ch=1 (the img2img
    to-image 9x9) was a 1.4 ms/step batch-in-lanes op.
    """
    h, k = _cast2(x, kernel, dtype)
    ks, _, ci, co = kernel.shape
    m = h.reshape(-1, ci) @ k.transpose(2, 0, 1, 3).reshape(ci, ks * ks * co)
    m = m.reshape(x.shape[0], x.shape[1], x.shape[2], ks * ks * co)
    if upscale == 2:
        m = upscale2d(m)
    return _shift_add(m, ks, padding, co)


import os as _os

_L_1X1 = _os.environ.get("OSGA_LOWER_1X1", "0") == "1"
_L_IM2COL = _os.environ.get("OSGA_LOWER_IM2COL", "0") == "1"
_L_SMALL_COUT = _os.environ.get("OSGA_LOWER_SMALL_COUT", "0") == "1"


def _conv2d_auto(x, kernel, stride, padding, dtype):
    """Matmul lowerings for the MXU-hostile geometries; lax.conv otherwise."""
    ks, _, ci, co = kernel.shape
    if stride == 1:
        if ks == 1 and padding == 0 and _L_1X1:
            return _conv1x1_matmul(x, kernel, dtype)
        if ci <= _SMALLC and _L_IM2COL:
            return _conv2d_im2col(x, kernel, padding, dtype)
        if co <= _SMALLC and _L_SMALL_COUT:
            return _conv2d_small_cout(x, kernel, padding, dtype)
    return _conv2d(x, kernel, stride, padding, dtype)


class SNConv(nn.Module):
    """Spectrally-normalised conv: kernel / sigma(kernel), NHWC.

    Matches torch ``nn.utils.spectral_norm`` semantics
    (``model_blocks.py:492-495`` et al.): one power iteration per update on
    the kernel viewed as an (out, in*kh*kw) matrix (torch weight layout),
    eps=1e-12, persistent u and v vectors, sigma differentiable through W.
    The bias is not normalised.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = torch_kernel_init
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None
    eps: float = 1e-12
    # 2 = consume a (virtual) nearest-2x-upsampled input: the upsample is
    # folded into the conv via _fold_kernel_for_upscale2 (exact), so callers
    # pass the LOW-resolution tensor and get the high-resolution output
    upscale: int = 1
    # 2 = produce a (virtual) avg-pool-2x2'd output: the pooling is folded
    # into the conv via _fold_kernel_for_downscale2 (exact), so callers get
    # the HALF-resolution tensor without the full-resolution conv ever
    # materialising
    downscale: int = 1
    # lower the conv as pad -> 9-shifted-slice concat -> one dense matmul
    # instead of lax.conv: on tiny spatial maps (the 4x4x512 AdaIN res
    # stage) the conv underfills the 8-sublane tiling (~37% MFU) while the
    # equivalent [B*H*W, ks*ks*C] @ [ks*ks*C, O] matmul has no padding
    # waste.  Same params/variables; stride/up/downscale must be 1.
    im2col: bool = False

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        # x may be a TUPLE of tensors whose channel dims sum to the conv's
        # input width: conv(concat(parts), K) is then computed as the sum
        # of per-part convs with kernel slices — exact linear algebra,
        # identical parameters/state.  The point is gradient DCE: with the
        # concat formulation XLA must emit ONE input-gradient convolution
        # covering every channel, even for parts that carry no gradient
        # (the broadcast leaked image concatenated into the img2img input,
        # ``gim_img_models.py:395-399``) — and at 2 output channels that
        # conv wastes nearly the whole MXU (profiled 4.5 ms/step flagship,
        # 5.1 ms vox, round 3). Split, the dead part's gradient vanishes.
        parts = tuple(x) if isinstance(x, (tuple, list)) else None
        if parts is not None:
            assert self.upscale == 1 and self.downscale == 1 and not self.im2col, (
                "tuple input is supported on the plain conv path only"
            )
            in_ch = sum(p.shape[-1] for p in parts)
        else:
            in_ch = x.shape[-1]
        ks = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (ks, ks, in_ch, self.features), jnp.float32
        )
        fan = in_ch * ks * ks
        # torch views weight (out, in, kh, kw) as (out, -1); replicate that order
        w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, fan)

        u_var = self.variable("spectral", "u", zeros_init, None, (self.features,))
        v_var = self.variable("spectral", "v", zeros_init, None, (fan,))
        if self.is_initializing():
            key = self.make_rng("params")
            u0 = _l2_normalize(jax.random.normal(key, (self.features,)), self.eps)
            v0 = _l2_normalize(
                lax.stop_gradient(w_mat).T @ u0, self.eps
            )
            u_var.value = u0
            v_var.value = v0

        if self.has_variable("sigmas", "sigma"):
            # Precomputed by ops.spectral.compute_sigmas inside the loss
            # (differentiable through the kernel); skips the per-conv
            # matvec + norm chain entirely — the train steps batch all
            # power iterations / sigmas per player instead.
            sigma = self.variable("sigmas", "sigma").value
        else:
            if update_sn and not self.is_initializing():
                w_ng = lax.stop_gradient(w_mat)
                v = _l2_normalize(w_ng.T @ u_var.value, self.eps)
                u = _l2_normalize(w_ng @ v, self.eps)
                u_var.value = u
                v_var.value = v
            else:
                u = lax.stop_gradient(u_var.value)
                v = lax.stop_gradient(v_var.value)
            sigma = jnp.dot(u, w_mat @ v)  # grads flow through w_mat
        kernel_sn = kernel / sigma
        if self.upscale == 2 and self.features <= _SMALLC and _L_SMALL_COUT:
            assert self.stride == 1
            # conv(nearest_up2(x), K) with a small output width: stencil
            # matmul at LOW resolution (the per-pixel channel contraction
            # commutes with nearest upsampling), upsample M, tap shift-add
            y = _conv2d_small_cout(
                x, kernel_sn, self.padding, self.dtype, upscale=2
            )
        elif self.upscale == 2:
            assert self.stride == 1
            kf = _fold_kernel_for_upscale2(kernel_sn)
            h = x
            if self.dtype is not None:
                h = h.astype(self.dtype)
                kf = kf.astype(self.dtype)
            else:
                h = h.astype(kf.dtype)
            p = self.padding + 1
            y = lax.conv_general_dilated(
                h,
                kf,
                window_strides=(1, 1),
                padding=((p, p), (p, p)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        elif self.downscale == 2:
            assert self.stride == 1 and self.upscale == 1
            kf = _fold_kernel_for_downscale2(kernel_sn)
            h = x
            if self.dtype is not None:
                h = h.astype(self.dtype)
                kf = kf.astype(self.dtype)
            else:
                h = h.astype(kf.dtype)
            p = self.padding
            y = lax.conv_general_dilated(
                h,
                kf,
                window_strides=(2, 2),
                padding=((p, ks - p), (p, ks - p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        elif self.im2col:
            assert self.stride == 1
            h = x
            kf = kernel_sn
            if self.dtype is not None:
                h = h.astype(self.dtype)
                kf = kf.astype(self.dtype)
            p = self.padding
            xp = jnp.pad(h, ((0, 0), (p, p), (p, p), (0, 0)))
            ho = x.shape[1] + 2 * p - ks + 1
            wo = x.shape[2] + 2 * p - ks + 1
            # concat order (dy, dx, channel) == HWIO kernel reshape order
            cols = jnp.concatenate(
                [
                    xp[:, dy : dy + ho, dx : dx + wo, :]
                    for dy in range(ks)
                    for dx in range(ks)
                ],
                axis=-1,
            )
            y = (cols.reshape(-1, fan) @ kf.reshape(fan, self.features)).reshape(
                x.shape[0], ho, wo, self.features
            )
        elif parts is not None:
            y = None
            off = 0
            for p in parts:
                c = p.shape[-1]
                yp = _conv2d_auto(
                    p, kernel_sn[:, :, off : off + c], self.stride, self.padding,
                    self.dtype,
                )
                y = yp if y is None else y + yp
                off += c
        else:
            y = _conv2d_auto(x, kernel_sn, self.stride, self.padding, self.dtype)
        if self.use_bias:
            bias_init = self.bias_init or torch_bias_init(fan)
            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            # add in the compute dtype: an f32 bias would promote (and
            # materialise) the whole conv output in f32 — 2x HBM traffic
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype) if self.dtype is not None else y


class InstanceNorm(nn.Module):
    """InstanceNorm2d over NHWC (torch semantics; optional affine)."""

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = bias = None
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", ones_init, (c,), jnp.float32)
            bias = self.param("bias", zeros_init, (c,), jnp.float32)
        return instance_norm(x, scale, bias, self.eps)


class Flatten(nn.Module):
    """[B, ...] -> [B, -1] (``Flatten:54-63``)."""

    def __call__(self, x):
        return x.reshape(x.shape[0], -1)


class Identity(nn.Module):
    """Pass-through (``Identity:66-74``)."""

    def __call__(self, x):
        return x


########################################################################################################################
# MLPs (model_blocks.py:77-171)
########################################################################################################################


class MLP(nn.Module):
    """Stack of Linear+LeakyReLU(0.2) with a linear head (``MLP:77-94``).

    ``layer_dims`` includes the input dim at position 0, as in the
    reference.  ``kernel_init``/zero-bias overrides reproduce
    ``mlp.apply(weights_init('kaiming'))``.
    """

    layer_dims: Sequence[int]
    kernel_init: Callable = torch_kernel_init
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        assert len(self.layer_dims) >= 2
        for out_dim in self.layer_dims[1:-1]:
            x = Dense(
                out_dim,
                kernel_init=self.kernel_init,
                bias_init=self.bias_init,
                dtype=self.dtype,
            )(x)
            x = leaky_relu(x)
        return Dense(
            self.layer_dims[-1],
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
        )(x)


class ResMLP(nn.Module):
    """Residual MLP variant (``ResMLP:97-138``; replay-init experiments)."""

    layer_dims: Sequence[int]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x1 = Dense(self.layer_dims[-1], dtype=self.dtype, name="linear")(x)
        x2 = MLP(self.layer_dims, dtype=self.dtype, name="model")(x)
        h = jnp.concatenate([x1, x2], axis=-1)
        return Dense(self.layer_dims[-1], dtype=self.dtype, name="out_linear")(h)


class ResMLP2(nn.Module):
    """Concat-residual MLP variant (``ResMLP2:141-171``)."""

    layer_dims: Sequence[int]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = jnp.concatenate([x, MLP(self.layer_dims, dtype=self.dtype, name="model")(x)], axis=-1)
        return Dense(self.layer_dims[-1], dtype=self.dtype, name="linear")(x=h)


def init_resmlp_to_replay(params: dict, style_dim: int, key: jax.Array) -> dict:
    """Functional analogue of ``ResMLP.init_to_replay`` (:121-138).

    Returns a new param tree where the skip linears are near-identity
    (N(0, 1e-4) + identity on the leading style_dim block, zero bias) and
    the inner MLP is kaiming-initialised.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    out = dict(flat)
    keys = jax.random.split(key, len(flat) + 1)
    ki = 0
    for path, val in flat.items():
        if path[0] in ("linear", "out_linear") and path[-1] == "kernel":
            w = 1e-4 * jax.random.normal(keys[ki], val.shape, val.dtype)
            ki += 1
            eye = jnp.eye(style_dim, dtype=val.dtype)
            w = w.at[:style_dim, :style_dim].set(eye)
            out[path] = w
        elif path[0] in ("linear", "out_linear") and path[-1] == "bias":
            out[path] = jnp.zeros_like(val)
        elif path[0] == "model" and path[-1] == "kernel":
            out[path] = kaiming_normal(0.2)(keys[ki], val.shape, val.dtype)
            ki += 1
        elif path[0] == "model" and path[-1] == "bias":
            out[path] = jnp.zeros_like(val)
    return flax.traverse_util.unflatten_dict(out)


########################################################################################################################
# StyleGAN-style kit (model_blocks.py:177-481; legacy, kept for parity)
########################################################################################################################


class NoiseLayer(nn.Module):
    """Per-pixel noise with per-channel weight (``NoiseLayer:198-215``).

    Noise is passed explicitly (functional RNG) instead of the torch
    ``.noise`` attribute trick; pass ``noise=None`` with an ``rng`` to
    sample fresh noise.
    """

    @nn.compact
    def __call__(self, x, noise: Optional[jnp.ndarray] = None, rng: Optional[jax.Array] = None):
        c = x.shape[-1]
        weight = self.param("weight", zeros_init, (c,), jnp.float32)
        if noise is None:
            if rng is None:
                rng = self.make_rng("noise")
            noise = jax.random.normal(rng, (x.shape[0], x.shape[1], x.shape[2], 1), x.dtype)
        return x + weight * noise


class StyleMod(nn.Module):
    """Affine style modulation x*(s0+1)+s1 (``StyleMod:254-264``)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, style):
        c = x.shape[-1]
        s = Dense(2 * c, dtype=self.dtype, name="lin")(style)
        s0, s1 = s[:, :c], s[:, c:]
        return x * (s0[:, None, None, :] + 1.0) + s1[:, None, None, :]


class StyleEstimator(nn.Module):
    """1x1 conv -> lrelu -> global avg pool -> linear (``StyleEstimator:267-279``)."""

    style_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = Conv(2 * self.style_dim, 1, padding=0, dtype=self.dtype, name="conv")(x)
        h = leaky_relu(h)
        h = h.mean(axis=(1, 2))
        return Dense(self.style_dim, dtype=self.dtype, name="lin")(h)


class SGLayerEpilogue(nn.Module):
    """Noise+act+pixel/instance-norm+style-mod epilogue (``SGLayerEpilogue:285-304``)."""

    use_pixel_norm: bool = False
    use_instance_norm: bool = True
    use_noise: bool = True
    activation: Callable = leaky_relu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, style, noise_rng: Optional[jax.Array] = None):
        if self.use_noise:
            x = NoiseLayer(name="noise")(x, rng=noise_rng)
        x = self.activation(x)
        if self.use_pixel_norm:
            x = pixel_norm(x)
        if self.use_instance_norm:
            x = instance_norm(x)
        return StyleMod(dtype=self.dtype, name="style_mod")(x, style)


class SGInputBlock(nn.Module):
    """epilogue -> conv3x3 -> epilogue (``SGInputBlock:307-336``)."""

    channels: int
    use_pixel_norm: bool = False
    use_instance_norm: bool = True
    use_noise: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, style1, style2, noise_rng: Optional[jax.Array] = None):
        kw = dict(
            use_pixel_norm=self.use_pixel_norm,
            use_instance_norm=self.use_instance_norm,
            use_noise=self.use_noise,
            dtype=self.dtype,
        )
        r1, r2 = (jax.random.split(noise_rng) if noise_rng is not None else (None, None))
        x = SGLayerEpilogue(**kw, name="epi1")(x, style1, r1)
        x = Conv(self.channels, 3, padding=1, dtype=self.dtype, name="conv")(x)
        return SGLayerEpilogue(**kw, name="epi2")(x, style2, r2)


class SGConstInputBlock(nn.Module):
    """Learned constant input image + SGInputBlock (``SGConstInputBlock:339-357``)."""

    channels: int
    init_img_size: int
    use_pixel_norm: bool = False
    use_instance_norm: bool = True
    use_noise: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, style1, style2, noise_rng: Optional[jax.Array] = None):
        init_img = self.param(
            "init_img", ones_init, (1, self.init_img_size, self.init_img_size, self.channels), jnp.float32
        )
        bias = self.param("bias", ones_init, (self.channels,), jnp.float32)
        b = style1.shape[0]
        x = jnp.broadcast_to(init_img, (b, *init_img.shape[1:])) + bias
        return SGInputBlock(
            self.channels,
            use_pixel_norm=self.use_pixel_norm,
            use_instance_norm=self.use_instance_norm,
            use_noise=self.use_noise,
            dtype=self.dtype,
            name="model",
        )(x, style1, style2, noise_rng)


class SGToImgBlock(nn.Module):
    """1x1 conv to image channels, kaiming init (``SGToImgBlock:360-370``)."""

    img_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return Conv(
            self.img_channels, 1, padding=0,
            kernel_init=kaiming_normal(0.2), bias_init=zeros_init,
            dtype=self.dtype, name="model",
        )(x)


class SGFromImgBlock(nn.Module):
    """1x1 conv from image + lrelu, kaiming init (``SGFromImgBlock:373-386``)."""

    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = Conv(
            self.out_channels, 1, padding=0,
            kernel_init=kaiming_normal(0.2), bias_init=zeros_init,
            dtype=self.dtype, name="conv",
        )(x)
        return leaky_relu(h)


class SGDecoderBlock(nn.Module):
    """upscale -> conv -> blur -> epi -> conv -> epi (``SGDecoderBlock:389-428``)."""

    out_channels: int
    use_pixel_norm: bool = False
    use_instance_norm: bool = True
    use_noise: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, style1, style2, noise_rng: Optional[jax.Array] = None):
        kw = dict(
            use_pixel_norm=self.use_pixel_norm,
            use_instance_norm=self.use_instance_norm,
            use_noise=self.use_noise,
            dtype=self.dtype,
        )
        ck = dict(kernel_init=kaiming_normal(0.2), bias_init=zeros_init, dtype=self.dtype)
        r1, r2 = (jax.random.split(noise_rng) if noise_rng is not None else (None, None))
        x = upscale2d(x)
        x = Conv(self.out_channels, 3, padding=1, **ck, name="conv1")(x)
        x = blur3x3(x)
        x = SGLayerEpilogue(**kw, name="epi1")(x, style1, r1)
        x = Conv(self.out_channels, 3, padding=1, **ck, name="conv2")(x)
        return SGLayerEpilogue(**kw, name="epi2")(x, style2, r2)


class SGEncoderBlock(nn.Module):
    """conv+lrelu+style-est x2 then avg-pool (``SGEncoderBlock:431-457``)."""

    out_channels1: int
    out_channels2: int
    style_dim: int
    pool: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        ck = dict(kernel_init=kaiming_normal(0.2), bias_init=zeros_init, dtype=self.dtype)
        x = leaky_relu(Conv(self.out_channels1, 3, padding=1, **ck, name="conv1")(x))
        style1 = StyleEstimator(self.style_dim, dtype=self.dtype, name="style_est1")(x)
        x = leaky_relu(Conv(self.out_channels2, 3, padding=1, **ck, name="conv2")(x))
        style2 = StyleEstimator(self.style_dim, dtype=self.dtype, name="style_est2")(x)
        if self.pool:
            x = avg_pool2d(x)
        return x, style1, style2


class SGDisBlock(nn.Module):
    """conv+lrelu x2 then avg-pool (``SGDisBlock:460-481``)."""

    out_channels1: int
    out_channels2: int
    pool: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        ck = dict(kernel_init=kaiming_normal(0.2), bias_init=zeros_init, dtype=self.dtype)
        x = leaky_relu(Conv(self.out_channels1, 3, padding=1, **ck, name="conv1")(x))
        x = leaky_relu(Conv(self.out_channels2, 3, padding=1, **ck, name="conv2")(x))
        if self.pool:
            x = avg_pool2d(x)
        return x


########################################################################################################################
# GIM face blocks (model_blocks.py:486-865; the entry-path blocks)
########################################################################################################################


class ResBlockDown(nn.Module):
    """SN residual down block (``ResBlockDown:486-514``).

    left: 1x1 SN conv -> avgpool; right: lrelu -> SN conv -> lrelu -> SN
    conv -> avgpool; sum.
    """

    out_channels: int
    conv_size: int = 3
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        # x may be a tuple of channel-concat parts (see SNConv): pooling and
        # leaky_relu act per pixel/channel, so they commute with the concat
        # and apply per part; the two entry convs consume the tuple directly
        parts = isinstance(x, (tuple, list))
        # pool BEFORE the 1x1 skip conv: a 1x1 conv commutes exactly with
        # average pooling (both linear, per-pixel), and pooling first cuts
        # the conv's FLOPs and — the real cost at [B*, 32, 32, C] — its
        # HBM write traffic by 4x (torch order: conv then pool, :492-506)
        res = SNConv(self.out_channels, 1, padding=0, dtype=self.dtype, name="conv_l1")(
            tuple(avg_pool2d(p) for p in x) if parts else avg_pool2d(x), update_sn
        )

        out = tuple(leaky_relu(p) for p in x) if parts else leaky_relu(x)
        out = SNConv(
            self.out_channels, self.conv_size, padding=self.padding, dtype=self.dtype, name="conv_r1"
        )(out, update_sn)
        out = leaky_relu(out)
        # the trailing avg-pool is folded into conv_r2 as a stride-2 conv
        # (exact; see _fold_kernel_for_downscale2) — the full-resolution
        # conv output never materialises (torch order: conv then pool,
        # ``model_blocks.py:507-510``)
        out = SNConv(
            self.out_channels, self.conv_size, padding=self.padding, dtype=self.dtype,
            downscale=2, name="conv_r2"
        )(out, update_sn)
        return res + out


class SelfAttention(nn.Module):
    """SAGAN self-attention over spatial tokens (``SelfAttention:517-549``).

    f/g/h are 1x1 SN convs; the attention map is softmax-normalised over
    the *source* token axis (reference ``Softmax(-2)``), i.e. each output
    token j is a convex combination over inputs i with A[i, j].  Token
    counts are <= H*W = 256 here, so the whole map fits VMEM; softmax runs
    in float32.
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        b, h, w, c = x.shape
        n = h * w
        cq = max(c // 8, 1)
        f = SNConv(cq, 1, padding=0, dtype=self.dtype, name="conv_f")(x, update_sn)
        g = SNConv(cq, 1, padding=0, dtype=self.dtype, name="conv_g")(x, update_sn)
        hproj = SNConv(c, 1, padding=0, dtype=self.dtype, name="conv_h")(x, update_sn)
        f = f.reshape(b, n, cq)
        g = g.reshape(b, n, cq)
        hproj = hproj.reshape(b, n, c)
        # A[b, i, j] = f_i . g_j ; softmax over i
        attn = jnp.einsum("bic,bjc->bij", f, g, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1)
        attn = attn.astype(hproj.dtype)
        out = jnp.einsum("bic,bij->bjc", hproj, attn, preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, c).astype(x.dtype)
        gamma = self.param("gamma", zeros_init, (1,), jnp.float32)
        return gamma * out + x


class ImgAttConvBlock(nn.Module):
    """SN residual conv block with 9x9 first conv (``ImgAttConvBlock:551-578``)."""

    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        res = SNConv(self.out_channels, 1, padding=0, dtype=self.dtype, name="conv_l1")(
            x, update_sn
        )
        out = leaky_relu(x)
        out = SNConv(self.out_channels, 9, padding=4, dtype=self.dtype, name="conv_r1")(
            out, update_sn
        )
        out = leaky_relu(out)
        out = SNConv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv_r2")(
            out, update_sn
        )
        return res + out


class ImgAttention(nn.Module):
    """Two-way spatial softmax blend of two images (``ImgAttention:581-608``)."""

    img1_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, update_sn: bool = False):
        c1 = self.img1_channels
        x = jnp.concatenate([x1, x2], axis=-1)
        q1 = ImgAttConvBlock(c1, dtype=self.dtype, name="q1conv")(x, update_sn)
        q2 = ImgAttConvBlock(c1, dtype=self.dtype, name="q2conv")(x, update_sn)
        k1 = ImgAttConvBlock(c1, dtype=self.dtype, name="k1conv")(x1, update_sn)
        k2 = ImgAttConvBlock(c1, dtype=self.dtype, name="k2conv")(x2, update_sn)
        v2 = ImgAttConvBlock(c1, dtype=self.dtype, name="v2conv")(x2, update_sn)

        scores1 = (q1 * k1).sum(axis=-1)  # [B, H, W]
        scores2 = (q2 * k2).sum(axis=-1)
        scores = jnp.stack([scores1, scores2], axis=-1).astype(jnp.float32)
        attention = jax.nn.softmax(scores, axis=-1).astype(x1.dtype)
        out1 = x1 * attention[..., 0:1]
        out2 = v2 * attention[..., 1:2]
        return out1 + out2


class AdaResBlock(nn.Module):
    """Legacy AdaIN residual block; styles given as [B, 2C] (``AdaResBlock:633-662``)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, style1, style2, update_sn: bool = False):
        c = x.shape[-1]
        res = x
        x = SNConv(c, 3, padding=1, dtype=self.dtype, name="conv1")(x, update_sn)
        x = ada_in(x, style1[:, :c], style1[:, c:])
        x = leaky_relu(x)
        x = SNConv(c, 3, padding=1, dtype=self.dtype, name="conv2")(x, update_sn)
        x = ada_in(x, style2[:, :c], style2[:, c:])
        return x + res


class ResBlockD(nn.Module):
    """SN conv + instance-norm residual block (``ResBlockD:665-691``)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        c = x.shape[-1]
        res = x
        out = SNConv(c, 3, padding=1, dtype=self.dtype, name="conv1")(x, update_sn)
        out = InstanceNorm(name="in1")(out)
        out = leaky_relu(out)
        out = SNConv(c, 3, padding=1, dtype=self.dtype, name="conv2")(out, update_sn)
        out = InstanceNorm(name="in2")(out)
        return out + res


class AdaResBlockUp(nn.Module):
    """Legacy AdaIN up block; styles as [B, 2C_in]/[B, 2C_out] (``AdaResBlockUp:694-730``)."""

    out_channels: int
    scale: int = 2
    conv_size: int = 3
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, style1, style2, update_sn: bool = False):
        c_in = x.shape[-1]
        # 1x1 skip conv before the nearest upsample (exact commutation; see
        # ResBlockUp)
        res = upscale2d(
            SNConv(self.out_channels, 1, padding=0, dtype=self.dtype, name="conv_l1")(
                x, update_sn
            ),
            self.scale,
        )
        out = ada_in(x, style1[:, :c_in], style1[:, c_in:])
        out = leaky_relu(out)
        out = upscale2d(out, self.scale)
        out = SNConv(
            self.out_channels, self.conv_size, padding=self.padding, dtype=self.dtype, name="conv_r1"
        )(out, update_sn)
        out = ada_in(out, style2[:, : self.out_channels], style2[:, self.out_channels :])
        out = leaky_relu(out)
        out = SNConv(
            self.out_channels, self.conv_size, padding=self.padding, dtype=self.dtype, name="conv_r2"
        )(out, update_sn)
        return out + res


class ResBlockUp(nn.Module):
    """SN residual up block with instance norm (``ResBlockUp:733-773``).

    left: nearest-upsample -> 1x1 SN conv; right: IN -> lrelu -> upsample
    -> SN conv -> IN -> lrelu -> SN conv; sum.
    """

    out_channels: int
    scale: int = 2
    conv_size: int = 3
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        # 1x1 skip conv BEFORE the nearest upsample: exactly commutative
        # (per-pixel linear map vs pixel duplication) at 1/4 the conv FLOPs
        # and traffic (torch order: upsample then conv, :747-751)
        res = upscale2d(
            SNConv(self.out_channels, 1, padding=0, dtype=self.dtype, name="conv_l1")(
                x, update_sn
            ),
            self.scale,
        )

        out = InstanceNorm(name="in1")(x)
        out = leaky_relu(out)
        if self.scale == 2:
            # upsample folded into the conv (exact; see SNConv.upscale)
            out = SNConv(
                self.out_channels, self.conv_size, padding=self.padding,
                dtype=self.dtype, upscale=2, name="conv_r1",
            )(out, update_sn)
        else:
            out = upscale2d(out, self.scale)
            out = SNConv(
                self.out_channels, self.conv_size, padding=self.padding,
                dtype=self.dtype, name="conv_r1",
            )(out, update_sn)
        out = InstanceNorm(name="in2")(out)
        out = leaky_relu(out)
        out = SNConv(
            self.out_channels, self.conv_size, padding=self.padding, dtype=self.dtype, name="conv_r2"
        )(out, update_sn)
        return out + res


class AdaResBlock2(nn.Module):
    """AdaIN residual block; style via 4 linears (``AdaResBlock2:776-814``).

    ``im2col_convs`` lowers the two 3x3 convs as dense matmuls — the res
    stage runs at 4x4 spatial where lax.conv underfills the MXU tiling.
    """

    channels: int
    style_dim: int
    dtype: Optional[Dtype] = None
    im2col_convs: bool = False

    @nn.compact
    def __call__(self, x, style, update_sn: bool = False):
        c = self.channels
        mean1 = Dense(c, dtype=self.dtype, name="lin1_mean")(style)
        std1 = Dense(c, dtype=self.dtype, name="lin1_std")(style)
        mean2 = Dense(c, dtype=self.dtype, name="lin2_mean")(style)
        std2 = Dense(c, dtype=self.dtype, name="lin2_std")(style)

        res = x
        x = SNConv(c, 3, padding=1, dtype=self.dtype, im2col=self.im2col_convs,
                   name="conv1")(x, update_sn)
        x = ada_in(x, mean1, std1)
        x = leaky_relu(x)
        x = SNConv(c, 3, padding=1, dtype=self.dtype, im2col=self.im2col_convs,
                   name="conv2")(x, update_sn)
        x = ada_in(x, mean2, std2)
        return x + res


class AdaResBlockUp2(nn.Module):
    """AdaIN residual up block; style via 4 linears (``AdaResBlockUp2:817-865``)."""

    in_channels: int
    out_channels: int
    scale: int = 2
    conv_size: int = 3
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, style, update_sn: bool = False):
        mean1 = Dense(self.in_channels, dtype=self.dtype, name="lin1_mean")(style)
        std1 = Dense(self.in_channels, dtype=self.dtype, name="lin1_std")(style)
        mean2 = Dense(self.out_channels, dtype=self.dtype, name="lin2_mean")(style)
        std2 = Dense(self.out_channels, dtype=self.dtype, name="lin2_std")(style)

        # 1x1 skip conv before the nearest upsample (exact commutation; see
        # ResBlockUp)
        res = upscale2d(
            SNConv(self.out_channels, 1, padding=0, dtype=self.dtype, name="conv_l1")(
                x, update_sn
            ),
            self.scale,
        )

        out = ada_in(x, mean1, std1)
        out = leaky_relu(out)
        if self.scale == 2:
            # upsample folded into the conv (exact; see SNConv.upscale)
            out = SNConv(
                self.out_channels, self.conv_size, padding=self.padding,
                dtype=self.dtype, upscale=2, name="conv_r1",
            )(out, update_sn)
        else:
            out = upscale2d(out, self.scale)
            out = SNConv(
                self.out_channels, self.conv_size, padding=self.padding,
                dtype=self.dtype, name="conv_r1",
            )(out, update_sn)
        out = ada_in(out, mean2, std2)
        out = leaky_relu(out)
        out = SNConv(
            self.out_channels, self.conv_size, padding=self.padding, dtype=self.dtype, name="conv_r2"
        )(out, update_sn)
        return out + res

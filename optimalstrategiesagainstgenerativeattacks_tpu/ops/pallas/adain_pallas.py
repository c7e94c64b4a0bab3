"""Fused AdaIN Pallas TPU kernel with a custom VJP.

AdaIN (reference ``model_blocks.ada_in:611-630``) is a bandwidth-bound
chain: per-(sample, channel) spatial mean + unbiased std, then an affine
re-normalisation against style statistics.  Naively that is three passes
over the feature map in HBM; this kernel does one read + one write per
pass (forward and backward each a single fused pass over VMEM-resident
tiles), with float32 statistics regardless of the activation dtype.

Semantics parity with ``ops.adain.ada_in``: unbiased (N-1) std, eps added
to the std (torch ``torch.std`` + eps).

Layout: NHWC; grid over the batch axis, each program owns one sample's
[H, W, C] tile (<= 32*32*512 bf16 = 1 MiB, comfortably inside VMEM).
Style vectors travel as [B, 1, C] so each block's trailing two dims equal
the array dims (a Mosaic block-shape requirement).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(eps: float, x_ref, mean_s_ref, std_s_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)  # [H, W, C]
    h, w, c = x.shape
    n = h * w
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    centred = x - mean
    var = jnp.sum(centred * centred, axis=(0, 1), keepdims=True) / max(n - 1, 1)
    inv = 1.0 / (jnp.sqrt(var) + eps)
    s = std_s_ref[0].astype(jnp.float32)[None, :, :]   # [1, 1, C]
    m = mean_s_ref[0].astype(jnp.float32)[None, :, :]
    out_ref[0] = (s * centred * inv + m).astype(out_ref.dtype)


def _bwd_kernel(eps: float, x_ref, std_s_ref, g_ref, dx_ref, dm_ref, ds_ref):
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    h, w, c = x.shape
    n = h * w
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    centred = x - mean
    var = jnp.sum(centred * centred, axis=(0, 1), keepdims=True) / max(n - 1, 1)
    sigma = jnp.sqrt(var)
    f = sigma + eps
    inv_f = 1.0 / f
    s = std_s_ref[0].astype(jnp.float32)[None, :, :]

    g_mean = jnp.mean(g, axis=(0, 1), keepdims=True)
    g_dot_c = jnp.sum(g * centred, axis=(0, 1), keepdims=True)

    # dL/dx = s/f (g - mean g) - s/f^2 * centred/((N-1) sigma) * sum(g*centred)
    dx = s * inv_f * (g - g_mean) - (
        s * inv_f * inv_f * g_dot_c / (max(n - 1, 1) * sigma)
    ) * centred
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dm_ref[0] = jnp.sum(g, axis=(0, 1))[None, :].astype(dm_ref.dtype)  # [1, C]
    ds_ref[0] = (g_dot_c[0] * inv_f[0]).astype(ds_ref.dtype)           # [1, C]


def _run_fwd(x, mean_style, std_style, eps, interpret):
    b, h, w, c = x.shape
    mean_style = mean_style.reshape(b, 1, c)
    std_style = std_style.reshape(b, 1, c)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, mean_style, std_style)


def _run_bwd(x, std_style, g, eps, interpret):
    b, h, w, c = x.shape
    f32 = jnp.float32
    std_style = std_style.reshape(b, 1, c)
    dx, dm, ds = pl.pallas_call(
        functools.partial(_bwd_kernel, eps),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),        # dx
            jax.ShapeDtypeStruct((b, 1, c), f32),          # d mean_style
            jax.ShapeDtypeStruct((b, 1, c), f32),          # d std_style
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, std_style, g)
    return dx, dm.reshape(b, c), ds.reshape(b, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ada_in_pallas(feature, mean_style, std_style, eps: float = 1e-5,
                  interpret: bool = False):
    """Fused AdaIN: NHWC feature, [B, C] style mean/std -> NHWC."""
    return _run_fwd(feature, mean_style, std_style, eps, interpret)


def _vjp_fwd(feature, mean_style, std_style, eps, interpret):
    out = _run_fwd(feature, mean_style, std_style, eps, interpret)
    return out, (feature, std_style)


def _vjp_bwd(eps, interpret, residuals, g):
    feature, std_style = residuals
    dx, dm, ds = _run_bwd(feature, std_style, g, eps, interpret)
    return dx, dm.astype(jnp.float32), ds.astype(jnp.float32)


ada_in_pallas.defvjp(_vjp_fwd, _vjp_bwd)

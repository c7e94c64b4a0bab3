"""Fused SAGAN self-attention core as a Pallas TPU kernel.

The reference attention (``model_blocks.SelfAttention:517-549``) operates
over at most H*W = 256 spatial tokens, so one batch element's whole
attention problem — f [N, C'], g [N, C'], h [N, C], the N x N map, the
softmax, and the output contraction — fits in VMEM.  This kernel fuses
QK^T -> softmax(axis=source) -> weighted sum into a single pass: the
N x N attention matrix never touches HBM.

Semantics parity: A[i, j] = f_i . g_j, softmax over the SOURCE axis i
(reference ``Softmax(-2)``), out_j = sum_i h_i A[i, j].  Softmax and both
matmuls accumulate in float32.

The 1x1 f/g/h convolutions stay outside the kernel (they are plain
matmuls XLA already places on the MXU optimally).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(f_ref, g_ref, h_ref, out_ref):
    f = f_ref[0].astype(jnp.float32)  # [N, Cq]
    g = g_ref[0].astype(jnp.float32)  # [N, Cq]
    h = h_ref[0].astype(jnp.float32)  # [N, C]
    # A[i, j] = f_i . g_j
    attn = jax.lax.dot_general(
        f, g, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, N]
    # softmax over i (the source/row axis)
    attn = attn - jnp.max(attn, axis=0, keepdims=True)
    attn = jnp.exp(attn)
    attn = attn / jnp.sum(attn, axis=0, keepdims=True)
    # out_j = sum_i h_i A[i, j]  ->  out = A^T @ h
    out = jax.lax.dot_general(
        attn, h, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, C]
    out_ref[0] = out.astype(out_ref.dtype)


def _run_attn(f, g, h, interpret):
    b, n, cq = f.shape
    c = h.shape[-1]
    return pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), h.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, cq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(f, g, h)


def _reference_core(f, g, h):
    """Pure-jnp reference of the attention core (also the backward graph)."""
    attn = jnp.einsum("bic,bjc->bij", f, g, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1).astype(h.dtype)
    return jnp.einsum("bic,bij->bjc", h, attn, preferred_element_type=jnp.float32).astype(h.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def self_attention_pallas(f, g, h, interpret: bool = False):
    """([B,N,Cq], [B,N,Cq], [B,N,C]) -> [B,N,C] fused attention core.

    Forward is the fused Pallas kernel (the N x N map never leaves VMEM);
    backward recomputes through the jnp reference graph — at N <= 256 the
    recompute is trivially cheap and XLA fuses it well.
    """
    return _run_attn(f, g, h, interpret)


def _attn_vjp_fwd(f, g, h, interpret):
    return _run_attn(f, g, h, interpret), (f, g, h)


def _attn_vjp_bwd(interpret, residuals, grad_out):
    f, g, h = residuals
    _, vjp = jax.vjp(_reference_core, f, g, h)
    return vjp(grad_out)


self_attention_pallas.defvjp(_attn_vjp_fwd, _attn_vjp_bwd)

"""Batched spectral-norm state updates, hoisted out of the module forwards.

The reference wraps ~50 convs per player in ``nn.utils.spectral_norm``
(``models/model_blocks.py:492-495`` et al.), each carrying its own
power-iteration ``u``/``v`` vectors that torch updates on every train-mode
forward.  Run naively inside a jitted train step, that is hundreds of tiny
matvec / L2-norm kernels per step — pure dispatch overhead on TPU.

This module computes the whole player's spectral state in a handful of
*shape-grouped batched einsums* instead:

  * ``power_iterate(params, spectral)``: one power iteration for EVERY
    spectrally-normalised kernel at once (outside the loss; u/v are
    never differentiated — torch stop-gradients them the same way).
  * ``compute_sigmas(params, spectral)``: the per-kernel first singular
    value sigma = u^T W v as a pytree mirroring ``spectral``.  Called
    INSIDE the loss so gradients flow through W exactly as in torch, and
    passed to ``apply`` as the ``sigmas`` variable collection, where
    ``SNConv`` uses it instead of re-deriving sigma per call.

Kernels are grouped by their (out_features, fan_in) matrix shape; stacked
parameters from ``nn.vmap`` / ``nn.scan`` wrappers (leading axes on the
HWIO kernel) fold naturally into the group batch.  Math is identical to
the per-module path (same reduction axes, same eps placement).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax.core import unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict

_EPS = 1e-12


def _w_mats(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """HWIO kernel (with optional leading stack axes) -> ([S, out, fan], stack_shape).

    Row-major fan order matches torch's ``weight.view(out, -1)`` on an
    (out, in, kh, kw) tensor, i.e. HWIO -> transpose to (out, in, kh, kw).
    """
    stack_shape = kernel.shape[:-4]
    kh, kw, cin, cout = kernel.shape[-4:]
    k = kernel.reshape((-1,) + kernel.shape[-4:])
    w = jnp.transpose(k, (0, 4, 3, 1, 2)).reshape(k.shape[0], cout, cin * kh * kw)
    return w, stack_shape


def _collect(params: Any, spectral: Any):
    """Group every (kernel, u, v) triple by (out, fan) matrix shape.

    Returns (groups, flat_spec) where groups maps (out, fan) -> list of
    (path_prefix, stack_shape, w [S,out,fan], u [S,out], v [S,fan]).
    """
    flat_s = flatten_dict(unfreeze(spectral))
    flat_p = flatten_dict(unfreeze(params))
    prefixes = sorted({p[:-1] for p in flat_s if p[-1] == "u"})
    groups: Dict[Tuple[int, int], List] = {}
    for pre in prefixes:
        kernel = flat_p[pre + ("kernel",)]
        u = flat_s[pre + ("u",)]
        v = flat_s[pre + ("v",)]
        w, stack_shape = _w_mats(kernel)
        s = w.shape[0]
        groups.setdefault(w.shape[1:], []).append(
            (pre, stack_shape, w, u.reshape(s, -1), v.reshape(s, -1))
        )
    return groups


def _l2n(x: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def _matvec(eq: str, w, x, dtype):
    """Kernel-group matvec; with a compute ``dtype`` of bf16 the [S,out,fan]
    kernel read (the dominant HBM cost of the spectral pass — e.g. the
    flagship's [15,512,4608] group) moves at half the bytes, while the
    contraction still accumulates in f32 (``preferred_element_type``).
    Direction vectors tolerate bf16 rounding: one power iteration per step
    is itself an approximation (same policy as torch's per-forward update).

    Measured on the real chip (round 3, flagship config): 165.69 ms/step
    vs 161.8 ms for the f32 path — NO win; the spectral reads were already
    overlapped with compute, so halving their bytes doesn't shorten the
    critical path.  Kept as an opt-in knob, default OFF.
    """
    if dtype is None:
        return jnp.einsum(eq, w, x)
    return jnp.einsum(
        eq, w.astype(dtype), x.astype(dtype),
        preferred_element_type=jnp.float32,
    )


def power_iterate(
    params: Any, spectral: Any, eps: float = _EPS, matvec_dtype=None
) -> Any:
    """One batched power iteration per SN kernel; returns the new spectral tree.

    Matches the per-module ``update_sn=True`` path in ``nn/blocks.py``:
    v' = l2n(W^T u), u' = l2n(W v'), with W stop-gradiented.
    """
    if not spectral:
        return spectral
    out_flat = {}
    for _, entries in _collect(params, spectral).items():
        w = jax.lax.stop_gradient(jnp.concatenate([e[2] for e in entries], axis=0))
        u = jnp.concatenate([e[3] for e in entries], axis=0)
        v1 = _l2n(_matvec("bof,bo->bf", w, u, matvec_dtype), eps)
        u1 = _l2n(_matvec("bof,bf->bo", w, v1, matvec_dtype), eps)
        i = 0
        for pre, stack_shape, we, _, _ in entries:
            s = we.shape[0]
            out_flat[pre + ("u",)] = u1[i : i + s].reshape(stack_shape + (-1,)) \
                if stack_shape else u1[i]
            out_flat[pre + ("v",)] = v1[i : i + s].reshape(stack_shape + (-1,)) \
                if stack_shape else v1[i]
            i += s
    return unflatten_dict(out_flat)


def compute_sigmas(params: Any, spectral: Any, matvec_dtype=None) -> Any:
    """Batched sigma = u^T W v for every SN kernel (differentiable through W).

    Returns a pytree shaped like ``spectral`` with a ``sigma`` leaf per
    conv (scalar, or the module's stack shape under vmap/scan), suitable
    for passing to ``apply`` as the ``sigmas`` collection.  Stays f32 by
    default: sigma feeds the kernel normalisation, and its backward
    contributes u v^T to every conv grad — the extra read is one transpose
    pass, not the hot path.
    """
    if not spectral:
        return {}
    out_flat = {}
    for _, entries in _collect(params, spectral).items():
        w = jnp.concatenate([e[2] for e in entries], axis=0)
        u = jax.lax.stop_gradient(jnp.concatenate([e[3] for e in entries], axis=0))
        v = jax.lax.stop_gradient(jnp.concatenate([e[4] for e in entries], axis=0))
        if matvec_dtype is not None:
            sig = jnp.einsum(
                "bo,bof,bf->b", u.astype(matvec_dtype), w.astype(matvec_dtype),
                v.astype(matvec_dtype), preferred_element_type=jnp.float32,
            )
        else:
            sig = jnp.einsum("bo,bof,bf->b", u, w, v)
        i = 0
        for pre, stack_shape, we, _, _ in entries:
            s = we.shape[0]
            out_flat[pre + ("sigma",)] = (
                sig[i : i + s].reshape(stack_shape) if stack_shape else sig[i]
            )
            i += s
    return unflatten_dict(out_flat)

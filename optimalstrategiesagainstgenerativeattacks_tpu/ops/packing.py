"""Shape-grouped leaf stacking for optimizer updates.

The flagship step's profile shows ~12 ms in ~7k tiny per-leaf Adam kernels
(the two players have hundreds of small bias/scale/norm leaves).
``optax.flatten`` collapses them into ONE kernel but ravels every leaf into
a flat f32 vector, which forces XLA to re-linearise the TPU-tiled layouts
of the big conv kernels — measured 17 ms SLOWER end-to-end (round 3, see
``ImageGameConfig.flatten_opt``).

Measured on the real chip (round 3, flagship B128/img32/style512):
163.65 ms/step vs 161.8 ms for the per-leaf layout — a WASH.  The tiny
Adam kernels were already overlapped with the convs' HBM traffic, so
removing them doesn't shorten the critical path, and the non-singleton
stack/unstack copies give the ~2 ms back.  Kept as an opt-in knob
(exact semantics, pinned by ``tests/test_packing.py``; sharding-invariant
under dp x tp, pinned by ``tests/test_image_training.py``), default OFF.

``stack_same_shape`` takes the middle road: leaves are grouped by
``(shape, dtype)`` and each group is stacked along a NEW leading axis.  A
stack preserves each slice's minor-dim layout (no re-tiling), singleton
groups pass through untouched (zero copies for the big unique conv kernels),
and the per-leaf elementwise Adam ops become one kernel per group.

Semantics are exact up to 1-2 f32 ulp: stacking is a permutation of memory
and Adam is elementwise; the only divergence is XLA's fusion-dependent
1/sqrt rewrite (`tests/test_packing.py` pins rtol=3e-7).  The wrapped optimizer's STATE layout changes
(moments live stacked), so flipping this knob invalidates old opt-state
checkpoints — params/spectral are unaffected.

Reference context: the torch reference keeps 6 ``torch.optim.Adam`` param
groups (``training/gim_img_trainer.py:51-58``); this wrapper is a TPU-side
fusion of the same update rule, not a behaviour change.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def _group_indices(leaves):
    """Deterministic (shape, dtype) grouping of flattened leaves.

    Returns an ordered list of index lists; order is by first occurrence so
    it is stable across processes (it depends only on the tree structure).
    """
    order = []
    groups = {}
    for i, x in enumerate(leaves):
        key = (tuple(x.shape), jnp.result_type(x).name)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(i)
    return [groups[k] for k in order]


def _pack(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx_groups = _group_indices(leaves)
    packed = {}
    for j, idx in enumerate(idx_groups):
        if len(idx) == 1:  # singleton: no copy, no leading axis
            packed[f"g{j:04d}"] = leaves[idx[0]]
        else:
            packed[f"g{j:04d}"] = jnp.stack([leaves[i] for i in idx])
    return packed, (treedef, idx_groups, len(leaves))


def _unpack(packed, meta):
    treedef, idx_groups, n = meta
    leaves = [None] * n
    for j, idx in enumerate(idx_groups):
        arr = packed[f"g{j:04d}"]
        if len(idx) == 1:
            leaves[idx[0]] = arr
        else:
            for r, i in enumerate(idx):
                leaves[i] = arr[r]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class StackedState(NamedTuple):
    inner_state: Any


def stack_same_shape(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap ``inner`` to run on same-shape leaf stacks (see module docstring).

    Composes with ``optax.multi_transform``/``optax.masked``: optax's
    ``MaskedNode`` placeholders are empty NamedTuples that flatten to zero
    leaves, so masked-out subtrees simply never enter a group.
    """

    def init_fn(params):
        packed, _ = _pack(params)
        return StackedState(inner.init(packed))

    def update_fn(updates, state, params=None):
        packed_u, meta = _pack(updates)
        packed_p = _pack(params)[0] if params is not None else None
        new_u, new_inner = inner.update(packed_u, state.inner_state, packed_p)
        return _unpack(new_u, meta), StackedState(new_inner)

    return optax.GradientTransformation(init_fn, update_fn)

"""Checkpoint manager with the reference's filename/latest-pick contract.

Contract parity (``training/checkpoints.py:9-44``,
``training/utils.py:160-164``): one snapshot per step named
``model_{step:08d}`` under ``<outdir>/ckpts/``, containing global_step,
last_epoch, and the state of both agents, both optimizers, and the
spectral-norm vectors.  Orbax writes each snapshot as a directory rather
than a single ``.pt`` file; ``get_latest_ckpt`` picks the max step from the
name exactly as the reference does.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_PREFIX = "model_"


def resolve_ckpt_path(path: str, outdir: str) -> str:
    """Resolve a resume/pretrained path the way the reference CLIs are used:
    relative paths that don't exist from the cwd are tried against the
    experiment outdir (so ``-r ckpts/model_00085000`` works no matter where
    the CLI is launched from)."""
    if not os.path.isabs(path) and not os.path.exists(path):
        candidate = os.path.join(outdir, path)
        if os.path.exists(candidate):
            return candidate
    return path


class CheckpointIO:
    """Save/restore the full game state as orbax pytrees."""

    def __init__(self, checkpoint_dir: str):
        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def path_for_step(self, step: int) -> str:
        return os.path.join(self.checkpoint_dir, f"{CKPT_PREFIX}{step:08d}")

    def save(self, state: Any, step: int, last_epoch: int = 1) -> str:
        payload = {
            "global_step": np.asarray(step, np.int64),
            "last_epoch": np.asarray(last_epoch, np.int64),
            "state": jax.device_get(state),
        }
        path = self.path_for_step(step)
        self._ckptr.save(path, payload, force=True)
        return path

    def load(self, path: str, template: Any) -> Tuple[Any, int, int]:
        """Restore a snapshot; returns (state, global_step, last_epoch).

        ``template`` is an abstract/concrete state pytree used to restore
        with the right dtypes/shardings.
        """
        payload = self._ckptr.restore(
            os.path.abspath(path),
            item={
                "global_step": np.asarray(0, np.int64),
                "last_epoch": np.asarray(0, np.int64),
                "state": jax.device_get(template),
            },
        )
        return (
            payload["state"],
            int(payload["global_step"]),
            int(payload["last_epoch"]),
        )


def get_latest_ckpt(ckpt_dir_path: str, prefix: str = CKPT_PREFIX) -> str:
    """Latest checkpoint path by max step parsed from the name
    (``training/utils.py:160-164``)."""
    pat = re.compile(re.escape(prefix) + r"(\d+)$")
    entries = []
    for name in os.listdir(ckpt_dir_path):
        m = pat.match(name)
        if m:
            entries.append((int(m.group(1)), name))
    if not entries:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir_path}")
    _, name = max(entries)
    return os.path.join(ckpt_dir_path, name)

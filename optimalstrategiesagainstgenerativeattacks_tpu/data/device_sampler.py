"""Device-resident episodic sampling: the whole dataset lives in HBM.

TPU-first replacement for the host batch loader on RAM-scale datasets
(reference feeding: per-item ``DataLoader`` + ``.to(device)``,
``gim_img_training.py:219-221``): when every class has the same image
count, the full uint8 cache ``[n_classes, t, H, W, C]`` is staged onto the
device ONCE and every training batch is assembled by a jitted gather —
class pick, per-episode disjoint frame pick (argsort-of-uniforms), and the
random mirror augmentation all run on device.  After the one-time upload,
training moves ZERO image bytes over the host<->device link.

Motivation (round 3, measured): the dev host's HTTP tunnel carries
8-11 MB/s while the VoxCeleb2-shape config consumes 17 MB/step of uint8 —
host feeding caps that game at ~0.5 steps/s against the chip's ~2.1.
VoxCeleb2 at 64x64x3 with 6k videos x 20 frames is ~1.5 GB uint8 — HBM
(16 GB) holds it with room to spare; Omniglot (964 x 20 x 28x28) is 15 MB.

Episode semantics match ``EpisodicBatchLoader`` over the same dataset:
each epoch visits ``example_cnt_per_class`` episodes per class in a
seeded shuffled order (one permutation per epoch), each episode draws
m+n+k distinct frames from its class uniformly without replacement, and
mirror augmentation flips each image independently with p=0.5.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np


class DeviceEpisodicLoader:
    """Iterator-compatible drop-in for ``EpisodicBatchLoader`` that yields
    device-resident uint8 batches.

    Single-device path (the multi-device training path shards batches over
    the mesh's data axis from the host loader; see train_gim_imgs).
    """

    def __init__(self, ds, batch_size: int, seed: int = 0,
                 drop_last: bool = True):
        cache = ds.stacked_cache()
        if cache is None:
            raise ValueError(
                "dataset has no uniform stacked cache; use EpisodicBatchLoader"
            )
        self.ds = ds
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0
        self.m, self.n, self.si = ds.m, ds.n, ds.si
        self.take = self.m + self.n + self.si
        self.n_classes, self.t = cache.shape[:2]
        if self.take > self.t:
            raise ValueError(f"m+n+k={self.take} > images per class {self.t}")
        self.example_cnt_per_class = ds.example_cnt_per_class
        self.mirror = bool(getattr(ds, "mirror", False))
        # one-time upload; training then never moves image bytes to device
        self.data = jax.device_put(cache)
        self._sample = jax.jit(
            functools.partial(
                _sample_batch,
                m=self.m, n=self.n, take=self.take, t=self.t,
                mirror=self.mirror,
            )
        )

    def __len__(self) -> int:
        n = self.n_classes * self.example_cnt_per_class
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        n = self.n_classes * self.example_cnt_per_class
        # same schedule contract as the host loader: a seeded permutation of
        # (class x example) indices per epoch. The int32 index slices are
        # the ONLY per-batch host->device traffic (KBs).
        order_rng = np.random.default_rng((self.seed, self._epoch))
        order = order_rng.permutation(n)
        cls_ids = (order // self.example_cnt_per_class).astype(np.int32)
        base_key = jax.random.PRNGKey(
            np.uint32((self.seed * 1_000_003 + self._epoch) & 0x7FFFFFFF)
        )
        end = n - (n % self.batch_size) if self.drop_last else n
        for i, start in enumerate(range(0, end, self.batch_size)):
            cls = jnp.asarray(cls_ids[start : start + self.batch_size])
            yield self._sample(self.data, cls, jax.random.fold_in(base_key, i))
        self._epoch += 1


def _sample_batch(data, cls, key, *, m: int, n: int, take: int, t: int,
                  mirror: bool):
    """[n_cls, t, H, W, C] uint8, [B] int32, key -> episodic batch dict.

    Disjoint frame pick per episode via argsort of uniforms (the same
    trick as OmniglotGIMDataSet.sample_batch, on device); optional
    per-image random horizontal mirror.
    """
    b = cls.shape[0]
    k_ord, k_mir = jax.random.split(key)
    order = jnp.argsort(jax.random.uniform(k_ord, (b, t)), axis=1)[:, :take]
    ep = data[cls[:, None], order]  # gather: [B, take, H, W, C] uint8
    if mirror:
        flip = jax.random.bernoulli(k_mir, 0.5, (b, take))
        ep = jnp.where(flip[:, :, None, None, None], ep[:, :, :, ::-1, :], ep)
    return {
        "leaked_sample": ep[:, :m],
        "real_sample": ep[:, m : m + n],
        "si_sample": ep[:, m + n :],
        "class": cls.astype(jnp.int32),
    }

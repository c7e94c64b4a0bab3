"""Device-resident episodic sampling (``data/device_sampler.py``)."""

import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.data.device_sampler import (
    DeviceEpisodicLoader,
)


class _FakeDS:
    """Uniform-count episodic dataset stub: class c's image j is filled
    with value (c * 31 + j) so provenance is checkable per pixel."""

    def __init__(self, n_classes=6, t=9, hw=4, c=1, m=1, n=2, si=3,
                 example_cnt_per_class=4, mirror=False):
        self.m, self.n, self.si = m, n, si
        self.example_cnt_per_class = example_cnt_per_class
        self.mirror = mirror
        base = np.arange(n_classes, dtype=np.uint8)[:, None] * 31
        per = base + np.arange(t, dtype=np.uint8)[None, :]
        self._cache = np.broadcast_to(
            per[:, :, None, None, None], (n_classes, t, hw, hw, c)
        ).copy()

    def stacked_cache(self):
        return self._cache


def test_device_loader_episode_structure():
    ds = _FakeDS()
    loader = DeviceEpisodicLoader(ds, batch_size=4, seed=3)
    assert len(loader) == (6 * 4) // 4
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        leaked = np.asarray(b["leaked_sample"])
        real = np.asarray(b["real_sample"])
        si = np.asarray(b["si_sample"])
        cls = np.asarray(b["class"])
        assert leaked.shape == (4, 1, 4, 4, 1) and leaked.dtype == np.uint8
        assert real.shape == (4, 2, 4, 4, 1)
        assert si.shape == (4, 3, 4, 4, 1)
        for i in range(4):
            ep = np.concatenate([leaked[i], real[i], si[i]], axis=0)
            vals = ep[:, 0, 0, 0].astype(np.int64)
            # every image comes from the episode's class...
            assert np.all(vals // 31 == cls[i]), (vals, cls[i])
            # ...and the m+n+k frames are DISTINCT (disjoint sampling)
            assert len(set(vals.tolist())) == ep.shape[0]


def test_device_loader_epoch_schedule_matches_host_contract():
    """Each epoch visits every class exactly example_cnt_per_class times
    (the EpisodicBatchLoader permutation contract), and epochs reshuffle."""
    ds = _FakeDS(n_classes=5, example_cnt_per_class=3)
    loader = DeviceEpisodicLoader(ds, batch_size=5, seed=0)
    cls_e0 = np.concatenate([np.asarray(b["class"]) for b in loader])
    counts = np.bincount(cls_e0, minlength=5)
    np.testing.assert_array_equal(counts, np.full(5, 3))
    cls_e1 = np.concatenate([np.asarray(b["class"]) for b in loader])
    assert not np.array_equal(cls_e0, cls_e1)  # epoch reshuffle
    # reproducible: a fresh loader with the same seed replays epoch 0
    again = DeviceEpisodicLoader(ds, batch_size=5, seed=0)
    np.testing.assert_array_equal(
        cls_e0, np.concatenate([np.asarray(b["class"]) for b in again])
    )


def test_device_loader_mirror_flips_on_device():
    ds = _FakeDS(hw=2, mirror=True)
    # make images horizontally asymmetric: left column 0, right column 9
    cache = ds._cache
    cache[..., 0, :] = 0
    cache[..., 1, :] = 9
    loader = DeviceEpisodicLoader(ds, batch_size=6, seed=1)
    b = next(iter(loader))
    si = np.asarray(b["si_sample"])  # [6, 3, 2, 2, 1]
    rows = si[..., 0, :, 0].reshape(-1, 2)
    flipped = np.all(rows == [9, 0], axis=1)
    unflipped = np.all(rows == [0, 9], axis=1)
    assert np.all(flipped | unflipped)
    assert flipped.any() and unflipped.any()  # p=0.5 actually flips some


def test_device_loader_rejects_nonuniform():
    class _NoCache(_FakeDS):
        def stacked_cache(self):
            return None

    with pytest.raises(ValueError, match="uniform"):
        DeviceEpisodicLoader(_NoCache(), batch_size=4)

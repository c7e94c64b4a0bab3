"""Input-pipeline tests: synthetic on-disk fixtures for the episodic
datasets, disjointness/shape/filtering semantics, batch loader, prefetch."""

import os

import numpy as np
import pytest
from PIL import Image

from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
    ArcfaceDataSet,
    EpisodicBatchLoader,
    ImgGIMDataSet,
    OmniglotGIMDataSet,
    load_image,
    normalize_uint8,
)
from optimalstrategiesagainstgenerativeattacks_tpu.data.prefetch import device_prefetch


def _write_img(path, value, size=8, channels=3):
    arr = np.full((size, size, channels), value, np.uint8)
    if channels == 1:
        arr = arr[:, :, 0]
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def flat_ds_root(tmp_path_factory):
    """<root>/train/<class>/*.jpg with 4 classes; one class has too few images."""
    root = tmp_path_factory.mktemp("flat_ds")
    train = root / "train"
    for ci in range(3):
        cdir = train / f"class_{ci}"
        cdir.mkdir(parents=True)
        for ii in range(8):
            _write_img(str(cdir / f"{ii:03d}.jpg"), value=ci * 50 + ii)
    small = train / "class_small"
    small.mkdir()
    for ii in range(2):  # fewer than m+n+k
        _write_img(str(small / f"{ii:03d}.jpg"), value=200)
    return str(root)


@pytest.fixture(scope="module")
def hier_ds_root(tmp_path_factory):
    """<root>/train/<group>/<class>/*.jpg (VoxCeleb2 layout)."""
    root = tmp_path_factory.mktemp("hier_ds")
    for gi in range(2):
        for ci in range(2):
            cdir = root / "train" / f"id_{gi}" / f"{ci:04d}"
            cdir.mkdir(parents=True)
            for ii in range(7):
                _write_img(str(cdir / f"{ii:08d}.jpg"), value=gi * 100 + ci * 30 + ii)
    return str(root)


@pytest.fixture(scope="module")
def omniglot_root(tmp_path_factory):
    """<root>/train/<alphabet>/<character>/*.png (Omniglot layout)."""
    root = tmp_path_factory.mktemp("omniglot")
    for a in range(2):
        for c in range(3):
            cdir = root / "train" / f"Alphabet_{a}" / f"character{c:02d}"
            cdir.mkdir(parents=True)
            for ii in range(20):
                _write_img(str(cdir / f"{ii:04d}.png"), value=(a * 3 + c) * 10 + ii,
                           channels=1)
    return str(root)


def test_load_image_shapes(flat_ds_root):
    path = os.path.join(flat_ds_root, "train", "class_0", "000.jpg")
    img = load_image(path, img_size=16, img_mode="RGB")
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    gray = load_image(path, img_size=16, img_mode="L")
    assert gray.shape == (16, 16, 1)


def test_flat_dataset_filters_small_classes(flat_ds_root):
    ds = ImgGIMDataSet(flat_ds_root, "train", img_channels=3, img_size=8,
                       m=1, n=2, si=2, example_cnt_per_class=5)
    assert ds.n_classes == 3  # class_small filtered out
    assert len(ds) == 15


def test_episode_shapes_and_disjointness(flat_ds_root):
    ds = ImgGIMDataSet(flat_ds_root, "train", img_channels=3, img_size=8,
                       m=2, n=3, si=3, example_cnt_per_class=1, mirror=False)
    ep = ds.sample_episode(0, np.random.default_rng(0))
    assert ep["real_sample"].shape == (3, 8, 8, 3)
    assert ep["leaked_sample"].shape == (2, 8, 8, 3)
    assert ep["si_sample"].shape == (3, 8, 8, 3)
    # images of class_0 encode their file index in the pixel value -> disjoint
    vals = np.concatenate([
        ep["real_sample"][:, 0, 0, 0], ep["leaked_sample"][:, 0, 0, 0],
        ep["si_sample"][:, 0, 0, 0],
    ])
    assert len(set(vals.tolist())) == 8


def test_hierarchical_dataset(hier_ds_root):
    ds = ImgGIMDataSet(hier_ds_root, "train", img_channels=3, img_size=8,
                       m=1, n=2, si=2, example_cnt_per_class=2, hierarchical=True)
    assert ds.n_classes == 4  # 2 groups x 2 video dirs
    ep = ds[5]
    assert ep["real_sample"].shape == (2, 8, 8, 3)


def test_omniglot_ram_cache(omniglot_root):
    ds = OmniglotGIMDataSet(omniglot_root, "train", img_channels=1, img_size=8,
                            m=1, n=5, si=5, example_cnt_per_class=3)
    assert ds.n_classes == 6
    assert len(ds.data) == 6 and ds.data[0].shape == (20, 8, 8, 1)
    ep = ds[7]
    assert ep["real_sample"].shape == (5, 8, 8, 1)
    assert ep["real_sample"].dtype == np.uint8


def test_omniglot_rejects_oversized_episode(omniglot_root):
    with pytest.raises(ValueError):
        OmniglotGIMDataSet(omniglot_root, "train", img_channels=1, img_size=8,
                           m=10, n=10, si=10, example_cnt_per_class=1)


def test_batch_loader_shapes_and_determinism(omniglot_root):
    ds = OmniglotGIMDataSet(omniglot_root, "train", img_channels=1, img_size=8,
                            m=1, n=3, si=3, example_cnt_per_class=2)
    loader = EpisodicBatchLoader(ds, batch_size=4, shuffle=True, seed=7)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["real_sample"].shape == (4, 3, 8, 8, 1)
    assert b["class"].shape == (4,)
    # same seed + epoch -> identical stream (reference is irreproducible here)
    loader2 = EpisodicBatchLoader(ds, batch_size=4, shuffle=True, seed=7)
    b2 = next(iter(loader2))
    np.testing.assert_array_equal(b["real_sample"], b2["real_sample"])


def test_batch_loader_threaded(flat_ds_root):
    ds = ImgGIMDataSet(flat_ds_root, "train", img_channels=3, img_size=8,
                       m=1, n=2, si=2, example_cnt_per_class=4)
    loader = EpisodicBatchLoader(ds, batch_size=4, num_workers=4, seed=3)
    batches = list(loader)
    assert batches and batches[0]["leaked_sample"].shape == (4, 1, 8, 8, 3)


def test_device_prefetch(omniglot_root):
    import jax

    ds = OmniglotGIMDataSet(omniglot_root, "train", img_channels=1, img_size=8,
                            m=1, n=2, si=2, example_cnt_per_class=1)
    loader = EpisodicBatchLoader(ds, batch_size=2, seed=0)
    out = list(device_prefetch(iter(loader), depth=2))
    assert len(out) == len(loader)
    assert isinstance(out[0]["real_sample"], jax.Array)
    x = normalize_uint8(out[0]["real_sample"])
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0


def test_arcface_dataset(flat_ds_root):
    ds = ArcfaceDataSet(flat_ds_root, "train", img_channels=3, img_size=8,
                        example_cnt_per_class=3)
    img, cls = ds[4]
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    assert 0 <= cls < ds.n_classes

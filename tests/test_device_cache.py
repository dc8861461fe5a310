"""DeviceCacheLoader: device-resident dataset + on-device augmentation
(gssd_tpu/data/device_cache.py). Checks the on-device hat-matrix warp
against the host-built matrices of DeviceAugmentation, plus the
deterministic / exact-resume stream contract shared with MPBatchLoader."""

import numpy as np
import pytest

from gssd_tpu.data.augment_device import DeviceAugmentation, GeomParams
from gssd_tpu.data.dataset import LesionDataset
from gssd_tpu.data.device_cache import DeviceCacheLoader
from gssd_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    path = tmp_path_factory.mktemp("ml_cache")
    make_synthetic_dataset(str(path), num_subjects=2, slices_per_subject=2,
                           image_size=64)
    ids = [line.split("|")[0] for line in
           open(path / "metadata.txt").read().splitlines() if line]
    return LesionDataset(str(path), ids)


def make_loader(ds, **kw):
    kw.setdefault("batch_size", 3)
    kw.setdefault("size", 32)
    kw.setdefault("seed", 7)
    return DeviceCacheLoader(ds, **kw)


def test_batch_contract(ds):
    loader = make_loader(ds)
    b = next(iter(loader))
    assert b["image"].shape == (3, 32, 32, 12)
    img = np.asarray(b["image"])
    assert np.isfinite(img).all()
    # use_normalize=True -> min-max to [0, 1]
    assert img.min() >= -1e-5 and img.max() <= 1 + 1e-5
    assert b["boxes"].shape == (3, 16, 4)
    assert b["valid"].any(), "synthetic items always carry >= 1 lesion"
    v = b["valid"]
    assert (b["boxes"][v] >= -1e-5).all() and (b["boxes"][v] <= 1 + 1e-5).all()


def test_deterministic_and_exact_resume(ds):
    a = iter(make_loader(ds))
    first = [next(a) for _ in range(3)]
    # same seed -> identical stream
    b = iter(make_loader(ds))
    again = next(b)
    np.testing.assert_array_equal(np.asarray(again["image"]),
                                  np.asarray(first[0]["image"]))
    np.testing.assert_array_equal(again["boxes"], first[0]["boxes"])
    # start_batch=2 -> stream resumes at the third batch exactly
    c = iter(make_loader(ds, start_batch=2))
    resumed = next(c)
    np.testing.assert_array_equal(np.asarray(resumed["image"]),
                                  np.asarray(first[2]["image"]))
    np.testing.assert_array_equal(resumed["boxes"], first[2]["boxes"])
    np.testing.assert_array_equal(resumed["valid"], first[2]["valid"])


def test_exact_resume_with_nonzero_jitter(tmp_path):
    """ADVICE r4: at src_size >= 128 the +/-1% pixel jitter is nonzero,
    so a second rng hiding inside the host sampler breaks resume (boxes
    differ even when the geometry stream matches). Pin the full
    contract — boxes AND images — at a jitter-visible size."""
    path = tmp_path / "ml_big"
    make_synthetic_dataset(str(path), num_subjects=2, slices_per_subject=2,
                           image_size=128)
    ids = [line.split("|")[0] for line in
           open(path / "metadata.txt").read().splitlines() if line]
    big = LesionDataset(str(path), ids)
    a = iter(make_loader(big, batch_size=2, size=64))
    first = [next(a) for _ in range(3)]
    resumed = next(iter(make_loader(big, batch_size=2, size=64,
                                    start_batch=2)))
    np.testing.assert_array_equal(resumed["boxes"], first[2]["boxes"])
    np.testing.assert_array_equal(np.asarray(resumed["image"]),
                                  np.asarray(first[2]["image"]))
    np.testing.assert_array_equal(resumed["valid"], first[2]["valid"])


def test_device_matrices_match_host_built(ds, rng):
    """The jitted on-device hat-matrix construction must reproduce
    DeviceAugmentation.interp_matrices + _warp bit-for-bit (same
    formula, same f32 math)."""
    loader = make_loader(ds, batch_size=2)
    cache = np.asarray(loader._cache)
    idx = np.array([0, 3], np.int32)
    geom = GeomParams(
        scale=np.array([[1.3, 0.9], [2.0, 1.7]], np.float32),
        offset=np.array([[-3.0, 5.0], [10.0, -8.0]], np.float32),
        flip=np.array([False, True]),
        brightness=np.array([4.0, -10.0], np.float32),
        contrast=np.array([1.2, 0.8], np.float32),
    )
    got = np.asarray(loader._gather_warp(
        loader._cache, idx, geom.scale, geom.offset, geom.flip,
        geom.brightness, geom.contrast))

    aug = loader._geom
    my, mx = aug.interp_matrices(geom)
    want = np.asarray(aug._warp(
        cache[idx], my, mx, geom.brightness, geom.contrast))
    np.testing.assert_allclose(got, want, atol=1e-5)

import os

import numpy as np
import pytest

from gssd_tpu.data import BaseTransform, DataSplitter, LesionDataset
from gssd_tpu.data.dataset import BatchLoader, collate
from gssd_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ml_ready")
    make_synthetic_dataset(str(d), num_subjects=14, slices_per_subject=2,
                           image_size=128)
    return str(d)


def test_splitter_subject_level(synth_dir):
    sp = DataSplitter(synth_dir, cross_validation=2, num_test_subject=4)
    assert len(sp.subjects_test) == 4
    assert len(sp.subjects_train) == 10
    # eval folds are disjoint contiguous chunks; train = complement
    for ev, tr in zip(sp.subjects_cv_eval, sp.subjects_cv_train):
        assert not set(ev) & set(tr)
        assert set(ev) | set(tr) == set(sp.subjects_train)
    # no subject leaks between train ids and test ids
    train_subj = {i.rsplit("_", 1)[0] for i in sp.data_train}
    test_subj = {i.rsplit("_", 1)[0] for i in sp.data_test}
    assert not train_subj & test_subj
    assert len(sp.data_train) == 10 * 2 and len(sp.data_test) == 4 * 2


def test_splitter_cv1_is_80_20(synth_dir):
    sp = DataSplitter(synth_dir, cross_validation=1, num_test_subject=4)
    assert len(sp.subjects_cv_eval) == 1
    assert len(sp.subjects_cv_eval[0]) == 2  # 20% of 10


def test_dataset_item(synth_dir):
    sp = DataSplitter(synth_dir, cross_validation=2, num_test_subject=4)
    ds = LesionDataset(synth_dir, sp.data_train,
                       transform=BaseTransform(size=96))
    img, boxes, labels = ds[0]
    assert img.shape == (4, 96, 96, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert boxes.shape[1] == 4
    assert (boxes >= 0).all() and (boxes <= 1).all()
    raw = ds.pull_image(0)
    assert raw.shape == (4, 128, 128, 3)
    assert raw.max() > 1.5  # 0..255 scale


def test_collate_static_shapes(synth_dir):
    sp = DataSplitter(synth_dir, cross_validation=2, num_test_subject=4)
    ds = LesionDataset(synth_dir, sp.data_train,
                       transform=BaseTransform(size=96))
    batch = collate([ds[i] for i in range(4)], max_gt=8)
    assert batch["image"].shape == (4, 96, 96, 12)
    assert batch["boxes"].shape == (4, 8, 4)
    assert batch["valid"].shape == (4, 8)
    assert batch["valid"].any(axis=1).all()  # every slice has a lesion
    # channel collapse keeps phase-major order: [p0s0,p0s1,p0s2,p1s0...]
    img, _, _ = ds[0]
    np.testing.assert_allclose(batch["image"][0, :, :, 3], img[1, :, :, 0])


def test_batch_loader(synth_dir):
    sp = DataSplitter(synth_dir, cross_validation=2, num_test_subject=4)
    ds = LesionDataset(synth_dir, sp.data_train,
                       transform=BaseTransform(size=96))
    it = iter(BatchLoader(ds, batch_size=3, max_gt=8, prefetch=1))
    b1 = next(it)
    b2 = next(it)
    assert b1["image"].shape == (3, 96, 96, 12)
    assert not np.allclose(b1["image"], b2["image"])


def test_load_to_ram(synth_dir):
    sp = DataSplitter(synth_dir, cross_validation=2, num_test_subject=4)
    ds = LesionDataset(synth_dir, sp.data_train[:3], load_to_ram=True)
    img, boxes, labels = ds[0]
    assert img.shape[0] == 4


def test_splitter_guards(synth_dir):
    with pytest.raises(ValueError):
        DataSplitter(synth_dir, cross_validation=1, num_test_subject=14)
    with pytest.raises(ValueError):
        # 14 subjects, 12 test -> 2 train, 20% of 2 = 0 eval
        DataSplitter(synth_dir, cross_validation=1, num_test_subject=12)


def test_empty_loader_rejected(synth_dir):
    sp = DataSplitter(synth_dir, cross_validation=2, num_test_subject=4)
    ds = LesionDataset(synth_dir, [])
    with pytest.raises(ValueError):
        BatchLoader(ds, batch_size=2)


def test_h5_legacy_dataset(tmp_path, rng):
    import h5py

    from gssd_tpu.data.legacy_h5 import H5LesionDataset

    path = str(tmp_path / "legacy.h5")
    cts = rng.uniform(0, 1, (3, 4, 3, 64, 64)).astype(np.float32)
    labels = np.tile(np.array([10, 12, 40, 44, 0], np.float32), (3, 1, 1))
    with h5py.File(path, "w") as f:
        f.create_group("ct").create_dataset("ct_0", data=cts)
        f.create_group("label").create_dataset("coordinate_0", data=labels)
    ds = H5LesionDataset(path)
    assert len(ds) == 3
    img = ds.pull_image(0)
    assert img.shape == (4, 64, 64, 3) and img.max() > 1.5
    anno = ds.pull_anno(1)
    assert anno.shape == (1, 5)
    item_img, boxes, lab = ds[0]
    assert 0 <= boxes.min() and boxes.max() <= 1

"""SNUH v1 legacy h5 writer (preprocessing/legacy_v1.py, reference
lib/roi_dataset_generator.py) + roundtrip through the v1 reader."""

import os
import pickle

import numpy as np
import pytest

from gssd_tpu.preprocessing.legacy_v1 import (
    generate_v1_dataset,
    preprocess_slice_for_detection,
    write_v1_h5,
)


def _fake_raw(seed, hw=32):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 2049, (hw, hw)).astype(np.int64)
    img.flat[0] = 2048  # guarantee max >= 1700 (range check)
    return img


@pytest.fixture()
def v1_tree(tmp_path):
    """ct/<subj>/P/*.DCM + roi_coordinate/<subj>/P/*.txt fixture tree;
    slice 9 has no coords (exercises the intersection filter :85-97)."""
    ct_root = tmp_path / "ct"
    roi_root = tmp_path / "roi_coordinate"
    for subj in ("A001", "A002"):
        (ct_root / subj / "P").mkdir(parents=True)
        (roi_root / subj / "P").mkdir(parents=True)
        for i in range(6):
            (ct_root / subj / "P" / f"s{i:03d}.DCM").touch()
            if i != 5:
                with open(roi_root / subj / "P" / f"s{i:03d}.txt", "wb") as f:
                    pickle.dump(np.asarray(
                        [4 + i, 5 + i, 20 + i, 22 + i], np.float32), f)
    return str(ct_root), str(roi_root)


def _read_dicom(path):
    return _fake_raw(abs(hash(os.path.basename(path))) % 1000)


def test_preprocess_range_and_offset():
    img = _fake_raw(0)
    out = preprocess_slice_for_detection(img, "B123")
    assert out.min() == 0.0 and out.max() == 1.0
    # pre-offset subjects skip the -1024 shift and the range check
    pre = preprocess_slice_for_detection(
        np.clip(img - 1024, -1024, 1024), "A391")
    assert pre.min() == 0.0 and pre.max() == 1.0
    with pytest.raises(ValueError):
        preprocess_slice_for_detection(np.zeros((8, 8)), "B123")


def test_generate_and_write_roundtrip(v1_tree, tmp_path):
    ct_root, roi_root = v1_tree
    data = generate_v1_dataset(ct_root, roi_root, read_dicom=_read_dicom,
                               log=lambda *a: None)
    assert sorted(data) == ["A001", "A002"]
    ct, cr = data["A001"]
    # 5 annotated slices -> 3 three-slice samples, x4 phases
    assert ct.shape == (3, 4, 3, 32, 32)
    assert cr.shape == (3, 4, 3, 5)
    # phase replication: all 4 phases identical (P-only x4, ref :123-126)
    np.testing.assert_array_equal(ct[:, 0], ct[:, 1])
    np.testing.assert_array_equal(cr[:, 0], cr[:, 3])
    # sample i covers slices i..i+2; middle-slice coords are slice i+1's
    np.testing.assert_allclose(cr[1, 0, 1, :4], [4 + 2, 5 + 2, 20 + 2, 22 + 2])
    assert cr[1, 0, 1, 4] == 0.0  # label column appended

    h5_path = str(tmp_path / "v1.h5")
    write_v1_h5(h5_path, data)

    from gssd_tpu.data.legacy_h5 import H5LesionDataset

    ds = H5LesionDataset(h5_path)
    assert len(ds) == 6  # 3 samples x 2 subjects
    img = ds.pull_image(0)
    assert img.shape == (4, 32, 32, 3)
    anno = ds.pull_anno(1)  # v1 tensor -> middle-slice boxes [1, 5]
    assert anno.shape == (1, 5)
    np.testing.assert_allclose(anno[0, :4], [6, 7, 22, 24])


def test_skips_subjects_without_phase_dir(v1_tree, tmp_path):
    ct_root, roi_root = v1_tree
    os.makedirs(os.path.join(roi_root, "A999"))  # no P dir
    msgs = []
    data = generate_v1_dataset(ct_root, roi_root, read_dicom=_read_dicom,
                               log=lambda m: msgs.append(m))
    assert "A999" not in data
    assert any("A999" in m for m in msgs)

"""SNUH ingestion driver: walker, delta z-alignment, multi-lesion
merge, metadata merge, and the raw-drop -> ml_ready end-to-end build
(reference lib/data_checker_year1_extended_1904.py:16-102, 214-305,
387-475). DICOM parsing itself is gated on pydicom (absent here), so
the series reader is injected: each phase directory holds one
``<phase>_vol.npy`` volume."""

import os

import numpy as np
import pytest

from gssd_tpu.preprocessing.snuh import (
    build_snuh_dataset,
    load_metadata,
    load_subject,
    merge_mask_metadata,
    natsort_key,
)

H = W = 64


def npy_series_reader(directory, pattern):
    return np.load(os.path.join(directory, pattern.split("*")[0] +
                                "vol.npy"))


def _make_drop(tmp_path, subjects=("HCC_1104", "HCC_1105")):
    """Synthetic raw drop: per-phase volumes with z-dependent values,
    delta-shifted masks, one subject with two lesions."""
    rng = np.random.default_rng(7)
    rows = []
    for si, subject in enumerate(subjects):
        z = 8 + si  # different z per subject
        delta = 2 + si  # mask raw has `delta` extra leading slices
        phase_name, mask_id = ("P", f"A{si + 1}")
        for phase in ("A", "D", "P", "Pre"):
            d = tmp_path / "dicom_image" / subject / phase
            d.mkdir(parents=True)
            # HU-ish volumes with a bright lesion blob at z=3..4
            vol = rng.integers(-1000, 200, (H, W, z)).astype(np.int16)
            vol[20:36, 24:40, 3:5] = 80
            np.save(d / f"{phase}_vol.npy", vol)
        mdir = tmp_path / "segmentation_mask"
        mdir.mkdir(exist_ok=True)
        n_lesions = 2 if si == 0 else 1
        for li in range(n_lesions):
            m = np.zeros((H, W, z + delta), np.uint8)
            # lesion blob in the raw mask is shifted by delta so the
            # aligned cut lands on slices 3..4
            y0 = 20 + 20 * li
            m[y0:y0 + 12, 24:40, 3 + delta:5 + delta] = 1
            suffix = str(li + 1) if n_lesions > 1 else ""
            (m.transpose(2, 0, 1).astype(np.uint8)
             .tofile(mdir / f"{mask_id}_{phase_name}{suffix}.raw"))
        deltas = {"A": 0, "D": 0, "P": delta, "Pre": 0}
        rows.append(f"{subject}\t{deltas['A']}\t{deltas['D']}\t"
                    f"{deltas['P']}\t{deltas['Pre']}\t{phase_name}\t"
                    f"{mask_id}")
    meta = tmp_path / "metadata.txt"
    meta.write_text(
        "ID\tDelta_A\tDelta_D\tDelta_P\tDelta_Pre\tMask_Phase\tMask_ID\n"
        + "\n".join(rows) + "\n")
    return tmp_path


def test_natsort():
    names = ["P_10", "P_2", "P_1"]
    assert sorted(names, key=natsort_key) == ["P_1", "P_2", "P_10"]


def test_load_subject_delta_alignment(tmp_path):
    drop = _make_drop(tmp_path)
    rows = load_metadata(str(drop / "metadata.txt"))
    out = load_subject(str(drop), rows[0], img_size=H,
                       series_reader=npy_series_reader)
    assert out is not None
    phases, mask_list, merged, (subject, mask_base) = out
    assert subject == "HCC_1104" and mask_base == "A1_P"
    assert phases.shape == (4, H, W, 8)
    assert phases.min() >= 0.0 and phases.max() <= 1.0
    # two lesions found and merged; delta alignment puts lesion slices
    # at z = 3..4 of the pivot phase
    assert len(mask_list) == 2
    assert merged.shape == (H, W, 8)
    assert set(np.unique(merged)) <= {0, 1}
    z_with_mask = np.where(merged.any(axis=(0, 1)))[0]
    np.testing.assert_array_equal(z_with_mask, [3, 4])
    # the merge contains both lesions (more area than either alone)
    assert merged.sum() > mask_list[0][..., 3].sum()


def test_load_subject_missing_dicom_warns_and_skips(tmp_path, capsys):
    drop = _make_drop(tmp_path)
    row = ["HCC_9999", "0", "0", "0", "0", "P", "A9"]
    assert load_subject(str(drop), row, series_reader=npy_series_reader) \
        is None
    assert "skipping" in capsys.readouterr().out


def test_build_snuh_dataset_end_to_end(tmp_path):
    drop = _make_drop(tmp_path)
    out_dir = tmp_path / "ml_ready"
    lines = build_snuh_dataset(
        str(drop), str(out_dir), img_size=H,
        series_reader=npy_series_reader)
    assert lines, "no slices emitted"
    # ml_ready contract: quadruplets + metadata relpath|subject lines
    rel, subject = lines[0].split("|")
    for suffix in ("_ct.npy", "_bbox.npy", "_mask.npy", "_phase.npy"):
        assert os.path.exists(str(out_dir) + "/" + rel + suffix)
    ct = np.load(str(out_dir) + "/" + rel + "_ct.npy")
    assert ct.shape == (4, 3, H, W)
    bbox = np.load(str(out_dir) + "/" + rel + "_bbox.npy")
    assert bbox.ndim == 2 and bbox.shape[1] == 5
    tok = np.load(str(out_dir) + "/" + rel + "_phase.npy")
    assert int(tok) == 2  # annotated phase P

    # the emitted set loads through the training data stack
    from gssd_tpu.data import LesionDataset

    ds = LesionDataset(str(out_dir), [l.split("|")[0] for l in lines])
    img = ds.pull_image(0)
    assert img.shape == (4, H, W, 3)
    anno = ds.pull_anno(0)
    assert anno.shape[1] == 5


def test_merge_mask_metadata(tmp_path):
    lookup = tmp_path / "lookup.txt"
    lookup.write_text("HCC_1104 A5 P\nHCC_1105 A9 D\n")
    meta = tmp_path / "meta.txt"
    meta.write_text("ID\tA\tD\tP\tPre\tMEDIP\n"
                    "HCC_1104\t0\t0\t10\t0\tP\n"
                    "HCC_1105\t0\t14\t0\t0\tD\n")
    out = tmp_path / "final.txt"
    merge_mask_metadata(str(lookup), str(meta), str(out))
    rows = load_metadata(str(out))
    assert rows[0] == ["HCC_1104", "0", "0", "10", "0", "P", "A5"]
    assert rows[1][-1] == "A9"

    # phase mismatch must assert (reference :91-93)
    lookup.write_text("HCC_1104 A5 A\nHCC_1105 A9 D\n")
    with pytest.raises(AssertionError):
        merge_mask_metadata(str(lookup), str(meta), str(out))

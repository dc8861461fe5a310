"""Tests for the annotation/QA preprocessing tools.

Covers gssd_tpu/preprocessing/roi_bmp.py (reference
lib/roi_extractor_rgb.py) and gssd_tpu/preprocessing/checker.py
(reference lib/data_checker_year1_extended.py, lib/data_opener_year2.py)
with synthetic in-memory fixtures — no bmp/dicom assets needed.
"""

import os
import pickle

import numpy as np
import pytest

from gssd_tpu.preprocessing.checker import (
    check_year1_extended,
    check_year2,
    contact_sheet,
    contact_sheet_year2,
    load_pair_list,
)
from gssd_tpu.preprocessing.roi_bmp import (
    RGB_RED,
    RGB_YELLOW,
    extract_roi_box,
    extract_roi_tree,
)


def _box_image(x1, y1, x2, y2, color, size=64, extra=None):
    img = np.zeros((size, size, 3), np.uint8)
    img[y1, x1:x2 + 1] = color
    img[y2, x1:x2 + 1] = color
    img[y1:y2 + 1, x1] = color
    img[y1:y2 + 1, x2] = color
    if extra is not None:
        ex, ey, ecolor = extra
        img[ey, ex] = ecolor
    return img


class TestRoiBmp:
    def test_yellow_box(self):
        img = _box_image(5, 10, 30, 40, RGB_YELLOW)
        assert extract_roi_box(img) == [5, 10, 30, 40, 0]

    def test_red_box(self):
        img = _box_image(12, 3, 20, 22, RGB_RED)
        assert extract_roi_box(img) == [12, 3, 20, 22, 0]

    def test_both_colors_rejected_by_default(self):
        img = _box_image(5, 10, 30, 40, RGB_RED, extra=(50, 50, RGB_YELLOW))
        with pytest.raises(ValueError, match="both"):
            extract_roi_box(img)

    def test_a258_style_prefers_yellow(self):
        # red bbox + yellow annotation: the reference's yellow-first
        # branch order applies when both are allowed (rgb extractor :62)
        img = _box_image(5, 10, 30, 40, RGB_RED)
        img[48:52, 45:55] = RGB_YELLOW
        box = extract_roi_box(img, allow_both_colors=True)
        assert box == [45, 48, 54, 51, 0]

    def test_no_roi_raises(self):
        with pytest.raises(ValueError, match="no ROI"):
            extract_roi_box(np.zeros((32, 32, 3), np.uint8))

    def test_tree_walker(self, tmp_path):
        root = tmp_path / "roi_image"
        imgs = {}
        for subject, color in [("A1", RGB_YELLOW), ("A2", RGB_RED)]:
            for phase in ("A", "P"):
                d = root / subject / phase
                d.mkdir(parents=True)
                p = d / f"{phase}_0007.bmp"
                p.write_bytes(b"")
                imgs[str(p)] = _box_image(4, 6, 20, 25, color)
        # skipped subject must not be visited at all
        skipdir = root / "A196" / "A"
        skipdir.mkdir(parents=True)
        (skipdir / "A_0001.bmp").write_bytes(b"")
        out = tmp_path / "roi_coordinate"
        n = extract_roi_tree(str(root), str(out),
                             image_reader=lambda p: imgs[p])
        assert n == 4
        with open(out / "A1" / "P" / "P_0007.txt", "rb") as f:
            assert pickle.load(f) == [4, 6, 20, 25, 0]
        assert not (out / "A196").exists()


def _vol(z, h=16, w=16, fill=100):
    return np.full((h, w, z), fill, np.int16)


def _mask(z, h=16, w=16):
    m = np.zeros((h, w, z), np.uint8)
    m[4:8, 4:8, :] = 1
    return m


class TestYear1Checker:
    def _readers(self, phase_z, mask_files):
        def sread(directory, pattern):
            ph = os.path.basename(directory)
            if ph not in phase_z:
                raise FileNotFoundError(directory)
            return _vol(phase_z[ph])

        def mread(path):
            name = os.path.basename(path)
            if name not in mask_files:
                raise FileNotFoundError(path)
            return mask_files[name]

        return sread, mread

    def test_clean_subject(self, tmp_path):
        mask_dir = tmp_path / "segmentation_mask"
        mask_dir.mkdir()
        (mask_dir / "A1_P1.raw").write_bytes(b"")
        (mask_dir / "A1_P2.raw").write_bytes(b"")
        sread, mread = self._readers(
            {ph: 10 for ph in ("A", "D", "P", "Pre")},
            {"A1_P1.raw": _mask(10), "A1_P2.raw": _mask(10)})
        # disjoint second lesion
        m2 = np.zeros((16, 16, 10), np.uint8)
        m2[10:12, 10:12, :] = 1
        reports = check_year1_extended(
            str(tmp_path), [("HCC_1", "A1", "P")],
            series_reader=sread,
            mask_reader=lambda p: (_mask(10) if p.endswith("P1.raw")
                                   else m2))
        (rep,) = reports
        assert rep["found"] and rep["findings"] == []
        assert rep["phase_z"] == [10, 10, 10, 10]
        assert rep["mask_names"] == ["A1_P1.raw", "A1_P2.raw"]

    def test_mismatched_z_and_overlap(self, tmp_path):
        mask_dir = tmp_path / "segmentation_mask"
        mask_dir.mkdir()
        (mask_dir / "A1_P1.raw").write_bytes(b"")
        (mask_dir / "A1_P2.raw").write_bytes(b"")
        sread, _ = self._readers(
            {"A": 10, "D": 12, "P": 10, "Pre": 10}, {})
        reports = check_year1_extended(
            str(tmp_path), [("HCC_1", "A1", "P")],
            series_reader=sread,
            mask_reader=lambda p: _mask(10))  # identical -> overlap
        (rep,) = reports
        assert "non-matching number of slices" in rep["findings"][0]
        assert any("overlapping" in f for f in rep["findings"])

    def test_missing_pair_skips(self, tmp_path):
        (tmp_path / "segmentation_mask").mkdir()
        reports = check_year1_extended(
            str(tmp_path), [("HCC_9", "A9", "A")],
            series_reader=lambda d, p: _vol(5))
        (rep,) = reports
        assert not rep["found"]
        assert "missing data" in rep["findings"][0]

    def test_load_pair_list(self, tmp_path):
        p = tmp_path / "pairs.txt"
        p.write_text("HCC_1106\tA1\tA\nHCC_1107 A20 A\n\n")
        assert load_pair_list(str(p)) == [
            ("HCC_1106", "A1", "A"), ("HCC_1107", "A20", "A")]


class TestYear2Checker:
    def test_clean_and_fixable(self, tmp_path):
        (tmp_path / "S1").mkdir()
        (tmp_path / "S2").mkdir()

        def sread(directory, pattern):
            return _vol(8, fill=-500)

        def mread(path):
            m = _mask(8)
            if "S2" in path:
                m[0, 0, 0] = 10  # stray label, fixable
            return m

        reports = check_year2(str(tmp_path), series_reader=sread,
                              mask_reader=mread)
        assert [r["subject"] for r in reports] == ["S1", "S2"]
        assert reports[0]["findings"] == []
        assert reports[0]["hu_range"][0] == -500.0
        assert "windowed_range" in reports[0]
        assert any("fixup applies" in f for f in reports[1]["findings"])

    def test_shape_mismatch_and_zero_hu(self, tmp_path):
        (tmp_path / "S1").mkdir()

        def sread(directory, pattern):
            z = 8 if "pre-CT" in directory else 9
            return _vol(z, fill=0)

        reports = check_year2(str(tmp_path), series_reader=sread,
                              mask_reader=lambda p: _mask(9))
        (rep,) = reports
        assert any("shapes differ" in f for f in rep["findings"])
        assert any("minimum CT HU of 0" in f for f in rep["findings"])


class TestContactSheets:
    def test_shapes_and_noise_fill(self):
        phases = [_vol(4, 8, 8, fill=i + 1).astype(float)
                  for i in range(4)]
        mask = _mask(4, 8, 8)
        sheet = contact_sheet(phases, mask, 2)
        assert sheet.shape == (8, 40)
        assert sheet[0, 32] == 0 and sheet[4, 36] == 255  # mask cell
        # out-of-range slice index renders noise, not a crash
        sheet_oob = contact_sheet(phases, mask, 99)
        assert sheet_oob.shape == (8, 40)
        sheet2 = contact_sheet_year2(phases, phases, mask, 1)
        assert sheet2.shape == (16, 40)
        assert np.all(sheet2[:8, 32:] == 0)  # top-right cell empty


from gssd_tpu.preprocessing.hygiene import (  # noqa: E402
    clean_aligned_set,
    clean_sample,
    fix_drop_structure,
)


class TestHygiene:
    def test_fix_structure_renames(self, tmp_path):
        d = tmp_path / "ct" / "S1" / "V"
        d.mkdir(parents=True)
        (d / "V_0012.DCM").write_bytes(b"x")
        (tmp_path / "ct" / "S2" / "P").mkdir(parents=True)
        report = fix_drop_structure(str(tmp_path / "ct"))
        assert "renamed phase 'V' -> 'P'" in report["S1"]
        assert (tmp_path / "ct" / "S1" / "P" / "P_0012.DCM").exists()
        assert "S2" not in report

    def test_fix_structure_pv_collision_skipped(self, tmp_path):
        s = tmp_path / "ct" / "S1"
        (s / "V").mkdir(parents=True)
        (s / "P").mkdir()
        report = fix_drop_structure(str(tmp_path / "ct"))
        assert "both" in report["S1"][0]
        assert (s / "V").exists()  # untouched

    def test_fix_structure_roi_mismatch(self, tmp_path):
        (tmp_path / "ct" / "S1" / "A").mkdir(parents=True)
        (tmp_path / "roi" / "S2" / "A").mkdir(parents=True)
        report = fix_drop_structure(
            str(tmp_path / "ct"), str(tmp_path / "roi"))
        assert "mismatch" in report["*"][0]

    def test_clean_sample(self):
        ct = np.linspace(-0.5, 1.5, 48).reshape(4, 3, 2, 2)
        mask = np.zeros((32, 32), np.float32)
        mask[4:10, 4:12] = 0.9  # survives the 0.5 binarize
        mask[20:22, 20:22] = 0.3  # does not
        ct2, mask2, boxes = clean_sample(ct, mask)
        assert ct2.min() == 0.0 and ct2.max() == 1.0
        assert set(np.unique(mask2)) == {0, 1}
        assert boxes.shape == (1, 5)
        assert boxes[0].tolist() == [4.0, 4.0, 12.0, 10.0, 0.0]

    def test_clean_aligned_set(self, tmp_path):
        src = tmp_path / "align"
        orig = tmp_path / "orig"
        out = tmp_path / "clean"
        (src / "S1").mkdir(parents=True)
        (orig / "S1").mkdir(parents=True)
        (orig / "metadata.txt").write_text("S1/S1_0|S1\nS1/S1_1|S1\n")
        ct = np.full((4, 3, 16, 16), 1.2, np.float32)
        mask = np.zeros((16, 16), np.float32)
        mask[2:6, 2:6] = 1.0
        np.save(src / "S1" / "S1_0_ct.npy", ct)
        np.save(src / "S1" / "S1_0_mask.npy", mask)
        # orig had TWO lesions -> warn on the count change
        np.save(orig / "S1" / "S1_0_bbox.npy",
                np.zeros((2, 5), np.float32))
        warnings = clean_aligned_set(
            str(orig / "metadata.txt"), str(src), str(out))
        assert warnings == ["S1/S1_0: lesion count 2 -> 1"]
        assert np.load(out / "S1" / "S1_0_ct.npy").max() == 1.0
        assert np.load(out / "S1" / "S1_0_bbox.npy").shape == (1, 5)
        # sample missing from the aligned set is skipped silently
        assert not (out / "S1" / "S1_1_ct.npy").exists()

import numpy as np
import pytest

from gssd_tpu.data import DataSplitter, LesionDataset
from gssd_tpu.preprocessing import (
    apply_window,
    ircadb_window,
    mask_slice_to_boxes,
    normalize01,
    volume_to_samples,
    window_and_normalize,
)
from gssd_tpu.preprocessing.builder import build_dataset


def test_apply_window_basic():
    # keep mean < 0 so the intensity-shift branch stays off
    img = np.array([[-1000.0, -150.0, 0.0, 50.0, 250.0, 1300.0],
                    [-1000.0] * 6])
    out = apply_window(img, 400, 50)
    # window [-150, 250]; >1200 zeroed first
    np.testing.assert_allclose(out[0], [-150, -150, 0, 50, 250, 0])


def test_apply_window_fixups():
    img = np.full((4, 4), -2000.0)
    img[0, 0] = 100.0
    out = apply_window(img)
    assert out.min() >= -150  # -2000 padding zeroed then windowed

    # intensity-coded volume (mean > 0) gets shifted by -1024
    img2 = np.full((4, 4), 1024.0)
    img2[0, 0] = 1074.0
    out2 = apply_window(img2)
    np.testing.assert_allclose(out2[0, 0], 50.0)


def test_window_and_normalize_range(rng):
    phases = [rng.normal(0, 300, (64, 64, 5)).astype(np.float32)
              for _ in range(4)]
    out = window_and_normalize(phases)
    for p in out:
        assert p.min() == 0.0 and p.max() == 1.0


def test_ircadb_window():
    img = np.array([-500.0, -100.0, 0.0, 400.0, 500.0, 1250.0])
    out = ircadb_window(img)
    assert out.min() == 0.0 and out.max() == 1.0
    assert out[5] == out[2]  # >1200 zeroed


def _disk_mask(h=128, cy=60, cx=70, r=12):
    yy, xx = np.mgrid[0:h, 0:h]
    return (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.uint8)


def test_mask_slice_to_boxes():
    m = _disk_mask()
    boxes, smoothed = mask_slice_to_boxes(m)
    assert boxes is not None and len(boxes) == 1
    x1, y1, x2, y2, cls = boxes[0]
    assert cls == 0.0
    # box covers the disk center with sane extent
    assert x1 < 70 < x2 and y1 < 60 < y2
    assert 15 < (x2 - x1) < 40


def test_mask_slice_empty():
    boxes, smoothed = mask_slice_to_boxes(np.zeros((64, 64), np.uint8))
    assert boxes is None


def test_mask_two_lesions():
    m = _disk_mask() | _disk_mask(cy=30, cx=25, r=9)
    boxes, _ = mask_slice_to_boxes(m)
    assert len(boxes) == 2


def test_volume_to_samples_and_builder(tmp_path, rng):
    H, Z = 128, 6
    mask = np.zeros((H, H, Z), np.uint8)
    mask[:, :, 2] = _disk_mask()
    mask[:, :, 3] = _disk_mask()
    phases = rng.normal(0, 300, (4, H, H, Z)).astype(np.float32)
    samples = volume_to_samples(
        np.stack(window_and_normalize(list(phases))), mask
    )
    assert len(samples) == 2
    ct, boxes, smoothed = samples[0]
    assert ct.shape == (4, 3, H, H)
    assert 0.0 <= ct.min() and ct.max() <= 1.0

    # full builder -> loadable by the training data stack
    out = str(tmp_path / "ml")
    subjects = {f"s{i:02d}": (phases, mask) for i in range(8)}
    lines = build_dataset(out, subjects)
    assert len(lines) == 16
    sp = DataSplitter(out, cross_validation=1, num_test_subject=2)
    ds = LesionDataset(out, sp.data_train)
    img, b, l = ds[0]
    assert img.shape == (4, H, H, 3)
    assert len(b) >= 1


def test_registration_gated():
    from gssd_tpu.preprocessing import registration

    with pytest.raises(ImportError):
        registration.register_slice_to_portal(np.zeros((4, 8, 8)))


def test_volume_io_orientation_and_dump(tmp_path):
    """canonicalize = rot90-left + flipud (reference nii_opener.py:10-17):
    a marker at storage [0, -1] (top-right) must land at [-1, 0]
    (top-right -> rot90-left -> top-left -> flipud -> bottom-left)."""
    from gssd_tpu.preprocessing import (canonicalize_nii_orientation,
                                        dump_volume_slices)

    vol = np.zeros((6, 4, 3), np.float32)
    vol[0, -1, :] = 7.0
    out = canonicalize_nii_orientation(vol)
    assert out.shape == (4, 6, 3)
    assert out[-1, 0, 0] == 7.0 and out[:, :, 1].sum() == 7.0

    paths = dump_volume_slices(out, str(tmp_path / "sanity"))
    assert len(paths) == 3 and all(p.endswith(".jpg") for p in paths)
    from PIL import Image

    with Image.open(paths[0]) as im:
        assert im.size == (6, 4)  # PIL size is (W, H)


def test_volume_io_gated():
    from gssd_tpu.preprocessing import load_nii_volume, load_vtk_mesh_points

    with pytest.raises(ImportError, match="nibabel"):
        load_nii_volume("/nonexistent.nii")
    with pytest.raises(ImportError, match="vtk"):
        load_vtk_mesh_points("/nonexistent.vtk")

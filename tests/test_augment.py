import numpy as np
import pytest

from gssd_tpu.data.augment import SSDAugmentation


def fixture_item(rng, h=128, w=128):
    img = rng.uniform(0, 255, (4, h, w, 3)).astype(np.float32)
    boxes = np.array([[0.2, 0.3, 0.5, 0.6], [0.6, 0.55, 0.8, 0.9]],
                     np.float32)
    labels = np.zeros(2, np.float32)
    return img, boxes, labels


def test_output_contract(rng):
    aug = SSDAugmentation(size=96, seed=7)
    img, boxes, labels = fixture_item(rng)
    out_img, out_boxes, out_labels = aug(img, boxes, labels)
    assert out_img.shape == (4, 96, 96, 3)
    assert 0.0 <= out_img.min() and out_img.max() <= 1.0
    assert out_boxes.shape[1] == 4
    assert len(out_labels) == len(out_boxes)
    assert (out_boxes[:, 0] < out_boxes[:, 2]).all()
    assert (out_boxes[:, 1] < out_boxes[:, 3]).all()
    assert (out_boxes >= -1e-6).all() and (out_boxes <= 1 + 1e-6).all()


def test_deterministic_given_seed(rng):
    img, boxes, labels = fixture_item(rng)
    a = SSDAugmentation(size=96, seed=33)(img.copy(), boxes.copy(), labels)
    b = SSDAugmentation(size=96, seed=33)(img.copy(), boxes.copy(), labels)
    np.testing.assert_allclose(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1])


def test_randomness_across_calls(rng):
    aug = SSDAugmentation(size=96, seed=33)
    img, boxes, labels = fixture_item(rng)
    a = aug(img.copy(), boxes.copy(), labels)
    b = aug(img.copy(), boxes.copy(), labels)
    assert not np.allclose(a[0], b[0])


def test_geometry_shared_across_phases(rng):
    """Phases must receive identical geometric transforms: identical
    phase images in -> identical phase images out."""
    img, boxes, labels = fixture_item(rng)
    img = np.repeat(img[:1], 4, axis=0)
    aug = SSDAugmentation(size=96, seed=5)
    out_img, _, _ = aug(img, boxes, labels)
    for p in range(1, 4):
        np.testing.assert_allclose(out_img[0], out_img[p], atol=1e-6)


def test_boxes_follow_lesions(rng):
    """Draw a bright blob; after augmentation the surviving box must
    still cover the brightest region."""
    for seed in range(6):
        img = np.zeros((4, 128, 128, 3), np.float32) + 30.0
        img[:, 40:64, 80:104] = 250.0
        boxes = np.array([[80 / 128, 40 / 128, 104 / 128, 64 / 128]],
                         np.float32)
        labels = np.zeros(1, np.float32)
        aug = SSDAugmentation(size=128, seed=seed)
        out_img, out_boxes, _ = aug(img, boxes, labels)
        if len(out_boxes) == 0:
            continue
        x1, y1, x2, y2 = (out_boxes[0] * 128).astype(int)
        box_mean = out_img[0, y1:y2, x1:x2].mean()
        assert box_mean > out_img[0].mean()


def test_p_only(rng):
    img, boxes, labels = fixture_item(rng)
    aug = SSDAugmentation(size=96, seed=1, p_only=True)
    out_img, _, _ = aug(img, boxes, labels)
    for p in range(1, 4):
        np.testing.assert_allclose(out_img[0], out_img[p])

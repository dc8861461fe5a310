import numpy as np
import pytest

from gssd_tpu.data.augment_device import DeviceAugmentation


def _raw_batch(rng, B=3, S=128):
    imgs = rng.uniform(0, 255, (B, S, S, 12)).astype(np.float32)
    boxes, labels = [], []
    for b in range(B):
        # paint a bright lesion so content tracking is checkable
        y0, x0 = 40, 60
        imgs[b, y0:y0 + 24, x0:x0 + 30] = 250.0
        boxes.append(np.array([[x0 / S, y0 / S, (x0 + 30) / S,
                                (y0 + 24) / S]], np.float32))
        labels.append(np.zeros(1, np.float32))
    return imgs, boxes, labels


def test_output_contract(rng):
    aug = DeviceAugmentation(size=96, src_size=128, seed=3)
    imgs, boxes, labels = _raw_batch(rng)
    batch = aug(imgs, boxes, labels)
    assert batch["image"].shape == (3, 96, 96, 12)
    img = np.asarray(batch["image"])
    assert img.min() >= -1e-6 and img.max() <= 1 + 1e-6
    assert batch["boxes"].shape == (3, 16, 4)
    v = batch["valid"]
    for b in range(3):
        kept = batch["boxes"][b][v[b]]
        assert (kept[:, 0] < kept[:, 2]).all()
        assert (kept >= -1e-5).all() and (kept <= 1 + 1e-5).all()


def test_boxes_follow_content(rng):
    """Surviving boxes must still cover the bright lesion after the
    on-device warp."""
    hits = 0
    for seed in range(8):
        aug = DeviceAugmentation(size=128, src_size=128, seed=seed,
                                 use_normalize=True)
        imgs, boxes, labels = _raw_batch(rng, B=1)
        batch = aug(imgs, boxes, labels)
        if not batch["valid"][0].any():
            continue
        img = np.asarray(batch["image"][0])
        x1, y1, x2, y2 = (batch["boxes"][0, 0] * 128).astype(int)
        x2, y2 = max(x2, x1 + 1), max(y2, y1 + 1)
        inside = img[y1:y2, x1:x2].mean()
        assert inside > img.mean()
        hits += 1
    assert hits >= 6


def test_identity_geometry_is_resize(rng):
    """With crop == full canvas == image and no flip/photometric, the
    device warp is a plain bilinear resize."""
    import cv2

    aug = DeviceAugmentation(size=64, src_size=128, seed=0,
                             use_normalize=False)
    from gssd_tpu.data.augment_device import GeomParams

    geom = GeomParams(
        scale=np.array([[2.0, 2.0]], np.float32),
        offset=np.zeros((1, 2), np.float32),
        flip=np.array([False]),
        brightness=np.zeros(1, np.float32),
        contrast=np.ones(1, np.float32),
    )
    img = rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32)
    my, mx = aug.interp_matrices(geom)
    out = np.asarray(aug._warp(img, my, mx, geom.brightness, geom.contrast))
    want = cv2.resize(img[0], (64, 64), interpolation=cv2.INTER_LINEAR)
    # interior matches cv2 half-pixel bilinear closely
    np.testing.assert_allclose(out[0, 2:-2, 2:-2], want[2:-2, 2:-2],
                               rtol=1e-3, atol=0.5)


def test_flip_geometry(rng):
    from gssd_tpu.data.augment_device import GeomParams

    aug = DeviceAugmentation(size=128, src_size=128, seed=0,
                             use_normalize=False)
    geom = GeomParams(
        scale=np.ones((1, 2), np.float32),
        offset=np.zeros((1, 2), np.float32),
        flip=np.array([True]),
        brightness=np.zeros(1, np.float32),
        contrast=np.ones(1, np.float32),
    )
    img = rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32)
    my, mx = aug.interp_matrices(geom)
    out = np.asarray(aug._warp(img, my, mx, geom.brightness, geom.contrast))
    np.testing.assert_allclose(out[0, :, 1:-1], img[0, :, ::-1][:, 1:-1],
                               atol=0.5, rtol=1e-3)

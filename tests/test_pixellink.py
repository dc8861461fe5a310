import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssd_tpu.config import PixelLinkConfig
from gssd_tpu.data.pixellink_targets import make_pixel_link_targets
from gssd_tpu.eval.pixellink_decode import (
    _components_numpy,
    link_components,
    mask_to_boxes,
)
from gssd_tpu.ops.pixellink_loss import link_loss, pixel_loss, pixellink_loss


def test_targets_basic():
    boxes = np.array([[0.2, 0.2, 0.4, 0.4]], np.float32)
    t = make_pixel_link_targets(boxes, size=300, version="4s")
    assert t["pixel_mask"].shape == (75, 75)
    assert t["link_mask"].shape == (8, 75, 75)
    area = t["pixel_mask"].sum()
    assert area > 0
    # weights sum to total area / num_boxes * num_boxes = area
    np.testing.assert_allclose(t["pixel_pos_weight"].sum(), area, rtol=1e-5)
    # neg mask is the complement
    assert ((t["pixel_mask"] + t["neg_pixel_mask"]) == 1).all()
    # interior pixels have all 8 links on
    ys, xs = np.nonzero(t["pixel_mask"])
    cy, cx = int(ys.mean()), int(xs.mean())
    assert t["link_mask"][:, cy, cx].all()


def test_targets_overlap_removed():
    boxes = np.array([
        [0.2, 0.2, 0.5, 0.5],
        [0.4, 0.4, 0.7, 0.7],
    ], np.float32)
    t = make_pixel_link_targets(boxes, size=300, version="2s")
    assert t["pixel_mask"].shape == (150, 150)
    # the overlap region [0.4,0.5)^2 is neither positive nor negative
    mid = int(0.45 * 150)
    assert t["pixel_mask"][mid, mid] == 0
    assert t["neg_pixel_mask"][mid, mid] == 0
    # instance-balanced: both instances' weights sum equally
    w = t["pixel_pos_weight"]
    left = w[:, : int(0.4 * 150)].sum() + w[: int(0.4 * 150), :].sum()
    assert w.sum() > 0


def test_targets_empty():
    t = make_pixel_link_targets(np.zeros((0, 4), np.float32), 300, "4s")
    assert t["pixel_mask"].sum() == 0
    assert t["neg_pixel_mask"].all()


def test_pixel_loss_learns_direction():
    t = make_pixel_link_targets(
        np.array([[0.2, 0.2, 0.6, 0.6]], np.float32), 80, "4s"
    )
    tb = {k: jnp.asarray(v)[None] for k, v in t.items()}
    H = 20
    good = np.zeros((1, H, H, 2), np.float32)
    good[..., 1] = np.asarray(t["pixel_mask"]) * 8 - 4
    good[..., 0] = -good[..., 1]
    bad = -good
    lp_good = pixel_loss(jnp.asarray(good), tb["pixel_mask"],
                         tb["neg_pixel_mask"], tb["pixel_pos_weight"])
    lp_bad = pixel_loss(jnp.asarray(bad), tb["pixel_mask"],
                        tb["neg_pixel_mask"], tb["pixel_pos_weight"])
    assert float(sum(lp_good)) < float(sum(lp_bad))


def test_link_loss_shapes_and_no_pos():
    H = 16
    logits = jnp.zeros((2, H, H, 16))
    target = jnp.zeros((2, 8, H, H), jnp.int32)
    posw = jnp.zeros((2, H, H))
    lp, ln = link_loss(logits, target, posw)
    assert float(lp) == 0.0 and float(ln) == 0.0


def test_combined_loss_finite(rng):
    t = make_pixel_link_targets(
        np.array([[0.1, 0.1, 0.5, 0.5]], np.float32), 80, "4s"
    )
    tb = {k: jnp.asarray(v)[None] for k, v in t.items()}
    H = 20
    pix = jnp.asarray(rng.normal(0, 1, (1, H, H, 2)).astype(np.float32))
    lnk = jnp.asarray(rng.normal(0, 1, (1, H, H, 16)).astype(np.float32))
    total, parts = pixellink_loss(pix, lnk, tb)
    assert np.isfinite(float(total))
    assert float(total) == pytest.approx(
        2 * float(parts["pixel_loss"]) + float(parts["link_loss"]), rel=1e-6
    )


def _two_blob_masks(h=20, w=20):
    pixel = np.zeros((h, w), np.uint8)
    pixel[2:6, 2:6] = 1
    pixel[10:15, 10:16] = 1
    link = np.zeros((8, h, w), np.uint8)
    link[:] = pixel  # all links on within blobs
    return pixel, link


def test_components_two_blobs():
    pixel, link = _two_blob_masks()
    labels = _components_numpy(pixel, link)
    assert labels.max() == 2
    assert (labels[2:6, 2:6] == labels[2, 2]).all()
    assert (labels[10:15, 10:16] == labels[10, 10]).all()
    assert labels[2, 2] != labels[10, 10]


def test_native_matches_numpy(rng):
    for _ in range(5):
        pixel = (rng.uniform(size=(40, 40)) > 0.6).astype(np.uint8)
        link = (rng.uniform(size=(8, 40, 40)) > 0.3).astype(np.uint8)
        a = _components_numpy(pixel, link)
        b = link_components(pixel, link)
        # same partition (label ids may differ only by consistent mapping;
        # both use row-major first-visit numbering so they match exactly)
        np.testing.assert_array_equal(a, b)


def test_links_required_to_merge():
    pixel = np.ones((4, 8), np.uint8)
    link = np.zeros((8, 4, 8), np.uint8)
    # no links at all -> every pixel is its own component
    labels = link_components(pixel, link)
    assert labels.max() == 32


def test_mask_to_boxes_roundtrip():
    """Rasterize a gt box -> perfect logits -> decode recovers the box."""
    boxes = np.array([[0.2, 0.3, 0.5, 0.6]], np.float32)
    t = make_pixel_link_targets(boxes, size=300, version="4s")
    H = 75
    pix_logits = np.zeros((H, H, 2), np.float32)
    pix_logits[..., 1] = t["pixel_mask"] * 10 - 5
    pix_logits[..., 0] = -pix_logits[..., 1]
    lnk_logits = np.zeros((H, H, 16), np.float32)
    for j in range(8):
        lnk_logits[..., 2 * j + 1] = t["link_mask"][j] * 10 - 5
        lnk_logits[..., 2 * j] = -lnk_logits[..., 2 * j + 1]
    scores, out = mask_to_boxes(pix_logits, lnk_logits, img_size=300)
    assert len(out) == 1
    assert scores[0] > 0.9
    want = boxes[0] * 300
    np.testing.assert_allclose(out[0], want, atol=8)


def test_default_config_is_reference_4s():
    """Default-constructed PixelLinkConfig must match the reference's
    module defaults (pixel_link/pixel_link_config.py:2: version '4s'),
    so callers that omit pl_cfg (eval/ap_iobb.py, pixellink_decode.py)
    decode at the right scale factor."""
    from gssd_tpu.config import PixelLinkConfig
    from gssd_tpu.data.augment import SSDAugmentation

    cfg = PixelLinkConfig()
    assert cfg.version == "4s"
    assert cfg.scale_factor == 4
    aug = SSDAugmentation(pixel_link_size=32)
    assert aug.pixel_link_version == "4s"

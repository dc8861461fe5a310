"""PixelLink chain parity vs the ACTUAL reference implementation.

Fixtures in goldens/reference_pixellink.npz were produced by running the
reference pixel_link/{pixellink_data,criterion,postprocess}.py (pure
torch/numpy/cv2) on fixed inputs — scripts/make_pixellink_goldens.py.
This pins:
  - target maps incl. the 8-neighbor link direction convention
    (pixellink_data.py:80-98 shift table vs data/pixellink_targets.py);
  - pixel/link loss values (criterion.py:23-105 vs ops/pixellink_loss);
  - union-find decode boxes/scores (postprocess.py:82-233 vs
    eval/pixellink_decode.py).
"""

import os

import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "reference_pixellink.npz")

BOX_SETS = ["two", "overlap", "border", "single", "touching"]


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDENS)


@pytest.mark.parametrize("name", BOX_SETS)
@pytest.mark.parametrize("version", ["2s", "4s"])
def test_target_maps_match_reference(g, name, version):
    from gssd_tpu.data.pixellink_targets import make_pixel_link_targets

    size = int(g["size"])
    boxes = g[f"tgt_{name}_boxes"]
    t = make_pixel_link_targets(boxes, size, version)
    np.testing.assert_array_equal(
        t["pixel_mask"], g[f"tgt_{name}_{version}_pixel_mask"])
    np.testing.assert_array_equal(
        t["neg_pixel_mask"], g[f"tgt_{name}_{version}_neg_pixel_mask"])
    np.testing.assert_allclose(
        t["pixel_pos_weight"], g[f"tgt_{name}_{version}_pixel_pos_weight"],
        rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(
        t["link_mask"], g[f"tgt_{name}_{version}_link_mask"])


def test_loss_values_match_reference(g):
    import jax.numpy as jnp

    from gssd_tpu.data.pixellink_targets import make_pixel_link_targets
    from gssd_tpu.ops.pixellink_loss import link_loss, pixel_loss

    size = int(g["size"])
    maps = [make_pixel_link_targets(g["tgt_two_boxes"], size, "4s"),
            make_pixel_link_targets(g["tgt_single_boxes"], size, "4s")]
    pixel_mask = jnp.stack([jnp.asarray(m["pixel_mask"]) for m in maps])
    neg_mask = jnp.stack([jnp.asarray(m["neg_pixel_mask"]) for m in maps])
    pos_w = jnp.stack([jnp.asarray(m["pixel_pos_weight"]) for m in maps])
    link_mask = jnp.stack([jnp.asarray(m["link_mask"]) for m in maps])

    # goldens store reference-layout NCHW logits; ours are NHWC
    pix_logits = jnp.transpose(jnp.asarray(g["loss_pixel_logits"]),
                               (0, 2, 3, 1))
    lnk_logits = jnp.transpose(jnp.asarray(g["loss_link_logits"]),
                               (0, 2, 3, 1))

    pp, pn = pixel_loss(pix_logits, pixel_mask, neg_mask, pos_w,
                        neg_pos_ratio=3)
    np.testing.assert_allclose(float(pp), float(g["loss_pixel_pos"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(pn), float(g["loss_pixel_neg"]),
                               rtol=1e-5)

    lp, ln = link_loss(lnk_logits, link_mask, pos_w)
    np.testing.assert_allclose(float(lp), float(g["loss_link_pos"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ln), float(g["loss_link_neg"]),
                               rtol=1e-5)


@pytest.mark.parametrize("name", ["two", "touching", "single"])
def test_decode_matches_reference(g, name):
    from gssd_tpu.config import PixelLinkConfig
    from gssd_tpu.eval.pixellink_decode import mask_to_boxes

    size = int(g["size"])
    pix = np.transpose(g[f"dec_{name}_pixel_logits"][0], (1, 2, 0))
    lnk = np.transpose(g[f"dec_{name}_link_logits"][0], (1, 2, 0))
    det_ref = g[f"dec_{name}_detections"][0]  # [n, 5] score, x1..y2

    scores, boxes = mask_to_boxes(pix, lnk, size, PixelLinkConfig())
    assert len(scores) == det_ref.shape[0], (
        f"component count {len(scores)} != reference {det_ref.shape[0]}")
    # match by box (component enumeration order may differ)
    order = np.lexsort((boxes[:, 1], boxes[:, 0]))
    ref_order = np.lexsort((det_ref[:, 2], det_ref[:, 1]))
    np.testing.assert_allclose(boxes[order], det_ref[ref_order, 1:],
                               atol=1e-4)
    np.testing.assert_allclose(scores[order], det_ref[ref_order, 0],
                               rtol=1e-4, atol=1e-5)

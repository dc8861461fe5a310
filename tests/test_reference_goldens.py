"""Parity against recorded outputs of the ACTUAL reference
implementation (box_utils.match / MultiBoxLoss / nms / Detect, run on
torch CPU by scripts/make_reference_goldens.py and frozen in
tests/goldens/reference_ops.npz).

These are the paths where AP parity is won (SURVEY §7.2.2-3) — the
other unit tests check against independent numpy re-implementations;
these check against the reference itself, including forced-match and
score-tie cases.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from gssd_tpu.config import DetectConfig, LossConfig
from gssd_tpu.ops.losses import multibox_loss
from gssd_tpu.ops.matcher import match
from gssd_tpu.ops.nms import detect, nms

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "reference_ops.npz")


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLD)


def _pad_gt(truths, max_gt=16):
    G = truths.shape[0]
    boxes = np.zeros((max_gt, 4), np.float32)
    boxes[:G] = truths
    labels = np.zeros(max_gt, np.int32)
    valid = np.zeros(max_gt, bool)
    valid[:G] = True
    return boxes, labels, valid


@pytest.mark.parametrize("case", ["rand3", "dup2", "mirror", "exact_prior"])
def test_match_parity(gold, case):
    priors = jnp.asarray(gold["priors"])
    truths = gold[f"match_{case}_truths"]
    boxes, labels, valid = _pad_gt(truths)
    loc_t, conf_t = match(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid),
        priors, 0.5, (0.1, 0.2),
    )
    ref_conf = gold[f"match_{case}_conf_t"]
    np.testing.assert_array_equal(np.asarray(conf_t), ref_conf)
    # loc_t only matters where conf_t > 0 (we substitute safe boxes for
    # background priors to keep encode finite; the reference encodes
    # whatever was matched, but the loss masks it out)
    pos = ref_conf > 0
    np.testing.assert_allclose(
        np.asarray(loc_t)[pos], gold[f"match_{case}_loc_t"][pos],
        atol=2e-5, rtol=1e-4,
    )


@pytest.mark.parametrize("ratio", [1, 3])
def test_multibox_loss_parity(gold, ratio):
    priors = jnp.asarray(gold["priors"])
    max_gt = 16
    b0, l0, v0 = _pad_gt(gold["mbl_tgt0"][:, :4], max_gt)
    b1, l1, v1 = _pad_gt(gold["mbl_tgt1"][:, :4], max_gt)
    cfg = LossConfig(num_classes=2, neg_pos_ratio=ratio, max_gt_boxes=max_gt)
    loss_l, loss_c, _ = multibox_loss(
        jnp.asarray(gold["mbl_loc_pred"]),
        jnp.asarray(gold["mbl_conf_pred"]),
        priors,
        jnp.asarray(np.stack([b0, b1])),
        jnp.asarray(np.stack([l0, l1])),
        jnp.asarray(np.stack([v0, v1])),
        cfg,
    )
    np.testing.assert_allclose(
        float(loss_l), gold[f"mbl_r{ratio}_loss_l"], rtol=2e-4)
    np.testing.assert_allclose(
        float(loss_c), gold[f"mbl_r{ratio}_loss_c"], rtol=2e-4)


@pytest.mark.parametrize("case", ["rand", "tie_dup", "tie_disjoint"])
def test_nms_kept_set_parity(gold, case):
    boxes = gold[f"nms_{case}_boxes"]
    scores = gold[f"nms_{case}_scores"]
    s, b, count = nms(jnp.asarray(boxes), jnp.asarray(scores),
                      overlap=0.45, top_k=200, conf_thresh=0.0)
    count = int(count)
    ref_s = gold[f"nms_{case}_kept_scores"]
    ref_b = gold[f"nms_{case}_kept_boxes"]
    assert count == len(ref_s)
    got = np.concatenate(
        [np.asarray(s)[:count, None], np.asarray(b)[:count]], axis=1)
    want = np.concatenate([ref_s[:, None], ref_b], axis=1)
    # rows sorted lexicographically: on exact score ties torch's sort
    # (ascending, processed from the back) and lax.top_k pick tied
    # candidates in different index order but the kept (score, box)
    # rows must coincide as a set
    def key(rows):
        return rows[np.lexsort(rows.T[::-1])]

    np.testing.assert_allclose(key(got), key(want), atol=1e-5)


def test_detect_parity(gold):
    import jax

    priors = jnp.asarray(gold["priors"])
    loc = jnp.asarray(gold["detect_loc"])
    conf = jax.nn.softmax(jnp.asarray(gold["detect_logits"]), axis=-1)
    out = np.asarray(detect(loc, conf, priors,
                            DetectConfig(num_classes=2)))
    ref = gold["detect_out"]
    assert out.shape == ref.shape == (1, 2, 200, 5)
    # compare class-1 rows with score > 0 as sorted sets
    got = out[0, 1]
    want = ref[0, 1]
    got = got[got[:, 0] > 0]
    want = want[want[:, 0] > 0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

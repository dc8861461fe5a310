#!/usr/bin/env python
"""Generate reference-golden parity fixtures by RUNNING the reference
implementation (torch CPU) on fixed inputs and recording its outputs.

Covers the AP-critical paths SURVEY §7.2.2-3 calls out:
  - box_utils.match  (bipartite matching incl. forced-match tie cases)
  - MultiBoxLoss     (OHNM loss values, neg_pos_ratio 1 and 3)
  - box_utils.nms    (kept sets incl. exact score ties)
  - Detect           (decode + per-class NMS packing [B, C, 200, 5])

Run from the repo root (reads /root/reference, writes
tests/goldens/reference_ops.npz):

    python scripts/make_reference_goldens.py

The fixture file is committed; this script only needs re-running if the
fixture design changes. No reference code is copied — it is imported
from /root/reference and executed.
"""

import os
import sys

import numpy as np

REF = "/root/reference/ssd_liverdet"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def _import_reference():
    sys.path.insert(0, REF)
    import types

    import torch  # noqa: F401

    # torchvision is not installed; the reference only imports
    # torchvision.transforms at data_custom.py:12 without using it on
    # the code paths we execute — stub it.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms

    from layers import box_utils  # match, nms, decode, encode
    from layers.modules.multibox_loss import MultiBoxLoss
    from layers.functions.detection_pytorch_ver_1point5 import Detect
    from layers.functions.prior_box import PriorBox
    from data import v2

    return box_utils, MultiBoxLoss, Detect, PriorBox, v2


def make_priors(PriorBox, v2):
    return PriorBox(v2).forward().numpy()  # [8732, 4] center-form


def match_cases(rng, priors_np):
    """Fixture gt sets, including the tie cases the verdict calls out:
    duplicate gts forcing the same best prior (last-gt-wins), and a gt
    whose IoU sits at the 0.5 threshold boundary."""
    cases = {}
    # 1: random 3-box image
    t = rng.uniform(0.1, 0.8, (3, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.3, (3, 2)).astype(np.float32)
    cases["rand3"] = np.concatenate([t, np.minimum(t + wh, 1.0)], 1)
    # 2: duplicate gts -> same best prior, sequential overwrite order
    b = np.asarray([[0.2, 0.2, 0.5, 0.5]], np.float32)
    cases["dup2"] = np.concatenate([b, b], 0)
    # 3: two gts tied on IoU for many priors (mirror-symmetric boxes)
    cases["mirror"] = np.asarray(
        [[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]], np.float32)
    # 4: single gt equal to an exact prior (IoU == 1 somewhere) plus a
    # sliver gt (tiny overlap everywhere)
    pf = priors_np[:, :2], priors_np[:, 2:]
    p100 = np.concatenate(
        [priors_np[100, :2] - priors_np[100, 2:] / 2,
         priors_np[100, :2] + priors_np[100, 2:] / 2]).astype(np.float32)
    cases["exact_prior"] = np.stack(
        [np.clip(p100, 0, 1), np.asarray([0.0, 0.0, 0.02, 0.02], np.float32)])
    return cases


def main():
    import torch

    torch.manual_seed(1111)
    box_utils, MultiBoxLoss, Detect, PriorBox, v2 = _import_reference()
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(1111)
    out = {}

    priors = make_priors(PriorBox, v2)
    out["priors"] = priors
    P = priors.shape[0]

    # ---- match --------------------------------------------------------
    for name, truths in match_cases(rng, priors).items():
        G = truths.shape[0]
        labels = np.zeros(G, np.float32)  # all lesions (fg class 0)
        loc_t = torch.zeros(1, P, 4)
        conf_t = torch.zeros(1, P, dtype=torch.long)
        box_utils.match(
            0.5, torch.from_numpy(truths), torch.from_numpy(priors),
            list(v2["variance"]), torch.from_numpy(labels), loc_t, conf_t, 0,
        )
        out[f"match_{name}_truths"] = truths
        out[f"match_{name}_loc_t"] = loc_t[0].numpy()
        out[f"match_{name}_conf_t"] = conf_t[0].numpy().astype(np.int32)

    # ---- MultiBoxLoss ---------------------------------------------------
    B = 2
    loc_pred = rng.normal(0, 0.5, (B, P, 4)).astype(np.float32)
    conf_pred = rng.normal(0, 1.0, (B, P, 2)).astype(np.float32)
    tgt0 = np.asarray([[0.2, 0.2, 0.5, 0.5, 0.0],
                       [0.55, 0.55, 0.9, 0.85, 0.0]], np.float32)
    tgt1 = np.asarray([[0.3, 0.1, 0.8, 0.6, 0.0]], np.float32)
    out["mbl_loc_pred"], out["mbl_conf_pred"] = loc_pred, conf_pred
    out["mbl_tgt0"], out["mbl_tgt1"] = tgt0, tgt1
    preds = (
        torch.from_numpy(loc_pred),
        torch.from_numpy(conf_pred),
        torch.from_numpy(priors),
    )
    targets = [torch.from_numpy(tgt0), torch.from_numpy(tgt1)]
    for ratio in (1, 3):
        crit = MultiBoxLoss(2, 0.5, True, 0, True, ratio, 0.5, False, False)
        with torch.no_grad():
            loss_l, loss_c = crit(preds, targets)
        out[f"mbl_r{ratio}_loss_l"] = np.float32(loss_l.item())
        out[f"mbl_r{ratio}_loss_c"] = np.float32(loss_c.item())

    # ---- nms ------------------------------------------------------------
    def run_nms(name, boxes, scores, overlap=0.45, top_k=200):
        ids, count = box_utils.nms(
            torch.from_numpy(boxes), torch.from_numpy(scores),
            overlap, top_k)
        ids = ids[:count].numpy()
        out[f"nms_{name}_boxes"] = boxes
        out[f"nms_{name}_scores"] = scores
        out[f"nms_{name}_kept_scores"] = scores[ids]
        out[f"nms_{name}_kept_boxes"] = boxes[ids]

    # random cloud of overlapping boxes
    n = 64
    ctr = rng.uniform(0.2, 0.8, (n, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.4, (n, 2)).astype(np.float32)
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    run_nms("rand", boxes, scores)
    # exact score ties on identical boxes (duplicate detections)
    bb = np.asarray([[0.1, 0.1, 0.4, 0.4]], np.float32)
    tie_boxes = np.concatenate([bb, bb, bb + 0.5], 0)
    tie_scores = np.asarray([0.7, 0.7, 0.7], np.float32)
    run_nms("tie_dup", tie_boxes, tie_scores)
    # exact score ties on disjoint boxes (all survive)
    dis_boxes = np.asarray(
        [[0.0, 0.0, 0.2, 0.2], [0.4, 0.4, 0.6, 0.6], [0.8, 0.8, 1.0, 1.0]],
        np.float32)
    run_nms("tie_disjoint", dis_boxes,
            np.asarray([0.5, 0.5, 0.5], np.float32))

    # ---- Detect -----------------------------------------------------------
    loc = rng.normal(0, 0.3, (1, P, 4)).astype(np.float32)
    logits = rng.normal(0, 1.5, (1, P, 2)).astype(np.float32)
    conf = torch.softmax(torch.from_numpy(logits), dim=-1)
    det = Detect.apply(
        2, 0, 200, 0.01, 0.45,
        torch.from_numpy(loc), conf.view(-1, 2), torch.from_numpy(priors),
    )
    out["detect_loc"] = loc
    out["detect_logits"] = logits
    out["detect_out"] = det.numpy()  # [1, 2, 200, 5]

    path = os.path.join(OUT, "reference_ops.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({len(out)} arrays)")


if __name__ == "__main__":
    main()

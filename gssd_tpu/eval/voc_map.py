"""VOC multi-class mAP evaluation.

The reference's VOC harness (eval.py:1-420 / eval_liver.py — the
upstream-fork mAP script over VOCdevkit annotations) evaluated per-class
AP at IoU 0.5 with the 07/exact metric switch and averaged over the 20
classes. This rebuild reuses the repo's batched inference +
evaluate_detections sweep (eval/ap_iobb.py): one pass over the dataset
collects detections for every class from the [B, C, K, 5] Detect
output, then per-class greedy TP/FP + voc_ap, mAP = mean over classes
with ground truth.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np

from gssd_tpu.eval.ap_iobb import evaluate_detections


def run_voc_map(
    infer_fn: Callable[[np.ndarray], np.ndarray],
    dataset,
    transform,
    num_classes: int = 21,
    conf_threshold: float = 0.01,
    iou_threshold: float = 0.5,
    use_07_metric: bool = False,
    batch_size: int = 16,
) -> Dict[str, float]:
    """dataset: VOCDataset-protocol (pull_image [H, W, 3] 0..255,
    pull_anno [n, 5] normalized boxes + class index). Returns
    {'map': ..., 'ap_<cls>': ...} over foreground classes 1..C-1
    (class 0 = background)."""
    n = len(dataset)
    preds = {c: [] for c in range(1, num_classes)}
    gts = {c: {} for c in range(1, num_classes)}
    # difficult objects are IGNORE targets (reference eval.py:272-336):
    # kept in the gt set with a flag, excluded from npos, matches
    # neither TP nor FP — pulled via pull_anno_with_difficult when the
    # dataset provides it (VOCDataset does)
    diffs = {c: {} for c in range(1, num_classes)}
    with_diff = hasattr(dataset, "pull_anno_with_difficult")
    for start in range(0, n, batch_size):
        images, sizes = [], []
        for idx in range(start, min(start + batch_size, n)):
            raw = dataset.pull_image(idx)
            if raw.ndim == 3:
                raw = raw[None]  # [1, H, W, 3] phase axis
            if with_diff:
                anno, dflags = dataset.pull_anno_with_difficult(idx)
            else:
                anno = dataset.pull_anno(idx)  # [m, 5] normalized + class
                dflags = np.zeros(len(anno), bool)
            H, W = raw.shape[1], raw.shape[2]
            for c in range(1, num_classes):
                sel = anno[:, 4] == c - 1
                rows = anno[sel, :4]
                gts[c][idx] = (rows * [W, H, W, H]).astype(np.float64)
                diffs[c][idx] = dflags[sel]
            x, _, _ = transform(raw)
            p, h, w, ch = x.shape
            images.append(np.transpose(x, (1, 2, 0, 3)).reshape(h, w, p * ch))
            sizes.append((W, H))
        pad = batch_size - len(images)
        if pad:
            images += [np.zeros_like(images[-1])] * pad
        det = np.asarray(infer_fn(np.stack(images).astype(np.float32)))
        for bi in range(len(sizes)):
            idx = start + bi
            W, H = sizes[bi]
            for c in range(1, num_classes):
                rows = det[bi, c]
                rows = rows[rows[:, 0] > conf_threshold]
                if len(rows) == 0:
                    continue
                out = np.empty((len(rows), 6))
                out[:, 0] = idx
                out[:, 1] = rows[:, 0]
                out[:, 2:6] = rows[:, 1:5] * [W, H, W, H]
                preds[c].append(out)
    result = {}
    aps = []
    from gssd_tpu.data.voc import VOC_CLASSES

    for c in range(1, num_classes):
        npos = sum(
            int(np.sum(~diffs[c].get(k, np.zeros(len(v), bool))))
            for k, v in gts[c].items())
        if npos == 0:
            continue  # class absent from this split (difficult-only too)
        p = np.concatenate(preds[c]) if preds[c] else np.zeros((0, 6))
        ap = evaluate_detections(p, gts[c], iou_threshold, "iou",
                                 use_07_metric, gt_difficult=diffs[c])
        name = (VOC_CLASSES[c - 1] if c - 1 < len(VOC_CLASSES)
                else f"class{c}")
        result[f"ap_{name}"] = ap
        aps.append(ap)
    result["map"] = float(np.mean(aps)) if aps else 0.0
    return result

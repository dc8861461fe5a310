"""AP / IoBB evaluation harness.

Same protocol as the reference's test_net (test_ap_iobb.py:231-328) with
its make_pred collection loop (:70-225):

1. run the detector in test mode over every eval image, keep class-1
   detections with score > 0, scale boxes to original pixels, filter by
   the confidence threshold;
2. sort all detections by confidence (descending) across the dataset;
3. for every (metric in {IoU, IoBB}) x (threshold in ap_list/iobb_list):
   greedy TP/FP assignment — a detection is a TP if its best-overlap gt
   in the same image clears the threshold and is not already claimed
   (per-gt ``det`` dedup flags, :254-303); IoBB divides the intersection
   by the *predicted* box area instead of the union (:273-278);
4. precision/recall cumsums -> AP via the 11-point VOC-07 rule or exact
   AUC (voc_ap, :10-41).

The forward pass is batched through one jitted infer step (decode + NMS
on device) rather than the reference's per-image host loop.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    """VOC AP from recall/precision curves."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = prec[rec >= t].max() if (rec >= t).any() else 0.0
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate([[0.0], rec, [1.0]])
    mpre = np.concatenate([[0.0], prec, [0.0]])
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _overlap(pred_box: np.ndarray, gts: np.ndarray, metric: str) -> np.ndarray:
    """Overlap of one predicted box against [n, 4] gts (pixel coords)."""
    ix1 = np.maximum(gts[:, 0], pred_box[0])
    iy1 = np.maximum(gts[:, 1], pred_box[1])
    ix2 = np.minimum(gts[:, 2], pred_box[2])
    iy2 = np.minimum(gts[:, 3], pred_box[3])
    iw = np.maximum(ix2 - ix1, 0.0)
    ih = np.maximum(iy2 - iy1, 0.0)
    inter = iw * ih
    pred_area = (pred_box[2] - pred_box[0]) * (pred_box[3] - pred_box[1])
    if metric == "iobb":
        denom = pred_area
    else:
        gt_area = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
        denom = gt_area + pred_area - inter
    return inter / np.maximum(denom, 1e-12)


def evaluate_detections(
    predictions: np.ndarray,
    gt_boxes: Dict[int, np.ndarray],
    threshold: float,
    metric: str = "iou",
    use_07_metric: bool = False,
    gt_difficult: "Optional[Dict[int, np.ndarray]]" = None,
) -> float:
    """AP of a detection set at one (metric, threshold).

    Args:
      predictions: [N, 6] rows (image_idx, score, x1, y1, x2, y2),
        any order (sorted internally by score desc).
      gt_boxes: image_idx -> [n, 4] pixel gt boxes.
      metric: 'iou' or 'iobb'.
      gt_difficult: optional image_idx -> [n] bool flags aligned with
        gt_boxes. Difficult objects are IGNORE targets (VOC protocol,
        reference eval.py:272-336): excluded from npos, and a detection
        whose best match is difficult counts as neither TP nor FP.
    """
    any_difficult = gt_difficult is not None and any(
        np.any(v) for v in gt_difficult.values())
    if any_difficult:
        npos = sum(
            int(np.sum(~np.asarray(gt_difficult.get(k, np.zeros(len(v),
                                                                bool)))))
            for k, v in gt_boxes.items())
    else:
        npos = sum(len(v) for v in gt_boxes.values())
    if npos == 0:
        return 0.0
    if len(predictions) == 0:
        return 0.0
    order = np.argsort(-predictions[:, 1], kind="stable")
    preds = predictions[order]

    tp = fp = None
    from gssd_tpu.native import load_native

    lib = load_native()
    # the C++ sweep has no difficult-flag column; the ignore protocol
    # only arises on VOC-style sets, which are small — numpy handles it
    if any_difficult:
        lib = None
    if lib is not None and hasattr(lib, "eval_sweep"):
        import ctypes

        keys = sorted(gt_boxes)
        remap = {k: i for i, k in enumerate(keys)}
        offsets = np.zeros(len(keys) + 1, np.int64)
        for i, k in enumerate(keys):
            offsets[i + 1] = offsets[i] + len(gt_boxes[k])
        flat_gt = (
            np.concatenate([np.asarray(gt_boxes[k], np.float64)
                            for k in keys])
            if offsets[-1] else np.zeros((0, 4))
        )
        p = np.ascontiguousarray(preds, np.float64)
        p[:, 0] = [remap.get(int(v), -1) for v in preds[:, 0]]
        tp8 = np.zeros(len(p), np.uint8)
        fp8 = np.zeros(len(p), np.uint8)
        lib.eval_sweep(
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(p),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(keys),
            np.ascontiguousarray(flat_gt, np.float64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            float(threshold), 1 if metric == "iobb" else 0,
            tp8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            fp8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        tp, fp = tp8.astype(np.float64), fp8.astype(np.float64)

    if tp is None:  # numpy fallback, identical semantics
        claimed = {k: np.zeros(len(v), bool) for k, v in gt_boxes.items()}
        tp = np.zeros(len(preds))
        fp = np.zeros(len(preds))
        for i, row in enumerate(preds):
            img = int(row[0])
            gts = gt_boxes.get(img)
            if gts is None or len(gts) == 0:
                fp[i] = 1.0
                continue
            ov = _overlap(row[2:6], gts, metric)
            j = int(np.argmax(ov))
            if ov[j] > threshold:
                if any_difficult and gt_difficult.get(img) is not None \
                        and len(gt_difficult[img]) > j \
                        and gt_difficult[img][j]:
                    continue  # ignore: neither TP nor FP (eval.py:316-326)
                if not claimed[img][j]:
                    tp[i] = 1.0
                    claimed[img][j] = True
                else:
                    fp[i] = 1.0
            else:
                fp[i] = 1.0
    tp_c = np.cumsum(tp)
    fp_c = np.cumsum(fp)
    rec = tp_c / npos
    prec = tp_c / np.maximum(tp_c + fp_c, np.finfo(np.float64).eps)
    return voc_ap(rec, prec, use_07_metric)


def _stream_batches(dataset, transform, batch_size: int,
                    gt_boxes: Dict[int, np.ndarray]):
    """Yield (start, batch [B,H,W,12], sizes [(W,H)...]) chunk by chunk.

    Images are pulled and transformed per chunk so eval memory is
    O(batch), not O(dataset) — the reference preloads the whole split
    (make_pred's serial loop is per-image but our batched path used to
    materialize everything first); gt_boxes (tiny) is filled as a side
    effect."""
    n = len(dataset)
    for start in range(0, n, batch_size):
        images, sizes = [], []
        for idx in range(start, min(start + batch_size, n)):
            raw = dataset.pull_image(idx)   # [4, H, W, 3] 0..255
            anno = dataset.pull_anno(idx)   # [m, 5] pixel boxes
            gt_boxes[idx] = anno[:, :4].astype(np.float64)
            x, _, _ = transform(raw)
            p, h, w, c = x.shape
            images.append(
                np.transpose(x, (1, 2, 0, 3)).reshape(h, w, p * c))
            sizes.append((raw.shape[2], raw.shape[1]))  # (W, H)
        # pad the tail chunk to the static batch size with zeros (the
        # compiled infer executable has a fixed shape, so the pad rows
        # are computed regardless; zeros keep them semantically inert
        # and consumers only read the first len(sizes) rows)
        pad = batch_size - len(images)
        if pad:
            images += [np.zeros_like(images[-1])] * pad
        batch = np.stack(images).astype(np.float32)
        yield start, batch, sizes


def collect_predictions(
    infer_fn: Callable[[np.ndarray], np.ndarray],
    dataset,
    transform,
    conf_threshold: float = 0.2,
    batch_size: int = 16,
    class_idx: int = 1,
    score_sink: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[np.ndarray, Dict[int, np.ndarray]]:
    """Run the detector over a dataset; return (predictions, gt_boxes).

    infer_fn maps a [B, H, W, 12] float batch -> [B, C, K, 5] detections
    in normalized coords (score, x1, y1, x2, y2). Predictions are scaled
    back to original pixel size (make_pred, test_ap_iobb.py:126-141) and
    filtered at conf_threshold (:148). Images stream through in
    O(batch) memory. If score_sink is given it is filled with 'raw'
    (all score>0 detections) and 'filtered' (post conf_threshold)
    score arrays for TB histograms (test_ap_iobb.py:201-207).
    """
    preds: List[np.ndarray] = []
    gt_boxes: Dict[int, np.ndarray] = {}
    raw_scores: List[np.ndarray] = []
    kept_scores: List[np.ndarray] = []
    for start, batch, sizes in _stream_batches(
            dataset, transform, batch_size, gt_boxes):
        det = np.asarray(infer_fn(batch))  # [B, C, K, 5]
        for bi in range(len(sizes)):
            idx = start + bi
            rows = det[bi, class_idx]  # [K, 5]
            if score_sink is not None:
                raw_scores.append(rows[rows[:, 0] > 0, 0])
            keep = rows[:, 0] > conf_threshold
            rows = rows[keep]
            if score_sink is not None:
                kept_scores.append(rows[:, 0])
            if len(rows) == 0:
                continue
            W, H = sizes[bi]
            out = np.empty((len(rows), 6))
            out[:, 0] = idx
            out[:, 1] = rows[:, 0]
            out[:, 2] = rows[:, 1] * W
            out[:, 3] = rows[:, 2] * H
            out[:, 4] = rows[:, 3] * W
            out[:, 5] = rows[:, 4] * H
            preds.append(out)
    if score_sink is not None:
        score_sink["raw"] = (
            np.concatenate(raw_scores) if raw_scores else np.zeros(0))
        score_sink["filtered"] = (
            np.concatenate(kept_scores) if kept_scores else np.zeros(0))
    all_preds = (
        np.concatenate(preds) if preds else np.zeros((0, 6))
    )
    return all_preds, gt_boxes


def collect_predictions_pixellink(
    forward_fn: Callable,
    dataset,
    transform,
    conf_threshold: float = 0.2,
    batch_size: int = 16,
    img_size: int = 300,
    pl_cfg=None,
) -> Tuple[np.ndarray, Dict[int, np.ndarray]]:
    """PixelLink eval path (use_pixel_link=True, test_ap_iobb.py:103-117):
    forward -> (pixel, link) logit maps -> host union-find decode ->
    prediction rows. forward_fn maps [B, H, W, 12] -> (pixel [B,h,w,2],
    link [B,h,w,16])."""
    from gssd_tpu.config import PixelLinkConfig
    from gssd_tpu.eval.pixellink_decode import mask_to_boxes

    pl_cfg = pl_cfg or PixelLinkConfig()
    preds: List[np.ndarray] = []
    gt_boxes: Dict[int, np.ndarray] = {}
    for start, batch, sizes in _stream_batches(
            dataset, transform, batch_size, gt_boxes):
        pix, lnk = forward_fn(batch)
        pix, lnk = np.asarray(pix), np.asarray(lnk)
        for bi in range(len(sizes)):
            idx = start + bi
            scores, boxes = mask_to_boxes(pix[bi], lnk[bi], img_size, pl_cfg)
            keep = scores > conf_threshold
            scores, boxes = scores[keep], boxes[keep]
            if len(scores) == 0:
                continue
            W, H = sizes[bi]
            out = np.empty((len(scores), 6))
            out[:, 0] = idx
            out[:, 1] = scores
            out[:, 2] = boxes[:, 0] * W / img_size
            out[:, 3] = boxes[:, 1] * H / img_size
            out[:, 4] = boxes[:, 2] * W / img_size
            out[:, 5] = boxes[:, 3] * H / img_size
            preds.append(out)
    all_preds = np.concatenate(preds) if preds else np.zeros((0, 6))
    return all_preds, gt_boxes


def run_detection_eval(
    infer_fn,
    dataset,
    transform,
    ap_list: Sequence[float] = (0.3, 0.5, 0.7),
    iobb_list: Sequence[float] = (0.3, 0.5, 0.7),
    conf_threshold: float = 0.2,
    use_07_metric: bool = False,
    batch_size: int = 16,
    use_pixel_link: bool = False,
    img_size: int = 300,
    pl_cfg=None,
    score_sink: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, float]:
    """Full sweep -> {'ap30': ..., 'ap50': ..., 'iobb30': ...} (the
    reference's test_net_wrapper outputs, train v2.py:409-431)."""
    if use_pixel_link:
        preds, gts = collect_predictions_pixellink(
            infer_fn, dataset, transform, conf_threshold, batch_size,
            img_size, pl_cfg,
        )
    else:
        preds, gts = collect_predictions(
            infer_fn, dataset, transform, conf_threshold, batch_size,
            score_sink=score_sink,
        )
    out = {}
    for t in ap_list:
        out[f"ap{int(round(t * 100))}"] = evaluate_detections(
            preds, gts, t, "iou", use_07_metric
        )
    for t in iobb_list:
        out[f"iobb{int(round(t * 100))}"] = evaluate_detections(
            preds, gts, t, "iobb", use_07_metric
        )
    return out

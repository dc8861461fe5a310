import numpy as np
import pytest

from gssd_tpu.eval import evaluate_detections, run_detection_eval, voc_ap
from gssd_tpu.data import BaseTransform, LesionDataset
from gssd_tpu.data.synthetic import make_synthetic_dataset


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec, use_07_metric=False) == 1.0
    assert abs(voc_ap(rec, prec, use_07_metric=True) - 1.0) < 1e-9


def test_voc_ap_known_curve():
    # one TP then one FP over 1 gt: rec [1,1], prec [1,0.5] -> AUC AP = 1
    rec = np.array([1.0, 1.0])
    prec = np.array([1.0, 0.5])
    assert voc_ap(rec, prec) == 1.0
    # 11-pt: all 11 recall points have max prec 1.0
    assert abs(voc_ap(rec, prec, True) - 1.0) < 1e-9


def test_evaluate_perfect_detection():
    gts = {0: np.array([[10.0, 10, 50, 50]]), 1: np.array([[20.0, 20, 80, 80]])}
    preds = np.array([
        [0, 0.9, 10, 10, 50, 50],
        [1, 0.8, 20, 20, 80, 80],
    ])
    assert evaluate_detections(preds, gts, 0.5, "iou") == 1.0


def test_evaluate_duplicate_is_fp():
    gts = {0: np.array([[10.0, 10, 50, 50]])}
    preds = np.array([
        [0, 0.9, 10, 10, 50, 50],
        [0, 0.8, 11, 11, 51, 51],  # duplicate -> FP
    ])
    ap = evaluate_detections(preds, gts, 0.5, "iou")
    assert ap == 1.0  # recall already 1 before the FP

    # two gts, a duplicate on the first: rec [.5,.5,1], prec [1,.5,2/3]
    gts2 = {0: np.array([[10.0, 10, 50, 50], [100.0, 100, 150, 150]])}
    preds2 = np.array([
        [0, 0.9, 10, 10, 50, 50],
        [0, 0.8, 11, 11, 51, 51],   # duplicate of gt 0 -> FP
        [0, 0.7, 100, 100, 150, 150],
    ])
    ap2 = evaluate_detections(preds2, gts2, 0.5, "iou")
    np.testing.assert_allclose(ap2, 0.5 * 1.0 + 0.5 * (2 / 3), atol=1e-9)


def test_iobb_more_lenient_for_small_preds():
    # small predicted box fully inside gt: IoBB = 1, IoU < 1
    gts = {0: np.array([[0.0, 0, 100, 100]])}
    preds = np.array([[0, 0.9, 30, 30, 60, 60]])
    assert evaluate_detections(preds, gts, 0.7, "iobb") == 1.0
    assert evaluate_detections(preds, gts, 0.7, "iou") == 0.0


def test_miss_gives_zero():
    gts = {0: np.array([[10.0, 10, 50, 50]])}
    preds = np.zeros((0, 6))
    assert evaluate_detections(preds, gts, 0.5) == 0.0


def test_run_eval_with_oracle_detector(tmp_path):
    """Feed an oracle infer_fn that returns each image's true boxes; the
    full pipeline (transform, scaling, sweep) must give AP 1.0."""
    d = str(tmp_path / "ml")
    make_synthetic_dataset(d, num_subjects=6, slices_per_subject=1,
                           image_size=128)
    from gssd_tpu.data import DataSplitter

    sp = DataSplitter(d, cross_validation=1, num_test_subject=1)
    ds = LesionDataset(d, sp.data_test)
    annos = {i: ds.pull_anno(i) for i in range(len(ds))}
    counter = {"i": 0}

    def oracle(batch):
        B = batch.shape[0]
        out = np.zeros((B, 2, 200, 5), np.float32)
        for bi in range(B):
            idx = counter["i"] + bi
            if idx < len(ds):
                a = annos[idx]
                for j, row in enumerate(a):
                    out[bi, 1, j, 0] = 0.95
                    out[bi, 1, j, 1:] = row[:4] / 128.0
        counter["i"] += B
        return out

    res = run_detection_eval(oracle, ds, BaseTransform(size=96),
                             batch_size=len(ds))
    assert res["ap50"] == 1.0
    assert res["iobb50"] == 1.0
    assert set(res) == {"ap30", "ap50", "ap70", "iobb30", "iobb50", "iobb70"}


def test_native_sweep_matches_numpy(rng, monkeypatch):
    """The C++ eval_sweep must produce identical AP to the numpy path."""
    gts = {}
    preds = []
    for img in range(6):
        n = int(rng.integers(1, 4))
        xy = rng.uniform(0, 200, (n, 2))
        wh = rng.uniform(20, 80, (n, 2))
        gts[img] = np.concatenate([xy, xy + wh], 1)
        for j in range(n + 1):
            jit = rng.normal(0, 15, 4)
            base = gts[img][min(j, n - 1)]
            preds.append([img, rng.uniform(0.1, 1.0), *(base + jit)])
    preds = np.asarray(preds)

    results_native = [
        evaluate_detections(preds, gts, t, m)
        for t in (0.3, 0.5, 0.7) for m in ("iou", "iobb")
    ]
    import gssd_tpu.eval.ap_iobb as mod
    import gssd_tpu.native as native_mod

    monkeypatch.setattr("gssd_tpu.native.load_native", lambda: None)
    results_numpy = [
        evaluate_detections(preds, gts, t, m)
        for t in (0.3, 0.5, 0.7) for m in ("iou", "iobb")
    ]
    np.testing.assert_allclose(results_native, results_numpy, atol=1e-12)


def test_difficult_gt_is_ignore_not_fp():
    """VOC difficult protocol (reference eval.py:272-336): difficult gt
    are excluded from npos and detections matching them are neither TP
    nor FP. Scenario chosen so drop-vs-ignore semantics disagree: two
    high-scored detections on the difficult box would be TP+FP (AP
    0.833) if difficult were an ordinary gt, and 2 FPs (AP < 0.4) if
    difficult boxes were dropped from the gt set entirely."""
    gt = {0: np.array([[0.0, 0.0, 10.0, 10.0],
                       [20.0, 20.0, 30.0, 30.0]])}
    diff = {0: np.array([False, True])}
    preds = np.array([
        [0, 0.95, 20.0, 20.0, 30.0, 30.0],   # on difficult -> ignored
        [0, 0.90, 20.5, 20.0, 30.0, 30.0],   # on difficult -> ignored
        [0, 0.80, 0.0, 0.0, 10.0, 10.0],     # on normal    -> TP
    ])
    ap = evaluate_detections(preds, gt, 0.5, "iou", False,
                             gt_difficult=diff)
    assert ap == 1.0
    # sanity: without flags the duplicate on gt1 is an FP mid-ranking
    ap_plain = evaluate_detections(preds, gt, 0.5, "iou", False)
    assert abs(ap_plain - (0.5 + 0.5 * 2 / 3)) < 1e-9

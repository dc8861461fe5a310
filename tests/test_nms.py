import jax.numpy as jnp
import numpy as np

from gssd_tpu.config import DetectConfig
from gssd_tpu.ops import boxes as B
from gssd_tpu.ops.nms import detect, nms


def numpy_greedy_nms(boxes, scores, overlap, conf_thresh):
    """Independent O(n^2) greedy NMS for cross-checking."""
    idx = [i for i in np.argsort(-scores) if scores[i] > conf_thresh]
    kept = []
    for i in idx:
        ok = True
        for j in kept:
            xi1 = max(boxes[i, 0], boxes[j, 0]); yi1 = max(boxes[i, 1], boxes[j, 1])
            xi2 = min(boxes[i, 2], boxes[j, 2]); yi2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xi2 - xi1) * max(0.0, yi2 - yi1)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (ai + aj - inter) > overlap:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


def test_nms_simple():
    boxes = jnp.array([
        [0.1, 0.1, 0.5, 0.5],
        [0.12, 0.12, 0.52, 0.52],  # heavy overlap with 0
        [0.6, 0.6, 0.9, 0.9],
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    s, b, count = nms(boxes, scores, overlap=0.45, top_k=8)
    assert int(count) == 2
    np.testing.assert_allclose(np.asarray(s[:2]), [0.9, 0.7], atol=1e-6)
    np.testing.assert_allclose(np.asarray(b[0]), [0.1, 0.1, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s[2:]), 0.0)


def test_nms_survivor_only_suppresses():
    # box1 suppressed by box0; box2 overlaps box1 but not box0 -> kept
    boxes = jnp.array([
        [0.0, 0.0, 0.4, 1.0],
        [0.2, 0.0, 0.6, 1.0],
        [0.45, 0.0, 0.85, 1.0],
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    _, _, count = nms(boxes, scores, overlap=0.3, top_k=8)
    assert int(count) == 2


def test_nms_matches_numpy_reference(rng):
    for _ in range(10):
        n = 60
        xy = rng.uniform(0, 0.8, (n, 2))
        wh = rng.uniform(0.05, 0.4, (n, 2))
        boxes = np.concatenate([xy, np.clip(xy + wh, 0, 1)], 1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        want = numpy_greedy_nms(boxes, scores, 0.45, 0.01)
        s, b, count = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 200, 0.01)
        assert int(count) == len(want)
        np.testing.assert_allclose(
            np.asarray(s[: len(want)]), scores[want], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(b[: len(want)]), boxes[want], atol=1e-6
        )


def test_conf_thresh_filters():
    boxes = jnp.array([[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]])
    scores = jnp.array([0.9, 0.005])
    _, _, count = nms(boxes, scores, 0.45, 8, conf_thresh=0.01)
    assert int(count) == 1


def test_detect_shapes_and_content(rng):
    cfg = DetectConfig(top_k=50)
    P = 100
    priors = rng.uniform(0.2, 0.8, (P, 4)).astype(np.float32)
    priors[:, 2:] = rng.uniform(0.05, 0.2, (P, 2))
    loc = rng.normal(0, 0.1, (2, P, 4)).astype(np.float32)
    logits = rng.normal(0, 1, (2, P, 2)).astype(np.float32)
    conf = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    out = detect(jnp.asarray(loc), jnp.asarray(conf), jnp.asarray(priors), cfg)
    assert out.shape == (2, 2, 50, 5)
    out = np.asarray(out)
    # background class row is all zeros
    np.testing.assert_allclose(out[:, 0], 0.0)
    # scores sorted descending within kept block
    for i in range(2):
        s = out[i, 1, :, 0]
        kept = s[s > 0]
        assert (np.diff(kept) <= 1e-7).all()
    # top-1 box equals decode of the highest-scoring prior above thresh
    dec = np.asarray(B.decode(jnp.asarray(loc[0]), jnp.asarray(priors)))
    best = int(np.argmax(conf[0, :, 1]))
    np.testing.assert_allclose(out[0, 1, 0, 1:], dec[best], atol=1e-5)

"""Static-shape NMS and the Detect (decode + NMS) inference head.

The reference runs a data-dependent, early-exit host loop per image per
class (box_utils.py:174-238, detection_pytorch_ver_1point5.py:53-89).
On TPU everything must be static-shape, so the same kept-set is computed
as:

1. mask scores <= conf_thresh, take the top_k candidates with lax.top_k
   (the reference also caps NMS at the top_k highest scores,
   box_utils.py:201),
2. one [K, K] IoU matrix (VPU-friendly, K=200),
3. a lax.fori_loop greedy sweep over score rank: a candidate survives iff
   no higher-ranked survivor overlaps it by more than ``overlap``
   (reference keeps IoU <= overlap, box_utils.py:237),
4. survivors compacted to the front, packed as [K, 5] rows of
   (score, x1, y1, x2, y2) — zeros past the kept count, exactly the
   reference's output packing (detection...py:56, 85-88).

The greedy sweep is equivalent to the reference's iterative suppression:
a box removed by an earlier pick can never suppress others, and the
fori_loop enforces that by only letting survivors suppress.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from gssd_tpu.config import DetectConfig
from gssd_tpu.ops import boxes as B


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    overlap: float = 0.45,
    top_k: int = 200,
    conf_thresh: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over one image's single-class candidates.

    Args:
      boxes: [P, 4] point-form boxes.
      scores: [P] scores.
      overlap: suppression IoU threshold (suppress if IoU > overlap).
      top_k: static number of candidates/outputs.
      conf_thresh: candidates must score strictly above this.

    Returns:
      (kept_scores [K], kept_boxes [K, 4], count) — compacted to the
      front in descending-score order; zeros after ``count``.
    """
    P = scores.shape[0]
    if P < top_k:  # pad candidate list so lax.top_k's k <= n
        boxes = jnp.concatenate([boxes, jnp.zeros((top_k - P, 4), boxes.dtype)])
        scores = jnp.concatenate(
            [scores, jnp.full((top_k - P,), -jnp.inf, scores.dtype)]
        )
    valid = scores > conf_thresh
    masked = jnp.where(valid, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, top_k)  # descending
    top_boxes = boxes[top_idx]  # [K, 4]
    top_valid = top_scores > conf_thresh

    ious = B.iou(top_boxes, top_boxes)  # [K, K]

    def body(i, alive):
        # if candidate i is still alive, kill lower-ranked overlaps
        suppress = (ious[i] > overlap) & alive[i]
        keep_self = jnp.arange(top_k) == i
        return alive & (~suppress | keep_self)

    alive = jax.lax.fori_loop(0, top_k, body, top_valid)
    kept = alive & top_valid

    # compact kept entries to the front, preserving score order
    key = jnp.where(kept, jnp.arange(top_k), top_k + jnp.arange(top_k))
    perm = jnp.argsort(key)
    kept_sorted = kept[perm]
    out_scores = jnp.where(kept_sorted, top_scores[perm], 0.0)
    out_boxes = jnp.where(kept_sorted[:, None], top_boxes[perm], 0.0)
    count = jnp.sum(kept).astype(jnp.int32)
    return out_scores, out_boxes, count


def _detect_one(
    loc: jnp.ndarray,
    conf: jnp.ndarray,
    priors: jnp.ndarray,
    cfg: DetectConfig,
) -> jnp.ndarray:
    """One image: [P, 4] loc, [P, C] softmax scores -> [C, K, 5]."""
    decoded = B.decode(loc, priors, cfg.variance)  # [P, 4]
    per_class = [jnp.zeros((cfg.top_k, 5), jnp.float32)]  # background row
    for cl in range(1, cfg.num_classes):
        s, b, _ = nms(
            decoded,
            conf[:, cl],
            overlap=cfg.nms_thresh,
            top_k=cfg.top_k,
            conf_thresh=cfg.conf_thresh,
        )
        per_class.append(jnp.concatenate([s[:, None], b], axis=1))
    return jnp.stack(per_class, axis=0)  # [C, K, 5]


@partial(jax.jit, static_argnames=("cfg",))
def detect(
    loc: jnp.ndarray,
    conf: jnp.ndarray,
    priors: jnp.ndarray,
    cfg: DetectConfig = DetectConfig(),
) -> jnp.ndarray:
    """Batched Detect head: ([B, P, 4], [B, P, C], [P, 4]) -> [B, C, K, 5].

    ``conf`` must already be softmaxed (the reference softmaxes before
    Detect, ssd_multiphase_custom_group.py:384-390).
    """
    f = jax.vmap(lambda l, c: _detect_one(l, c, priors, cfg))
    return f(loc.astype(jnp.float32), conf.astype(jnp.float32))

"""Pure-JAX box math.

Semantics follow the reference box utilities
(ssd_liverdet/layers/box_utils.py: point_form:4, center_size:16,
intersect:28, jaccard:49, encode:114, decode:139) but are written as
batched, static-shape jnp programs: everything here vmaps/jits cleanly
and runs on the VPU with no host round trips.

Box conventions:
- "point form": (xmin, ymin, xmax, ymax), normalized to [0, 1].
- "center form": (cx, cy, w, h).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def point_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """Center form -> point form. boxes: [..., 4]."""
    cxy, wh = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)


def center_size(boxes: jnp.ndarray) -> jnp.ndarray:
    """Point form -> center form. boxes: [..., 4]."""
    mins, maxs = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([(maxs + mins) / 2, maxs - mins], axis=-1)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of point-form boxes. [..., 4] -> [...]."""
    wh = boxes[..., 2:] - boxes[..., :2]
    return wh[..., 0] * wh[..., 1]


def intersect(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection area of point-form boxes.

    box_a: [..., A, 4], box_b: [..., B, 4] -> [..., A, B].
    """
    max_xy = jnp.minimum(box_a[..., :, None, 2:], box_b[..., None, :, 2:])
    min_xy = jnp.maximum(box_a[..., :, None, :2], box_b[..., None, :, :2])
    wh = jnp.clip(max_xy - min_xy, 0.0)
    return wh[..., 0] * wh[..., 1]


def iou(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU (jaccard). [..., A, 4] x [..., B, 4] -> [..., A, B]."""
    inter = intersect(box_a, box_b)
    union = area(box_a)[..., :, None] + area(box_b)[..., None, :] - inter
    return inter / union


def iobb(box_gt: jnp.ndarray, box_pred: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection-over-predicted-bounding-box.

    The reference's second eval metric: intersection divided by the
    *predicted* box area (test_ap_iobb.py:273-278). [..., A, 4] (gt) x
    [..., B, 4] (pred) -> [..., A, B].
    """
    inter = intersect(box_gt, box_pred)
    return inter / area(box_pred)[..., None, :]


def encode(
    matched: jnp.ndarray,
    priors: jnp.ndarray,
    variances: Sequence[float] = (0.1, 0.2),
) -> jnp.ndarray:
    """Encode matched gt boxes (point form) against priors (center form).

    matched: [..., N, 4] point form; priors: [N, 4] or [..., N, 4]
    center form. Returns [..., N, 4] regression targets.
    """
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2 - priors[..., :2]
    g_cxcy = g_cxcy / (variances[0] * priors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    g_wh = jnp.log(g_wh) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode(
    loc: jnp.ndarray,
    priors: jnp.ndarray,
    variances: Sequence[float] = (0.1, 0.2),
) -> jnp.ndarray:
    """Decode loc regression back to point-form boxes. Inverse of encode."""
    cxy = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    return jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)

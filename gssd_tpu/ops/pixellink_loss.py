"""PixelLink loss — instance-balanced pixel CE + per-neighbor link CE.

Reference: pixel_link/criterion.py. Semantics preserved:
- pixel loss (criterion.py:23-64): per-pixel 2-way CE; positives
  weighted by the precomputed instance-balanced map; hard negatives are
  the ``neg_pos_ratio * pos_area`` background pixels with the *lowest*
  background softmax probability (topk of the wrong softmax), selected
  only among ``neg_pixel_mask`` pixels; pos and neg terms are each
  summed and divided by (pos_area + neg_area), then averaged over the
  batch. If an image has no positives the negative budget falls back to
  min(10000, #neg) (criterion.py:40-42).
- link loss (criterion.py:66-105): 8 independent 2-way CEs over logit
  pairs [2j, 2j+1]; positive/negative link weights come from the pixel
  pos-weight map masked by the link target / its complement, each
  normalized by its own weight sum per image.

Static-shape notes: the per-image topk negative selection becomes a
rank-vs-budget comparison (double argsort) so the whole loss jits.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _pixel_ce(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """2-way cross entropy. logits [..., 2], target [...] int."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(
        logits, target[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    return lse - true_logit


def pixel_loss(
    logits: jnp.ndarray,
    pixel_mask: jnp.ndarray,
    neg_pixel_mask: jnp.ndarray,
    pos_weight: jnp.ndarray,
    neg_pos_ratio: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """logits: [B, H, W, 2] (index 0 = background); masks [B, H, W]."""
    B = logits.shape[0]
    logits = logits.astype(jnp.float32)
    ce = _pixel_ce(logits, pixel_mask)  # [B, H, W]
    p_bg = jax.nn.softmax(logits, axis=-1)[..., 0]

    area = jnp.sum(pixel_mask.reshape(B, -1), axis=1)  # [B]
    neg_avail = jnp.sum(neg_pixel_mask.reshape(B, -1), axis=1)
    budget = jnp.where(area == 0, 10000, area * neg_pos_ratio)
    neg_area = jnp.minimum(budget, neg_avail)

    # rank negatives by ascending background prob ("most wrong" first)
    score = jnp.where(neg_pixel_mask.reshape(B, -1) == 1,
                      p_bg.reshape(B, -1), jnp.inf)
    order = jnp.argsort(score, axis=1)
    rank = jnp.argsort(order, axis=1)
    neg_sel = (rank < neg_area[:, None]).reshape(pixel_mask.shape)
    neg_sel = neg_sel & (neg_pixel_mask == 1)

    pos_term = jnp.sum((pos_weight * ce).reshape(B, -1), axis=1)
    neg_term = jnp.sum((neg_sel * ce).reshape(B, -1), axis=1)
    denom = jnp.maximum(area + neg_area, 1).astype(jnp.float32)
    return jnp.mean(pos_term / denom), jnp.mean(neg_term / denom)


def link_loss(
    logits: jnp.ndarray,
    link_mask: jnp.ndarray,
    pos_weight: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """logits: [B, H, W, 16] (pairs per neighbor); link_mask
    [B, 8, H, W]; pos_weight [B, H, W] (the pixel pos-weight map)."""
    B, H, W, _ = logits.shape
    logits = logits.astype(jnp.float32).reshape(B, H, W, 8, 2)
    target = jnp.transpose(link_mask, (0, 2, 3, 1))  # [B, H, W, 8]
    ce = _pixel_ce(logits, target)  # [B, H, W, 8]

    w = pos_weight[..., None]  # [B, H, W, 1]
    pos_w = jnp.where(target == 1, w, 0.0)
    neg_w = jnp.where(target == 0, w, 0.0)
    sum_pos = jnp.sum(pos_w.reshape(B, -1), axis=1)
    sum_neg = jnp.sum(neg_w.reshape(B, -1), axis=1)
    pos = jnp.sum((pos_w * ce).reshape(B, -1), axis=1)
    neg = jnp.sum((neg_w * ce).reshape(B, -1), axis=1)
    pos = jnp.where(sum_pos > 0, pos / jnp.maximum(sum_pos, 1e-12), 0.0)
    neg = jnp.where(sum_neg > 0, neg / jnp.maximum(sum_neg, 1e-12), 0.0)
    return jnp.mean(pos), jnp.mean(neg)


def pixellink_loss(
    pixel_logits: jnp.ndarray,
    link_logits: jnp.ndarray,
    targets: Dict[str, jnp.ndarray],
    pixel_weight: float = 2.0,
    link_weight: float = 1.0,
    neg_pos_ratio: int = 3,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined loss (trainer composition, pixellink trainer :230-236)."""
    pp, pn = pixel_loss(
        pixel_logits, targets["pixel_mask"], targets["neg_pixel_mask"],
        targets["pixel_pos_weight"], neg_pos_ratio,
    )
    lp, ln = link_loss(link_logits, targets["link_mask"],
                       targets["pixel_pos_weight"])
    p = pp + pn
    l = lp + ln
    total = pixel_weight * p + link_weight * l
    return total, {"pixel_loss": p, "link_loss": l}

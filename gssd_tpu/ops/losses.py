"""MultiBox loss with online hard negative mining — fully on device.

Reference semantics: ssd_liverdet/layers/modules/multibox_loss.py:46-120.
The reference builds targets with a per-sample host loop and a CPU->GPU
copy each step (multibox_loss.py:67-74); here matching, OHNM and both
loss terms are one static-shape jnp program that jit-fuses into the
training step.

OHNM uses the same double-argsort rank trick as the reference
(multibox_loss.py:102-106): negatives are ranked by their confidence
loss and the top ``neg_pos_ratio * num_pos`` (clamped to P-1) per image
are kept.
Both terms are summed then normalized by N = total positives in the
batch (multibox_loss.py:117-119).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from gssd_tpu.config import LossConfig
from gssd_tpu.ops.matcher import match_batch


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (huber with delta=1), matching F.smooth_l1_loss."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def multibox_loss(
    loc_pred: jnp.ndarray,
    conf_pred: jnp.ndarray,
    priors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: LossConfig = LossConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute (loc_loss, conf_loss) for a batch.

    Args:
      loc_pred: [B, P, 4] loc regression predictions.
      conf_pred: [B, P, C] class logits.
      priors: [P, 4] center-form anchors.
      gt_boxes: [B, G, 4] padded point-form gt boxes.
      gt_labels: [B, G] int labels (0 = first fg class).
      gt_valid: [B, G] bool validity mask.

    Returns:
      (loss_l, loss_c, aux) — scalars, both normalized by total positives.
    """
    Bsz, P, C = conf_pred.shape
    loc_t, conf_t = match_batch(
        gt_boxes, gt_labels, gt_valid, priors, cfg.overlap_thresh, cfg.variance
    )  # [B, P, 4], [B, P]

    pos = conf_t > 0  # [B, P]
    num_pos = jnp.sum(pos, axis=1)  # [B]
    n_total = jnp.sum(num_pos)

    # ---- localization: smooth-L1 summed over positive priors
    l1 = jnp.sum(smooth_l1(loc_pred.astype(jnp.float32) - loc_t), axis=-1)
    loss_l = jnp.sum(l1 * pos)

    # ---- hard negative mining on per-prior CE loss
    conf32 = conf_pred.astype(jnp.float32)
    lse = jax.nn.logsumexp(conf32, axis=-1)  # [B, P]
    # one-hot contraction instead of take_along_axis: its VJP is a
    # multiply, not a scatter (TPU scatters dominate this loss's cost)
    onehot = jax.nn.one_hot(conf_t, C, dtype=jnp.float32)
    true_logit = jnp.sum(conf32 * onehot, axis=-1)
    ce = lse - true_logit  # [B, P]

    mining = jnp.where(pos, 0.0, ce)
    order = jnp.argsort(-mining, axis=1)
    rank = jnp.argsort(order, axis=1)  # idx_rank
    num_neg = jnp.clip(cfg.neg_pos_ratio * num_pos, max=P - 1)  # [B]
    neg = rank < num_neg[:, None]

    loss_c = jnp.sum(ce * (pos | neg))

    n = jnp.maximum(n_total, 1).astype(jnp.float32)
    aux = {"num_pos": n_total, "num_neg": jnp.sum(neg)}
    return loss_l / n, loss_c / n, aux

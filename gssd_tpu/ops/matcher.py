"""On-device, batched anchor matching.

The reference matches each batch element in a Python loop on the host
(multibox_loss.py:67-72 calling box_utils.match:70-111). Here the same
bipartite-matching semantics are a static-shape jnp program vmappable
over the batch and jit-fusable into the loss:

1. overlaps = IoU(gt, priors)                          [G, P]
2. per-gt best prior, per-prior best gt (argmax each way)
3. force each gt's best prior to that gt (overlap := 2), later gts
   winning conflicts like the reference's sequential overwrite loop
   (box_utils.py:102-105)
4. priors with best overlap < threshold -> background (label 0)

Variable-length gt lists are padded to ``max_gt`` with a validity mask
(SURVEY.md §7.2.7); padded rows can never match or force.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from gssd_tpu.ops import boxes as B


def match(
    truths: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    priors: jnp.ndarray,
    threshold: float = 0.5,
    variances: Sequence[float] = (0.1, 0.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match one image's gt boxes to priors.

    Args:
      truths: [G, 4] point-form gt boxes (padded).
      labels: [G] int class labels (0 = first foreground class).
      valid: [G] bool mask of real (non-padding) gt rows.
      priors: [P, 4] center-form anchors.
      threshold: positive-match IoU threshold.
      variances: encoding variances.

    Returns:
      loc_t: [P, 4] encoded regression targets.
      conf_t: [P] int32 class targets (0 = background).
    """
    G = truths.shape[0]
    P = priors.shape[0]
    overlaps = B.iou(truths, B.point_form(priors))  # [G, P]
    # padded gts never win an argmax
    overlaps = jnp.where(valid[:, None], overlaps, -1.0)

    best_prior_idx = jnp.argmax(overlaps, axis=1)  # [G]
    best_truth_overlap = jnp.max(overlaps, axis=0)  # [P]
    best_truth_idx = jnp.argmax(overlaps, axis=0)  # [P]

    # Force each valid gt's best prior to match that gt. On conflicts the
    # reference's loop overwrites sequentially, so the *last* valid gt wins.
    force = (
        jnp.arange(P)[None, :] == best_prior_idx[:, None]
    ) & valid[:, None]  # [G, P]
    forced_any = jnp.any(force, axis=0)  # [P]
    # last valid j claiming this prior
    forced_j = (G - 1) - jnp.argmax(force[::-1], axis=0)  # [P]
    best_truth_idx = jnp.where(forced_any, forced_j, best_truth_idx)
    best_truth_overlap = jnp.where(forced_any, 2.0, best_truth_overlap)

    # Gather-free row selection: TPU scalarizes the [P]-indexed gathers
    # (xplane: ~2 ms/step at b32 across the batch), while the one-hot
    # contraction is a trivial [P, G] x [G, .] MXU dot (G = max_gt is
    # tiny). Exact for int labels (values << 2^24).
    onehot = jax.nn.one_hot(best_truth_idx, G, dtype=jnp.float32)
    matched = onehot @ truths  # [P, 4]
    conf_t = (onehot @ labels.astype(jnp.float32)).astype(jnp.int32) + 1
    conf_t = jnp.where(best_truth_overlap < threshold, 0, conf_t)

    # Keep encode finite for background priors (padded gt rows are zeros,
    # whose log(wh) would be -inf and poison the masked loss with NaNs).
    safe = B.point_form(priors)
    matched = jnp.where((conf_t > 0)[:, None], matched, safe)
    loc_t = B.encode(matched, priors, variances)
    return loc_t, conf_t


# Batched version: [B?, G, 4] x [B?, G] x [B?, G] x [P, 4] -> ([B, P, 4], [B, P])
match_batch = jax.vmap(match, in_axes=(0, 0, 0, None, None, None))

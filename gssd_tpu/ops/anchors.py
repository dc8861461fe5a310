"""Anchor (prior box) generation.

Produces the same anchor tables as the reference PriorBox
(ssd_liverdet/layers/functions/prior_box.py:32-172) for every config
variant, but vectorized with numpy at build time — the result is a
constant [num_priors, 4] center-form array baked into the compiled
program (the reference computes it once at model construction too,
ssd_multiphase_custom_group.py:48-49).

Per-cell box order (reference v2 branch, prior_box.py:35-56):
  [min_size square, sqrt(min*max) square,
   then for each aspect ratio ar: (s*sqrt(ar), s/sqrt(ar)), (s/sqrt(ar), s*sqrt(ar))]
The 'v2_custom' variants replace the rectangular pair with squares of
sizes s*sqrt(ar) and s/sqrt(ar) (prior_box.py:58-85).
Cells iterate row-major over (i, j) = (y, x) with centers ((j+.5)/f_k,
(i+.5)/f_k) where f_k = image_size / step.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Union

import numpy as np

from gssd_tpu.config import ANCHOR_CONFIGS, AnchorConfig


def _cell_boxes(cfg: AnchorConfig, k: int) -> np.ndarray:
    """The (w, h) menu for one cell of scale k: [n_box, 2]."""
    if cfg.name == "v1":
        # legacy branch (prior_box.py:141-167): no sqrt box when
        # max_size <= 0, rectangles only for ar != 1
        s = cfg.min_sizes[k] / cfg.min_dim
        wh = [(s, s)]
        if cfg.max_sizes[k] > 0:
            sp = math.sqrt(cfg.min_sizes[k] * cfg.max_sizes[k]) / cfg.min_dim
            wh.append((sp, sp))
        for ar in cfg.aspect_ratios[k]:
            if abs(ar - 1) >= 1e-6:
                r = math.sqrt(ar)
                wh.append((s * r, s / r))
        return np.asarray(wh, dtype=np.float64)
    s_k = cfg.min_sizes[k] / cfg.min_dim
    s_k_prime = math.sqrt(s_k * (cfg.max_sizes[k] / cfg.min_dim))
    wh = [(s_k, s_k), (s_k_prime, s_k_prime)]
    square_only = cfg.name.startswith("v2_custom")
    for ar in cfg.aspect_ratios[k]:
        r = math.sqrt(ar)
        if square_only:
            wh += [(s_k * r, s_k * r), (s_k / r, s_k / r)]
        else:
            wh += [(s_k * r, s_k / r), (s_k / r, s_k * r)]
    return np.asarray(wh, dtype=np.float64)


@lru_cache(maxsize=None)
def make_anchors(cfg: Union[str, AnchorConfig] = "v2") -> np.ndarray:
    """Build the full center-form anchor table [num_priors, 4] float32."""
    if isinstance(cfg, str):
        cfg = ANCHOR_CONFIGS[cfg]
    scales = []
    for k, f in enumerate(cfg.feature_maps):
        # legacy v1 centers use the feature-map size itself as the
        # divisor (prior_box.py:142 step = image_size / k)
        f_k = float(f) if cfg.name == "v1" else cfg.min_dim / cfg.steps[k]
        ij = np.arange(f, dtype=np.float64)
        # row-major (i, j) product: cy varies slowest
        cy, cx = np.meshgrid(ij, ij, indexing="ij")
        centers = np.stack([(cx + 0.5) / f_k, (cy + 0.5) / f_k], axis=-1)
        centers = centers.reshape(-1, 1, 2)  # [f*f, 1, 2]
        wh = _cell_boxes(cfg, k)[None]  # [1, n_box, 2]
        boxes = np.concatenate(
            [np.broadcast_to(centers, (f * f, wh.shape[1], 2)),
             np.broadcast_to(wh, (f * f, wh.shape[1], 2))],
            axis=-1,
        )
        scales.append(boxes.reshape(-1, 4))
    out = np.concatenate(scales, axis=0)
    if cfg.clip:
        out = np.clip(out, 0.0, 1.0)
    return np.ascontiguousarray(out, dtype=np.float32)

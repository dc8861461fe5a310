"""Eval-path base transform.

Reference: data/__init__.py:10-66 — resize each phase to
(size, size), subtract mean, optional portal-only phase repeat,
optional min-max normalize to [0, 1]. 4D-aware: operates on
[phase, H, W, 3] float 0..255 arrays.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

PORTAL_PHASE = 2  # phase order A/D/P/Pre; portal = index 2


def resize_phases(img: np.ndarray, size: int) -> np.ndarray:
    """[P, H, W, C] -> [P, size, size, C] per-phase bilinear resize."""
    p, h, w, c = img.shape
    if h == size and w == size:
        return img.astype(np.float32)
    out = np.empty((p, size, size, c), np.float32)
    for i in range(p):
        out[i] = cv2.resize(
            img[i], (size, size), interpolation=cv2.INTER_LINEAR
        )
    return out


class BaseTransform:
    def __init__(
        self,
        size: int = 300,
        mean: float = 0.0,
        p_only: bool = False,
        use_normalize: bool = True,
    ):
        self.size = size
        self.mean = mean
        self.p_only = p_only
        self.use_normalize = use_normalize

    def __call__(
        self,
        img: np.ndarray,
        boxes: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
    ):
        x = resize_phases(img.astype(np.float32), self.size)
        x -= self.mean
        if self.p_only:
            x = np.repeat(x[PORTAL_PHASE:PORTAL_PHASE + 1], img.shape[0], 0)
        if self.use_normalize:
            lo, hi = x.min(), x.max()
            assert hi != lo, "all-constant image cannot be normalized"
            x = (x - lo) / (hi - lo)
        return x, boxes, labels

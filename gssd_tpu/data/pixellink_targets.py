"""PixelLink target generation (host-side, cv2).

Reference semantics (pixel_link/pixellink_data.py:15-99):
- rasterize each gt box at 1/factor resolution (factor 2 for '2s',
  4 for '4s');
- pixels covered by more than one instance are removed from the
  positive mask (and from every instance);
- ``neg_pixel_mask`` marks pixels covered by no instance;
- per-instance area-balanced positive weights: each surviving instance
  contributes total weight (total_pos_area / num_instances) spread
  uniformly over its pixels;
- link targets: for each of 8 neighbor directions (clockwise from
  bottom-right in the reference's shift table), a positive pixel links
  to a neighbor iff that neighbor (clipped at borders) belongs to the
  same instance.

Neighbor order matches the reference shift table
(pixellink_data.py:84-92): j=0:(+1,+1) 1:(+1,0) 2:(+1,-1) 3:(0,-1)
4:(-1,-1) 5:(-1,0) 6:(-1,+1) 7:(0,+1) in (dy, dx).
"""

from __future__ import annotations

from typing import Dict

import cv2
import numpy as np

NEIGHBOR_SHIFTS = [
    (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1), (0, 1)
]


def make_pixel_link_targets(
    boxes_norm: np.ndarray, size: int, version: str = "4s"
) -> Dict[str, np.ndarray]:
    """boxes_norm: [n, 4] normalized point-form boxes; size: model input
    size (300). Returns masks at size//factor resolution."""
    factor = 2 if version == "2s" else 4
    hw = size // factor
    pixel_mask = np.zeros((hw, hw), np.uint8)
    pixel_weight = np.zeros((hw, hw), np.float32)
    link_mask = np.zeros((8, hw, hw), np.uint8)

    # truncation matches the reference's long cast then /factor int cast
    # (augmentations.py:536, pixellink_data.py:37)
    px = (boxes_norm * size).astype(np.int64) // factor
    instance_masks = []
    cover = np.zeros((hw, hw), np.int32)
    for b in px:
        m = np.zeros((hw, hw), np.uint8)
        pts = np.array(
            [[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]],
            np.int32,
        )
        cv2.fillPoly(m, [pts], 1)
        instance_masks.append(m)
        cover += m
    neg_pixel_mask = (cover == 0).astype(np.uint8)
    pixel_mask = (cover == 1).astype(np.uint8)  # overlaps removed

    survivors = [m * pixel_mask for m in instance_masks]
    areas = [int(m.sum()) for m in survivors]
    real = [i for i, a in enumerate(areas) if a > 0]
    if not real:
        return {
            "pixel_mask": pixel_mask.astype(np.int32),
            "neg_pixel_mask": neg_pixel_mask,
            "pixel_pos_weight": pixel_weight,
            "link_mask": link_mask.astype(np.int32),
        }
    total_area = int(pixel_mask.sum())
    avg_per_box = total_area / len(real)

    for i in real:
        m = survivors[i]
        w = avg_per_box / areas[i]
        pixel_weight += m.astype(np.float32) * w
        ys, xs = np.nonzero(m)
        for j, (dy, dx) in enumerate(NEIGHBOR_SHIFTS):
            ny = np.clip(ys + dy, 0, hw - 1)
            nx = np.clip(xs + dx, 0, hw - 1)
            # link is positive where the pixel and its shifted neighbor
            # both belong to this instance
            shifted = np.zeros_like(m)
            shifted[ny, nx] = 1
            link_mask[j] |= (m & shifted).astype(np.uint8)

    return {
        "pixel_mask": pixel_mask.astype(np.int32),
        "neg_pixel_mask": neg_pixel_mask,
        "pixel_pos_weight": pixel_weight,
        "link_mask": link_mask.astype(np.int32),
    }

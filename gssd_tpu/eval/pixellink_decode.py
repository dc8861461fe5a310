"""PixelLink decode: masks -> boxes (host-side).

Reference: pixel_link/postprocess.py mask_to_box (:82-170) + the
union-find component grouping func (:184-233):

1. pixel fg softmax > pixel_conf_threshold (0.2); per-neighbor link fg
   softmax > link_conf_threshold (0.8), gated by the pixel mask;
2. union-find over positive pixels: join p with neighbor j when
   link_j(p) is on and the neighbor is positive (neighbor offsets are
   the decoder-side convention matching the training shift table);
3. upscale the label map to image size (NEAREST) and the score map
   (LINEAR); per component: min-area rect, filter by min side and area,
   clip corner points to the image, take the axis-aligned extent, score
   = mean upscaled fg probability over the component.

The union-find core runs in the C++ native library when available
(gssd_tpu/native/pixellink_cc.cpp) with an identical numpy fallback.
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import cv2
import numpy as np

from gssd_tpu.config import PixelLinkConfig
from gssd_tpu.native import load_native

# decoder neighbor offsets (dy, dx) for j = 0..7; the incoming-link
# convention consistent with data/pixellink_targets.NEIGHBOR_SHIFTS
DECODE_NEIGHBORS = [
    (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)
]


def _components_numpy(pixel: np.ndarray, link: np.ndarray) -> np.ndarray:
    """Union-find labeling; pixel [H, W] uint8, link [8, H, W] uint8."""
    h, w = pixel.shape
    parent = np.arange(h * w, dtype=np.int64)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    ys, xs = np.nonzero(pixel)
    for y, x in zip(ys, xs):
        p = y * w + x
        for j, (dy, dx) in enumerate(DECODE_NEIGHBORS):
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and pixel[ny, nx] and link[j, y, x]:
                ra, rb = find(p), find(ny * w + nx)
                if ra != rb:
                    parent[rb] = ra
    labels = np.zeros((h, w), np.int32)
    id_of = {}
    for y, x in zip(ys, xs):
        root = find(y * w + x)
        if root not in id_of:
            id_of[root] = len(id_of) + 1
        labels[y, x] = id_of[root]
    return labels


def link_components(pixel: np.ndarray, link: np.ndarray) -> np.ndarray:
    lib = load_native()
    pixel = np.ascontiguousarray(pixel, np.uint8)
    link = np.ascontiguousarray(link, np.uint8)
    if lib is None:
        return _components_numpy(pixel, link)
    h, w = pixel.shape
    out = np.zeros((h, w), np.int32)
    lib.pixellink_components(
        pixel.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        link.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def mask_to_boxes(
    pixel_logits: np.ndarray,
    link_logits: np.ndarray,
    img_size: int = 300,
    cfg: PixelLinkConfig = PixelLinkConfig(),
    pixel_thres: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """One image: pixel_logits [H, W, 2], link_logits [H, W, 16] ->
    (scores [n], boxes [n, 4] pixel coords in img_size space)."""
    p = pixel_logits - pixel_logits.max(-1, keepdims=True)
    e = np.exp(p)
    prob = e / e.sum(-1, keepdims=True)
    score_map = prob[..., 1]
    thresh = cfg.pixel_conf_threshold if pixel_thres is None else pixel_thres
    pixel_mask = (score_map > thresh).astype(np.uint8)

    H, W = pixel_mask.shape
    link = np.zeros((8, H, W), np.uint8)
    for j in range(8):
        pair = link_logits[..., 2 * j:2 * j + 2]
        pair = pair - pair.max(-1, keepdims=True)
        ep = np.exp(pair)
        fg = ep[..., 1] / ep.sum(-1)
        link[j] = ((fg > cfg.link_conf_threshold) & (pixel_mask == 1))

    labels = link_components(pixel_mask, link)
    labels_up = cv2.resize(labels.astype(np.float32), (img_size, img_size),
                           interpolation=cv2.INTER_NEAREST).astype(np.int32)
    score_up = cv2.resize(score_map.astype(np.float32),
                          (img_size, img_size),
                          interpolation=cv2.INTER_LINEAR)

    boxes: List[List[float]] = []
    scores: List[float] = []
    for comp in range(1, labels_up.max() + 1):
        mask = (labels_up == comp).astype(np.uint8)
        if not mask.any():
            continue
        contours, _ = cv2.findContours(
            mask, mode=cv2.RETR_CCOMP, method=cv2.CHAIN_APPROX_SIMPLE
        )
        if not contours:
            continue
        (cx, cy), (w, h), theta = cv2.minAreaRect(contours[0])
        if min(w, h) < cfg.min_height:
            continue
        if w * h < cfg.min_area:
            continue
        pts = cv2.boxPoints(((cx, cy), (w, h), theta)).astype(np.int64)
        pts[:, 0] = np.clip(pts[:, 0], 0, img_size - 1)
        pts[:, 1] = np.clip(pts[:, 1], 0, img_size - 1)
        boxes.append([
            float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()),
        ])
        ys, xs = np.nonzero(mask)
        scores.append(float(score_up[ys, xs].mean()))
    if not boxes:
        return np.zeros((0,)), np.zeros((0, 4))
    return np.asarray(scores), np.asarray(boxes)

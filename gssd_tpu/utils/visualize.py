"""Visualization dumps for model introspection.

Reference behaviors being matched:
- --visualize eval dumps: per-image npy arrays of the input, gt
  annotation, DCN offsets and attention maps, plus a detection-overlay
  jpg (test_ap_iobb.py:156-179).
- DCN offset rendering: map each output pixel's 9 sampling positions
  (grid + learned offset) back to image coordinates and draw them over
  the portal phase (utils/show_offset.py:14-50,100+, consumed via
  SSD.visualize_offset, group model :194-215).
- Input-grid logging with drawn gt boxes (train v2.py:294-298,
  get_input_visual :444-464) via MetricsLogger.log_image.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np


def draw_boxes(
    image: np.ndarray,
    boxes: np.ndarray,
    color=(0, 255, 0),
    scores: Optional[np.ndarray] = None,
) -> np.ndarray:
    """image: [H, W] or [H, W, 3] float 0..1; boxes [n, 4] pixel coords."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    img = np.ascontiguousarray((img * 255).clip(0, 255).astype(np.uint8))
    for i, b in enumerate(np.asarray(boxes).astype(int)):
        cv2.rectangle(img, (b[0], b[1]), (b[2], b[3]), color, 2)
        if scores is not None:
            cv2.putText(img, f"{scores[i]:.2f}", (b[0], max(b[1] - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1)
    return img


def offsets_to_image_coords(
    offsets: np.ndarray,
    image_size: int,
    stride: Optional[float] = None,
    padding: int = 1,
    dilation: int = 1,
) -> np.ndarray:
    """DCN offsets [Ho, Wo, G, K, 2] (dy, dx) -> absolute sampling
    positions in image pixels [Ho, Wo, G, K, 2] (y, x)."""
    Ho, Wo, G, K, _ = offsets.shape
    kh = kw = int(round(K ** 0.5))
    stride = stride if stride is not None else image_size / Ho
    u = np.arange(K) // kw
    v = np.arange(K) % kw
    base_y = (np.arange(Ho)[:, None, None, None] - padding
              + u[None, None, None, :] * dilation)
    base_x = (np.arange(Wo)[None, :, None, None] - padding
              + v[None, None, None, :] * dilation)
    py = (base_y + offsets[..., 0]) * stride + stride / 2
    px = (base_x + offsets[..., 1]) * stride + stride / 2
    return np.stack([py, px], axis=-1)


def draw_offsets(
    image: np.ndarray,
    offsets: np.ndarray,
    image_size: int,
    group: int = 0,
    step: int = 4,
    color=(0, 0, 255),
) -> np.ndarray:
    """Scatter the sampling positions of every ``step``-th output pixel
    for one deformable group over the image."""
    pos = offsets_to_image_coords(offsets, image_size)
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    img = np.ascontiguousarray((img * 255).clip(0, 255).astype(np.uint8))
    Ho, Wo = offsets.shape[:2]
    for i in range(0, Ho, step):
        for j in range(0, Wo, step):
            for k in range(offsets.shape[3]):
                y, x = pos[i, j, group, k]
                if 0 <= y < image_size and 0 <= x < image_size:
                    cv2.circle(img, (int(x), int(y)), 1, color, -1)
    return img


def dump_eval_visuals(
    out_dir: str,
    index: int,
    image: np.ndarray,
    gt_boxes: np.ndarray,
    detections: np.ndarray,
    offsets: Optional[List[np.ndarray]] = None,
    attn: Optional[List[np.ndarray]] = None,
    attn_base: Optional[List[np.ndarray]] = None,
    conf_threshold: float = 0.2,
    image_size: int = 300,
) -> None:
    """Write the --visualize artifact set for one eval image.

    image: [H, W, 12] network input; detections: [C, K, 5] Detect
    output in normalized coords.
    """
    os.makedirs(out_dir, exist_ok=True)
    pre = os.path.join(out_dir, f"{index:05d}")
    np.save(pre + "_x.npy", image)
    np.save(pre + "_annotation.npy", gt_boxes)
    if offsets:
        np.save(pre + "_offsets.npy", np.asarray(offsets[0]))
    if attn:
        np.save(pre + "_attention.npy", np.asarray(attn[0]))
    if attn_base:
        np.save(pre + "_attention_base.npy", np.asarray(attn_base[0]))

    # portal-phase center slice = channel 7 (phase 2, slice 1)
    portal = image[:, :, 7]
    rows = detections[1]
    keep = rows[:, 0] > conf_threshold
    det_boxes = rows[keep][:, 1:] * image_size
    canvas = draw_boxes(portal, gt_boxes[:, :4], color=(0, 255, 0))
    canvas = draw_boxes(canvas.astype(np.float32) / 255, det_boxes,
                        color=(0, 0, 255), scores=rows[keep][:, 0])
    cv2.imwrite(pre + "_detection.jpg", canvas)
    if offsets:
        off_img = draw_offsets(portal, np.asarray(offsets[0]), image_size)
        cv2.imwrite(pre + "_offsets.jpg", off_img)


def input_grid_with_boxes(
    images: np.ndarray, boxes: np.ndarray, valid: np.ndarray, max_n: int = 4
) -> np.ndarray:
    """TB input grid: [B, H, W, 12] batch -> [H, W*n, 3] panel of portal
    slices with gt boxes drawn (get_input_visual, train v2.py:444-464)."""
    n = min(max_n, images.shape[0])
    H, W = images.shape[1:3]
    panel = np.zeros((H, W * n, 3), np.float32)
    for i in range(n):
        b = boxes[i][valid[i]] * [W, H, W, H]
        img = draw_boxes(images[i, :, :, 7], b).astype(np.float32) / 255
        panel[:, i * W:(i + 1) * W] = img
    return panel

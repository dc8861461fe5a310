"""On-device (jit) augmentation — the TPU-native revival of the
reference's deprecated GPU augmentation (utils/DEPRECATED/
augmentations_cuda.py, disabled at train v2.py:525-528, selected by the
--aug_method flag).

Split of labor:
- **Host** (cheap, box math only): sample per-item geometry — photometric
  scalars, Expand canvas placement, the IoU-constrained RandomSampleCrop
  rectangle (rejection sampling over gt boxes, same semantics as
  data/augment.py sample_crop), mirror flag — and fold everything into
  one affine map output_pixel -> source_pixel per item, plus transformed
  / filtered boxes.
- **Device** (the heavy pixel work, one jitted program): a separable
  bilinear warp of the [B, H, W, 12] batch with per-item hat
  interpolation matrices (batched matmuls on the MXU — the same
  formulation as the Pallas DCN sampler), then brightness/contrast,
  mean-subtract and min-max normalize.

The geometric op composition (jitter -> photometric -> expand -> crop ->
mirror -> normalize -> resize) matches SSDAugmentation
(utils/augmentations.py:548-589); pixel values differ from the host
pipeline only by interpolation order (one fused warp instead of
pad+crop+resize chains), which is the point of doing it on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gssd_tpu.data.augment import SSDAugmentation, _crop_overlap


@dataclass
class GeomParams:
    """Per-item affine: src = scale * dst + offset (per y/x axis),
    with x-flip applied before the affine when flip is set."""

    scale: np.ndarray  # [B, 2] (y, x)
    offset: np.ndarray  # [B, 2]
    flip: np.ndarray  # [B] bool
    brightness: np.ndarray  # [B]
    contrast: np.ndarray  # [B]


class DeviceAugmentation:
    """Host geometry sampler + jitted device warp.

    Usage:
      aug = DeviceAugmentation(size=300, seed=...)
      geom, boxes, labels, valid = aug.sample_geometry(raw_boxes, ...)
      images = aug.warp(raw_batch, geom)   # jitted, on device
    """

    def __init__(
        self,
        size: int = 300,
        src_size: int = 512,
        pixeljitter: float = 0.01,
        ratio: float = 1.5,
        mean: float = 0.0,
        use_normalize: bool = True,
        seed: int = 1111,
        max_gt: int = 16,
    ):
        self.size = size
        self.src_size = src_size
        self.mean = mean
        self.use_normalize = use_normalize
        self.max_gt = max_gt
        # reuse the host pipeline's samplers for identical semantics
        self._host = SSDAugmentation(
            pixeljitter=pixeljitter, ratio=ratio, size=size, mean=mean,
            use_normalize=use_normalize, seed=seed,
        )

        @jax.jit
        def _warp(batch, mat_y, mat_x, brightness, contrast):
            # batch: [B, S, S, C]; mat_y/mat_x: [B, size, S] hat weights
            # that vanish outside the source image; the missing mass is
            # the Expand canvas' mean fill (photometric applies to the
            # image only, like the reference op order).
            x = batch.astype(jnp.float32)
            x = x + brightness[:, None, None, None]
            x = x * contrast[:, None, None, None]
            x = jnp.einsum("bos,bswc->bowc", mat_y, x)
            x = jnp.einsum("bot,bwtc->bwoc", mat_x, x)
            mass = (jnp.sum(mat_y, -1)[:, :, None]
                    * jnp.sum(mat_x, -1)[:, None, :])
            x = x + (1.0 - mass)[..., None] * self.mean
            x = x - self.mean
            if self.use_normalize:
                lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
                hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
                x = (x - lo) / jnp.maximum(hi - lo, 1e-6)
            return x

        self._warp = _warp

    @property
    def rng(self) -> np.random.Generator:
        """THE generator. sample_geometry draws geometry from self.rng
        but delegates jitter noise to the host sampler's pixel_jitter,
        which draws from self._host.rng — a single shared object keeps
        per-batch reseeding (DeviceCacheLoader._batch) atomic over both
        consumers. Two generators here silently broke the 'stream is a
        pure function of (seed, batch_index)' resume contract at
        src_size >= 128, where the jitter noise is nonzero (ADVICE r4)."""
        return self._host.rng

    @rng.setter
    def rng(self, value: np.random.Generator) -> None:
        self._host.rng = value

    # ---- host side -----------------------------------------------------

    def sample_geometry(self, boxes_norm: np.ndarray, labels: np.ndarray):
        """One item: normalized [n, 4] boxes -> (scale, offset, flip,
        brightness, contrast, out_boxes, out_labels). Mirrors the host
        pipeline's op order on box coordinates."""
        S = self.src_size
        rng = self.rng
        boxes = boxes_norm * S  # to source pixels

        # zero-copy shape stub: pixel_jitter reads only img.shape, and a
        # real (1, S, S, 1) zeros alloc per item dominated the host
        # geometry budget at S = 512 (measured: input_wait 46% at 400
        # slices/s on the device-cached path)
        boxes = self._host.pixel_jitter(
            np.broadcast_to(np.float32(0.0), (1, S, S, 1)),
            boxes.astype(np.float32)
        )

        brightness = rng.uniform(-32, 32) if rng.random() < 0.5 else 0.0
        contrast = rng.uniform(0.5, 1.5) if rng.random() < 0.5 else 1.0

        # Expand: virtual canvas of ratio r, image placed at (left, top)
        r = rng.uniform(1.0, self._host.ratio)
        canvas = int(S * r)
        left = int(rng.uniform(0, canvas - S))
        top = int(rng.uniform(0, canvas - S))
        cboxes = boxes.copy()
        cboxes[:, 0::2] += left
        cboxes[:, 1::2] += top

        # RandomSampleCrop on the canvas (same option menu / constraints)
        rect, kept = self._sample_crop_rect(canvas, cboxes)
        kb = cboxes[kept].copy()
        kl = labels[kept]
        kb[:, :2] = np.maximum(kb[:, :2], rect[:2]) - rect[:2]
        kb[:, 2:] = np.minimum(kb[:, 2:], rect[2:]) - rect[:2]
        cw, ch = rect[2] - rect[0], rect[3] - rect[1]

        flip = rng.random() < 0.5
        if flip:
            kb = kb.copy()
            kb[:, 0::2] = cw - kb[:, 2::-2]

        # affine: src_canvas = scale * dst + offset, then to source-image
        # coords by subtracting (left, top)
        scale = np.array([ch / self.size, cw / self.size], np.float32)
        offset = np.array([rect[1] - top, rect[0] - left], np.float32)
        out_boxes = kb / np.array([cw, ch, cw, ch], np.float32)
        return (scale, offset, flip, brightness, contrast,
                out_boxes.astype(np.float32), kl)

    def _sample_crop_rect(self, canvas: int, boxes: np.ndarray,
                          max_modes: int = 200):
        rng = self.rng
        full = np.array([0, 0, canvas, canvas])
        for _ in range(max_modes):
            mode = SSDAugmentation.SAMPLE_OPTIONS[
                int(rng.integers(len(SSDAugmentation.SAMPLE_OPTIONS)))
            ]
            if mode is None:
                return full, np.ones(len(boxes), bool)
            min_iou = mode[0] if mode[0] is not None else -np.inf
            max_iou = mode[1] if mode[1] is not None else np.inf
            for _ in range(50):
                cw = rng.uniform(0.3 * canvas, canvas)
                ch = rng.uniform(0.3 * canvas, canvas)
                if ch / cw < 0.5 or ch / cw > 2:
                    continue
                left = rng.uniform(0, canvas - cw)
                top = rng.uniform(0, canvas - ch)
                rect = np.array([int(left), int(top), int(left + cw),
                                 int(top + ch)])
                ov = _crop_overlap(boxes, rect)
                if ov.min() < min_iou and max_iou < ov.max():
                    continue
                centers = (boxes[:, :2] + boxes[:, 2:]) / 2
                keep = ((rect[0] < centers[:, 0]) & (rect[1] < centers[:, 1])
                        & (rect[2] > centers[:, 0])
                        & (rect[3] > centers[:, 1]))
                if not keep.any():
                    continue
                return rect, keep
        return full, np.ones(len(boxes), bool)

    def interp_matrices(self, geom: GeomParams) -> Tuple[np.ndarray, np.ndarray]:
        """Per-item separable hat matrices [B, size, src_size] for the
        warp dst -> src (x matrices already account for flips)."""
        B = len(geom.flip)
        S, O = self.src_size, self.size
        dst = np.arange(O, dtype=np.float32) + 0.5
        grid = np.arange(S, dtype=np.float32)
        mat_y = np.zeros((B, O, S), np.float32)
        mat_x = np.zeros((B, O, S), np.float32)
        for b in range(B):
            sy = dst * geom.scale[b, 0] + geom.offset[b, 0] - 0.5
            mat_y[b] = np.maximum(0, 1 - np.abs(sy[:, None] - grid[None]))
            dx = dst.copy()
            if geom.flip[b]:
                dx = O - dx
            sx = dx * geom.scale[b, 1] + geom.offset[b, 1] - 0.5
            mat_x[b] = np.maximum(0, 1 - np.abs(sx[:, None] - grid[None]))
        return mat_y, mat_x

    # ---- batch API -------------------------------------------------------

    def __call__(self, raw_images: np.ndarray, boxes_list, labels_list):
        """raw_images: [B, src, src, C] float 0..255 (phase-collapsed);
        boxes_list/labels_list: per-item normalized boxes. Returns the
        standard static-shape batch dict with images on device."""
        B = raw_images.shape[0]
        scales = np.zeros((B, 2), np.float32)
        offsets = np.zeros((B, 2), np.float32)
        flips = np.zeros(B, bool)
        bright = np.zeros(B, np.float32)
        contr = np.ones(B, np.float32)
        out_b = np.zeros((B, self.max_gt, 4), np.float32)
        out_l = np.zeros((B, self.max_gt), np.int32)
        out_v = np.zeros((B, self.max_gt), bool)
        for b in range(B):
            (scales[b], offsets[b], flips[b], bright[b], contr[b],
             kb, kl) = self.sample_geometry(boxes_list[b], labels_list[b])
            n = min(len(kb), self.max_gt)
            out_b[b, :n] = kb[:n]
            out_l[b, :n] = kl[:n]
            out_v[b, :n] = True
        geom = GeomParams(scales, offsets, flips, bright, contr)
        my, mx = self.interp_matrices(geom)
        images = self._warp(
            jnp.asarray(raw_images), jnp.asarray(my), jnp.asarray(mx),
            jnp.asarray(bright), jnp.asarray(contr),
        )
        return {
            "image": images,
            "boxes": out_b,
            "labels": out_l,
            "valid": out_v,
        }

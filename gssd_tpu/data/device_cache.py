"""Device-resident training data + fully on-device augmentation.

The reference's data path is host DataLoader workers feeding per-step
GPU copies (train_lesion_multiphase_v2.py:532-554). On a TPU host with
a thin interconnect (this box's tunnel moves ~22 MB/s) shipping even
uint8 512^2 raw batches caps training at ~7 slices/s, and the 1-core
host caps the numpy augmentation pipeline at ~6 slices/s — two orders
of magnitude under the TPU step. The TPU-native design: device_put the
ENTIRE training split once (uint8 phase-collapsed NHWC, ~3.1 MB per
512^2 slice), then per step ship only scalars — sample indices, the
per-item affine geometry, photometric params — and run one jitted
gather -> bilinear warp -> photometric -> normalize program that
assembles the augmented batch entirely in HBM.

Geometry semantics (jitter -> photometric -> expand -> crop -> mirror
-> normalize -> resize) are the host sampler's, shared with
data/augment_device.DeviceAugmentation (reference chain:
utils/augmentations.py:548-589). The batch stream is a pure function
of (seed, batch_index) — per-batch reseeding, same contract as
MPBatchLoader — so exact data-stream resume works (start_batch).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Optional

import numpy as np

from gssd_tpu.data.augment_device import DeviceAugmentation
from gssd_tpu.data.dataset import LesionDataset, _EpochPermuter

# refuse to cache more than this many bytes on device by default
# (override with GSSD_DEVICE_CACHE_GB); full clinical datasets should
# use --aug_method host/device instead
DEFAULT_CACHE_GB = 4.0


class DeviceCacheLoader:
    """Endless batch iterator over a device-resident dataset.

    Yields the standard static-shape batch dict; ``image`` is a device
    array (f32, augmented, [B, size, size, C]) that never crossed the
    host-device link after construction."""

    def __init__(
        self,
        dataset: LesionDataset,
        batch_size: int,
        size: int = 300,
        max_gt: int = 16,
        seed: int = 1111,
        pixeljitter: float = 0.01,
        ratio: float = 1.5,
        mean: float = 0.0,
        use_normalize: bool = True,
        shuffle: bool = True,
        start_batch: int = 0,
    ):
        import os

        import jax
        import jax.numpy as jnp

        if len(dataset) == 0:
            raise ValueError("DeviceCacheLoader over an empty dataset")
        self.batch_size = batch_size
        self.size = size
        self.max_gt = max_gt
        self.seed = seed
        self.start_batch = start_batch
        self._perm = _EpochPermuter(seed, len(dataset), shuffle)

        # ---- one-time device upload -----------------------------------
        imgs, self._boxes, self._labels = [], [], []
        for i in range(len(dataset)):
            img, bbox = dataset.raw_item(i)  # [4, H, W, 3] f32 0..255
            p, h, w, c = img.shape
            imgs.append(
                np.clip(np.transpose(img, (1, 2, 0, 3)).reshape(h, w, p * c),
                        0, 255).astype(np.uint8)
            )
            b = bbox[:, :4].copy()
            b[:, 0::2] /= w
            b[:, 1::2] /= h
            self._boxes.append(b.astype(np.float32))
            self._labels.append(bbox[:, 4].astype(np.int32))
        stack = np.stack(imgs)
        cap = float(os.environ.get("GSSD_DEVICE_CACHE_GB", DEFAULT_CACHE_GB))
        if stack.nbytes > cap * 2**30:
            raise ValueError(
                f"device cache would be {stack.nbytes / 2**30:.1f} GiB "
                f"(cap {cap}); use --aug_method host/device for datasets "
                "this large or raise GSSD_DEVICE_CACHE_GB"
            )
        self._cache = jax.device_put(stack)
        self.src_size = stack.shape[1]

        # host geometry sampler (shared semantics with DeviceAugmentation)
        self._geom = DeviceAugmentation(
            size=size, src_size=self.src_size, pixeljitter=pixeljitter,
            ratio=ratio, mean=mean, use_normalize=use_normalize,
            seed=seed, max_gt=max_gt,
        )

        O, S = size, self.src_size
        m = float(mean)
        norm = bool(use_normalize)

        @jax.jit
        def _gather_warp(cache, idx, scale, offset, flip, bright, contr):
            x = jnp.take(cache, idx, axis=0).astype(jnp.float32)
            x = x + bright[:, None, None, None]
            x = x * contr[:, None, None, None]
            # separable hat matrices built on device from the affine
            # scalars: dst pixel centers -> source coords
            dst = jnp.arange(O, dtype=jnp.float32) + 0.5
            grid = jnp.arange(S, dtype=jnp.float32)
            sy = dst[None] * scale[:, 0:1] + offset[:, 0:1] - 0.5
            mat_y = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, :, None] - grid))
            dxp = jnp.where(flip[:, None], O - dst[None], dst[None])
            sx = dxp * scale[:, 1:2] + offset[:, 1:2] - 0.5
            mat_x = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, :, None] - grid))
            x = jnp.einsum("bos,bswc->bowc", mat_y, x)
            x = jnp.einsum("bot,bwtc->bwoc", mat_x, x)
            # hat mass lost outside the source image is the Expand
            # canvas' mean fill (photometric applies to the image only)
            mass = (jnp.sum(mat_y, -1)[:, :, None]
                    * jnp.sum(mat_x, -1)[:, None, :])
            x = x + (1.0 - mass)[..., None] * m
            x = x - m
            if norm:
                lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
                hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
                x = (x - lo) / jnp.maximum(hi - lo, 1e-6)
            return x

        self._gather_warp = _gather_warp

    def _batch(self, j: int):
        B = self.batch_size
        idx = np.asarray(self._perm.indices_for_batch(j, B), np.int32)
        # per-batch reseed: stream is a pure function of (seed, j)
        self._geom.rng = np.random.default_rng((self.seed << 20) ^ j)
        scales = np.zeros((B, 2), np.float32)
        offsets = np.zeros((B, 2), np.float32)
        flips = np.zeros(B, bool)
        bright = np.zeros(B, np.float32)
        contr = np.ones(B, np.float32)
        out_b = np.zeros((B, self.max_gt, 4), np.float32)
        out_l = np.zeros((B, self.max_gt), np.int32)
        out_v = np.zeros((B, self.max_gt), bool)
        for b, i in enumerate(idx):
            (scales[b], offsets[b], flips[b], bright[b], contr[b], kb, kl
             ) = self._geom.sample_geometry(self._boxes[i], self._labels[i])
            n = min(len(kb), self.max_gt)
            out_b[b, :n] = kb[:n]
            out_l[b, :n] = kl[:n]
            out_v[b, :n] = True
        images = self._gather_warp(self._cache, idx, scales, offsets,
                                   flips, bright, contr)
        return {
            "image": images,
            "boxes": out_b,
            "labels": out_l,
            "valid": out_v,
        }

    def __iter__(self) -> Iterator[dict]:
        j = self.start_batch
        while True:
            yield self._batch(j)
            j += 1

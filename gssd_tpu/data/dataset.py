"""ml_ready npy dataset + static-shape batching.

Reads the per-slice npy quadruplets the preprocessing stage emits
(reference contract: {id}_ct.npy [4,3,512,512] float in [0,1],
{id}_bbox.npy [n,5] = (x1,y1,x2,y2,cls) in 512-px coords,
data_checker_year1_extended_1904.py:415-427; loading semantics of
FISHdetectionV2.pull_item, data_custom_v2.py:195-306: image scaled to
0..255, bbox coords normalized to [0,1]).

TPU-facing batches are fully static-shape: images stacked
[B, H, W, phases*3] NHWC and variable-length targets padded to
``max_gt`` with a validity mask (the reference instead collates a
python list of tensors, data_custom_v2.py:379-396, and loops over it in
the loss).
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


class LesionDataset:
    def __init__(
        self,
        data_path: str,
        ids: Sequence[str],
        transform: Optional[Callable] = None,
        load_to_ram: bool = False,
    ):
        self.data_path = data_path
        self.ids = list(ids)
        self.transform = transform
        self._cache: Optional[List] = None
        if load_to_ram:
            self._cache = [self._load(i) for i in range(len(self.ids))]

    def __len__(self) -> int:
        return len(self.ids)

    def _load(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        base = os.path.join(self.data_path, self.ids[index])
        ct = np.load(base + "_ct.npy")  # [4, 3, H, W] in [0, 1]
        img = np.transpose(ct, (0, 2, 3, 1))  # [4, H, W, 3]
        img = (img * 255.0).astype(np.float32)
        bbox = np.load(base + "_bbox.npy").astype(np.float32)  # [n, 5]
        return img, bbox

    def raw_item(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._cache is not None:
            img, bbox = self._cache[index]
            return img.copy(), bbox.copy()
        return self._load(index)

    def pull_image(self, index: int) -> np.ndarray:
        """Original-resolution image [4, H, W, 3] float 0..255."""
        return self.raw_item(index)[0]

    def pull_anno(self, index: int) -> np.ndarray:
        """[n, 5] absolute-pixel boxes + class."""
        return self.raw_item(index)[1]

    def __getitem__(self, index: int):
        img, target = self.raw_item(index)
        h, w = img.shape[1], img.shape[2]
        boxes = target[:, :4].copy()
        boxes[:, 0::2] /= w
        boxes[:, 1::2] /= h
        labels = target[:, 4].copy()
        if self.transform is not None:
            img, boxes, labels = self.transform(img, boxes, labels)
        return img, boxes, labels


def pad_targets(
    boxes: np.ndarray, labels: np.ndarray, max_gt: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad a [n, 4]/[n] target pair to static [max_gt] with validity."""
    n = min(len(boxes), max_gt)
    out_b = np.zeros((max_gt, 4), np.float32)
    out_l = np.zeros((max_gt,), np.int32)
    out_v = np.zeros((max_gt,), bool)
    out_b[:n] = boxes[:n]
    out_l[:n] = labels[:n]
    out_v[:n] = True
    return out_b, out_l, out_v


def collate(
    items: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    max_gt: int = 16,
) -> Dict[str, np.ndarray]:
    """Stack transformed items into a static-shape NHWC batch.

    Each item is ([4, H, W, 3] image, [n, 4] boxes, [n] labels); the
    phase and slice axes collapse into 12 NHWC channels (the reference
    reshapes to 12 channels on device, train v2.py:198).
    """
    imgs, bs, ls, vs = [], [], [], []
    for img, boxes, labels in items:
        p, h, w, c = img.shape
        imgs.append(np.transpose(img, (1, 2, 0, 3)).reshape(h, w, p * c))
        b, l, v = pad_targets(boxes, labels, max_gt)
        bs.append(b)
        ls.append(l)
        vs.append(v)
    return {
        "image": np.stack(imgs).astype(np.float32),
        "boxes": np.stack(bs),
        "labels": np.stack(ls),
        "valid": np.stack(vs),
    }


def collate_pixellink(
    items: Sequence[Tuple[np.ndarray, np.ndarray, dict]],
    max_gt: int = 16,
) -> Dict[str, np.ndarray]:
    """PixelLink variant: the transform returns a target dict with the
    rasterized masks (reference detection_collate_v2_pixel_link,
    data_custom_v2.py:399-434)."""
    imgs, pm, npm, pw, lm, bs, ls, vs = [], [], [], [], [], [], [], []
    for img, boxes, t in items:
        p, h, w, c = img.shape
        imgs.append(np.transpose(img, (1, 2, 0, 3)).reshape(h, w, p * c))
        pm.append(t["pixel_mask"])
        npm.append(t["neg_pixel_mask"])
        pw.append(t["pixel_pos_weight"])
        lm.append(t["link_mask"])
        b, l, v = pad_targets(boxes, np.asarray(t["labels"]), max_gt)
        bs.append(b)
        ls.append(l)
        vs.append(v)
    return {
        "image": np.stack(imgs).astype(np.float32),
        "pixel_mask": np.stack(pm).astype(np.int32),
        "neg_pixel_mask": np.stack(npm).astype(np.uint8),
        "pixel_pos_weight": np.stack(pw).astype(np.float32),
        "link_mask": np.stack(lm).astype(np.int32),
        "boxes": np.stack(bs),
        "labels": np.stack(ls),
        "valid": np.stack(vs),
    }


def collate_raw(
    items: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    max_gt: int = 16,
) -> Dict[str, Any]:
    """Raw collate for the on-device augmentation path: stacks untouched
    source-resolution images and keeps per-item normalized boxes for the
    host-side geometry sampler (data/augment_device.py)."""
    imgs, bl, ll = [], [], []
    for img, boxes, labels in items:
        p, h, w, c = img.shape
        imgs.append(np.transpose(img, (1, 2, 0, 3)).reshape(h, w, p * c))
        bl.append(np.asarray(boxes, np.float32))
        ll.append(np.asarray(labels))
    # uint8 transfer: 4x less host->device traffic; the device warp
    # dequantizes (source data is 0..255 anyway)
    raw = np.clip(np.stack(imgs), 0, 255).astype(np.uint8)
    return {
        "raw_image": raw,
        "boxes_list": bl,
        "labels_list": ll,
    }


class BatchLoader:
    """Shuffling, endlessly-repeating host batch iterator with a
    background prefetch thread (the reference uses torch DataLoader
    worker processes, train v2.py:532-554)."""

    def __init__(
        self,
        dataset: LesionDataset,
        batch_size: int,
        max_gt: int = 16,
        seed: int = 1111,
        shuffle: bool = True,
        prefetch: int = 2,
        collate_fn: Callable = None,
    ):
        if len(dataset) == 0:
            raise ValueError("BatchLoader over an empty dataset")
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.collate_fn = collate_fn or collate
        self.rng = np.random.default_rng(seed)
        self._queue: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._started = False

    def _index_stream(self) -> Iterator[int]:
        n = len(self.dataset)
        while True:
            order = self.rng.permutation(n) if self.shuffle else np.arange(n)
            yield from order

    def _worker(self):
        stream = self._index_stream()
        while True:
            items = [self.dataset[next(stream)] for _ in range(self.batch_size)]
            self._queue.put(self.collate_fn(items, self.max_gt))

    def __iter__(self):
        if not self._started:
            self._thread.start()
            self._started = True
        while True:
            yield self._queue.get()

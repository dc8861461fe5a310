"""Pascal VOC detection dataset (VOCdevkit layout).

Rebuilds the reference's VOC pipeline (data/voc0712.py:35-206 —
AnnotationTransform, VOCDetection, detection_collate) on the repo's
static-shape batch conventions: items are ([1, H, W, 3] float 0..255
images, [n, 4] normalized boxes, [n] int labels), so the standard
``collate`` / ``BatchLoader`` / ``pad_targets`` machinery produces
[B, size, size, 3] NHWC batches with max_gt-padded targets — the same
contract every other dataset here emits (dataset.py:93-116). The
matching model config is ``ssd_type='ssd', num_phases=1,
slices_per_phase=3, num_classes=21`` (3-channel vanilla SSD300,
reference row: the upstream fork baseline).

The torch Dataset/collate-list design (voc0712.py:189-206) is replaced
by plain-numpy items feeding the static-shape collate; XML parsing and
the class list are the VOC contract itself.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

# The VOC label contract (voc0712.py:23-28); index = position.
VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat",
    "bottle", "bus", "car", "cat", "chair",
    "cow", "diningtable", "dog", "horse",
    "motorbike", "person", "pottedplant",
    "sheep", "sofa", "train", "tvmonitor",
)

_CLASS_TO_IND = {name: i for i, name in enumerate(VOC_CLASSES)}


def parse_voc_annotation(
    root: "ET.Element",
    width: float,
    height: float,
    keep_difficult: bool = False,
    class_to_ind: Optional[dict] = None,
    return_difficult: bool = False,
):
    """VOC XML root -> [n, 5] float array of
    (xmin, ymin, xmax, ymax, label) with coords normalized by the
    image size. Matches AnnotationTransform (voc0712.py:53-81): 1-based
    pixel coords shift to 0-based before normalizing; difficult
    objects drop unless keep_difficult. With return_difficult, ALL
    objects are kept and an [n] bool difficult-flag array is returned
    alongside (the eval protocol treats difficult as ignore — reference
    eval.py:272-336 — so the eval path needs the flags, not a drop)."""
    lookup = class_to_ind or _CLASS_TO_IND
    rows: List[List[float]] = []
    flags: List[bool] = []
    for obj in root.iter("object"):
        diff = obj.find("difficult")
        is_diff = diff is not None and int(diff.text) == 1
        if not return_difficult and not keep_difficult and is_diff:
            continue
        name = obj.find("name").text.lower().strip()
        bb = obj.find("bndbox")
        coords = [
            (int(bb.find(pt).text) - 1) / (width if i % 2 == 0 else height)
            for i, pt in enumerate(("xmin", "ymin", "xmax", "ymax"))
        ]
        rows.append(coords + [float(lookup[name])])
        flags.append(is_diff)
    anno = (np.asarray(rows, np.float32) if rows
            else np.zeros((0, 5), np.float32))
    if return_difficult:
        return anno, np.asarray(flags, bool)
    return anno


class VOCDataset:
    """VOCdevkit reader with the LesionDataset item protocol
    (dataset.py:27-76): __getitem__ -> (img [1, H, W, 3] float 0..255,
    boxes [n, 4] normalized, labels [n] float); pull_image/pull_anno
    return the untransformed originals, as in VOCDetection
    (voc0712.py:144-173). ``image_sets`` is the reference's list of
    (year, set-name) pairs, e.g. [("2007", "trainval")]."""

    def __init__(
        self,
        root: str,
        image_sets: Sequence[Tuple[str, str]] = (("2007", "trainval"),),
        transform: Optional[Callable] = None,
        keep_difficult: bool = False,
    ):
        self.root = root
        self.transform = transform
        self.keep_difficult = keep_difficult
        self.ids: List[Tuple[str, str]] = []
        for year, name in image_sets:
            rootpath = os.path.join(root, "VOC" + year)
            listing = os.path.join(
                rootpath, "ImageSets", "Main", name + ".txt")
            with open(listing) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        self.ids.append((rootpath, line))

    def __len__(self) -> int:
        return len(self.ids)

    def _paths(self, index: int) -> Tuple[str, str]:
        rootpath, img_id = self.ids[index]
        return (
            os.path.join(rootpath, "JPEGImages", img_id + ".jpg"),
            os.path.join(rootpath, "Annotations", img_id + ".xml"),
        )

    def pull_image(self, index: int) -> np.ndarray:
        """Original image as [H, W, 3] RGB float 0..255."""
        import cv2

        bgr = cv2.imread(self._paths(index)[0], cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(self._paths(index)[0])
        return bgr[:, :, ::-1].astype(np.float32)

    def pull_anno(self, index: int) -> np.ndarray:
        """[n, 5] boxes normalized to the original image + class."""
        img_path, xml_path = self._paths(index)
        root = ET.parse(xml_path).getroot()
        size = root.find("size")
        w = float(size.find("width").text)
        h = float(size.find("height").text)
        return parse_voc_annotation(
            root, w, h, keep_difficult=self.keep_difficult)

    def pull_anno_with_difficult(self, index: int):
        """([n, 5] normalized boxes + class, [n] difficult flags) with
        difficult objects KEPT — the eval.py:272-336 ignore protocol
        needs them present but flagged."""
        _, xml_path = self._paths(index)
        root = ET.parse(xml_path).getroot()
        size = root.find("size")
        w = float(size.find("width").text)
        h = float(size.find("height").text)
        return parse_voc_annotation(root, w, h, return_difficult=True)

    def raw_item(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        img = self.pull_image(index)
        target = self.pull_anno(index)
        return img, target

    def __getitem__(self, index: int):
        img, target = self.raw_item(index)
        # single-phase axis so BaseTransform / collate see the same
        # [P, H, W, C] layout as the CT datasets (P = 1 here)
        img = img[None]
        boxes = target[:, :4]
        labels = target[:, 4]
        if self.transform is not None:
            img, boxes, labels = self.transform(img, boxes, labels)
        return img, boxes, labels

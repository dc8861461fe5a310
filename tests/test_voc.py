"""VOC dataset + vanilla 3-channel SSD300 variant.

Covers the reference's VOC pipeline (data/voc0712.py) and its fork
baseline model (vanilla SSD300 on 3-channel images): a synthetic
VOCdevkit tree feeds VOCDataset through BaseTransform + collate into
a 21-class ungrouped SSD forward.
"""

import dataclasses
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from gssd_tpu.data.dataset import collate
from gssd_tpu.data.transforms import BaseTransform
from gssd_tpu.data.voc import VOC_CLASSES, VOCDataset, parse_voc_annotation


def _write_voc_tree(root, year="2007", names=("img0", "img1")):
    import cv2

    base = os.path.join(root, "VOC" + year)
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    objects = {
        "img0": [("dog", (48, 23, 120, 90), 0), ("cat", (10, 10, 40, 60), 0)],
        "img1": [("person", (5, 8, 60, 100), 1)],  # difficult
    }
    for name in names:
        h, w = 128, 160
        img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        cv2.imwrite(os.path.join(base, "JPEGImages", name + ".jpg"), img)
        ann = ET.Element("annotation")
        size = ET.SubElement(ann, "size")
        for tag, v in (("width", w), ("height", h), ("depth", 3)):
            ET.SubElement(size, tag).text = str(v)
        for cls, (x1, y1, x2, y2), diff in objects[name]:
            obj = ET.SubElement(ann, "object")
            ET.SubElement(obj, "name").text = cls
            ET.SubElement(obj, "difficult").text = str(diff)
            bb = ET.SubElement(obj, "bndbox")
            for tag, v in (("xmin", x1), ("ymin", y1),
                           ("xmax", x2), ("ymax", y2)):
                ET.SubElement(bb, tag).text = str(v)
        ET.ElementTree(ann).write(
            os.path.join(base, "Annotations", name + ".xml"))
    with open(os.path.join(base, "ImageSets", "Main", "trainval.txt"),
              "w") as fh:
        fh.write("\n".join(names) + "\n")
    return base


def test_parse_annotation_normalizes_and_drops_difficult(tmp_path):
    _write_voc_tree(str(tmp_path))
    xml = os.path.join(str(tmp_path), "VOC2007", "Annotations", "img0.xml")
    got = parse_voc_annotation(ET.parse(xml).getroot(), 160.0, 128.0)
    assert got.shape == (2, 5)
    # (48-1)/160, (23-1)/128 ... and the alphabetic label index
    np.testing.assert_allclose(
        got[0], [47 / 160, 22 / 128, 119 / 160, 89 / 128,
                 VOC_CLASSES.index("dog")], rtol=1e-6)
    # img1's only object is difficult -> dropped by default, kept on flag
    xml1 = os.path.join(str(tmp_path), "VOC2007", "Annotations", "img1.xml")
    assert parse_voc_annotation(
        ET.parse(xml1).getroot(), 160.0, 128.0).shape == (0, 5)
    assert parse_voc_annotation(
        ET.parse(xml1).getroot(), 160.0, 128.0,
        keep_difficult=True).shape == (1, 5)


def test_voc_dataset_items_and_collate(tmp_path):
    _write_voc_tree(str(tmp_path))
    ds = VOCDataset(
        str(tmp_path), [("2007", "trainval")],
        transform=BaseTransform(size=64, use_normalize=False),
        keep_difficult=True)
    assert len(ds) == 2
    img, boxes, labels = ds[0]
    assert img.shape == (1, 64, 64, 3)
    assert boxes.shape == (2, 4) and labels.shape == (2,)
    assert 0.0 <= boxes.min() and boxes.max() <= 1.0
    raw = ds.pull_image(0)
    assert raw.shape == (128, 160, 3) and raw.max() > 1.0
    batch = collate([ds[i] for i in range(2)], max_gt=8)
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["boxes"].shape == (2, 8, 4)
    assert batch["valid"].sum() == 3
    assert batch["labels"][0, 0] == VOC_CLASSES.index("dog")


def test_vanilla_voc_ssd300_forward():
    """The upstream fork baseline: ungrouped 3-channel 21-class SSD300
    (reference ssd.py via voc0712 — 8732 v2 priors)."""
    import jax
    import jax.numpy as jnp

    from gssd_tpu.config import ANCHOR_CONFIGS, ModelConfig
    from gssd_tpu.models import build_model

    cfg = ModelConfig(
        ssd_type="ssd", num_phases=1, slices_per_phase=3,
        num_classes=21, batch_norm=False, compute_dtype="float32")
    assert cfg.in_channels == 3
    model, priors = build_model(cfg)
    x = jnp.zeros((1, 300, 300, 3), jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(vs, x, train=False)
    n = ANCHOR_CONFIGS["v2"].num_priors
    assert priors.shape == (n, 4)
    assert out["loc"].shape == (1, n, 4)
    assert out["conf"].shape == (1, n, 21)
    assert np.isfinite(np.asarray(out["conf"])).all()


def test_voc_trainer_e2e(tmp_path, monkeypatch, capsys):
    """train_voc.py end to end on a synthetic VOCdevkit fixture: a few
    train steps + a finite multi-class mAP through eval/voc_map.py (the
    reference's eval.py role). The full SSD300 is swapped for the mini
    detector — the trainer/eval wiring is what's under test."""
    import gssd_tpu.models as models_pkg
    from mini_model import MINI_ANCHORS, MiniDetector
    from gssd_tpu.ops.anchors import make_anchors

    _write_voc_tree(str(tmp_path))
    monkeypatch.setattr(
        models_pkg, "build_model",
        lambda cfg: (MiniDetector(num_classes=cfg.num_classes),
                     make_anchors(MINI_ANCHORS)))
    import train_voc

    res = train_voc.main([
        "--voc_root", str(tmp_path),
        "--train_sets", "2007:trainval", "--eval_sets", "2007:trainval",
        "--ssd_dim", "64", "--batch_size", "2", "--max_gt", "8",
        "--max_iter", "13", "--val_every", "6", "--eval_batch", "2",
        "--compute_dtype", "float32",
        "--output", str(tmp_path / "out"),
    ])
    assert np.isfinite(res["map"])
    assert "ap_dog" in res and "ap_cat" in res  # classes with gt
    out = capsys.readouterr().out
    assert "VOC mAP" in out
    # eval-only mode over the saved checkpoint
    res2 = train_voc.main([
        "--voc_root", str(tmp_path),
        "--eval_sets", "2007:trainval", "--ssd_dim", "64",
        "--eval_batch", "2", "--compute_dtype", "float32",
        "--output", str(tmp_path / "out"),
        "--test", "True", "--checkpoint", "12",
    ])
    assert np.isfinite(res2["map"])

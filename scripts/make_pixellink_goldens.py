#!/usr/bin/env python
"""Generate PixelLink reference-golden fixtures by RUNNING the reference
implementation (pure torch/numpy/cv2, no CUDA needed) on fixed inputs.

Covers the PixelLink chain VERDICT r2 #4 calls out:
  - pixellink_data.label_to_mask_and_pixel_pos_weight (:15-99) —
    pixel/neg/weight/link target maps, 2s and 4s, incl. the 8-neighbor
    link direction convention (shift table :84-92);
  - PixelLinkLoss.pixel_loss / link_loss (criterion.py:23-105) — loss
    values with instance-balanced weights + OHNM negatives;
  - postprocess.mask_to_box + union-find grouping (:82-233) — decoded
    boxes/scores from synthetic logits.

Run from the repo root (reads /root/reference, writes
tests/goldens/reference_pixellink.npz):

    python scripts/make_pixellink_goldens.py

No reference code is copied — it is imported from /root/reference and
executed. Old-numpy aliases the reference relies on (np.float, np.long,
np.int0) are restored before import.
"""

import os
import sys

import numpy as np

REF = "/root/reference/ssd_liverdet"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

SIZE = 64  # model input size for fixtures (maps are SIZE/factor)

BOX_SETS = {
    # normalized point-form [x1, y1, x2, y2]
    "two": [[0.1, 0.15, 0.45, 0.5], [0.55, 0.5, 0.9, 0.85]],
    "overlap": [[0.1, 0.1, 0.5, 0.5], [0.3, 0.3, 0.7, 0.7]],
    "border": [[0.0, 0.0, 0.2, 0.3], [0.7, 0.6, 1.0, 1.0]],
    "single": [[0.25, 0.25, 0.75, 0.75]],
    "touching": [[0.1, 0.1, 0.5, 0.5], [0.5, 0.1, 0.9, 0.5]],
}


def _import_reference():
    # the reference targets numpy<1.24 (np.float / np.long / np.int0)
    np.float = float  # noqa: NPY001
    np.long = np.int64
    np.int0 = np.intp
    sys.path.insert(0, REF)
    # torchvision is not installed; the reference imports
    # torchvision.transforms at pixellink_data.py:12 without using it on
    # the paths we execute — stub it (same as make_reference_goldens.py)
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    from pixel_link import criterion, pixellink_data, postprocess

    return pixellink_data, criterion, postprocess


def ref_targets(pixellink_data, boxes_norm, version):
    """Exactly the reference PreparePixelLinkTargets path
    (augmentations.py:532-541): percent boxes -> long pixel coords ->
    4-corner contour -> label_to_mask_and_pixel_pos_weight."""
    boxes_long = np.array(np.asarray(boxes_norm) * SIZE, dtype=np.int64)
    converted = np.take(boxes_long, indices=[0, 1, 2, 1, 2, 3, 0, 3], axis=1)
    pm, npm, pw, lm = pixellink_data.label_to_mask_and_pixel_pos_weight(
        converted, (SIZE, SIZE), version)
    return (np.asarray(pm), np.asarray(npm), np.asarray(pw, np.float64),
            np.asarray(lm))


def main():
    import torch

    pixellink_data, criterion, postprocess = _import_reference()
    os.makedirs(OUT, exist_ok=True)
    out = {"size": np.int64(SIZE)}

    # ---- target maps ---------------------------------------------------
    for name, boxes in BOX_SETS.items():
        out[f"tgt_{name}_boxes"] = np.asarray(boxes, np.float32)
        for version in ("2s", "4s"):
            pm, npm, pw, lm = ref_targets(pixellink_data, boxes, version)
            out[f"tgt_{name}_{version}_pixel_mask"] = pm
            out[f"tgt_{name}_{version}_neg_pixel_mask"] = npm
            out[f"tgt_{name}_{version}_pixel_pos_weight"] = pw.astype(
                np.float32)
            out[f"tgt_{name}_{version}_link_mask"] = lm

    # ---- loss values ---------------------------------------------------
    # batch of 2 (maps from 'two' and 'single', 4s -> 16x16), random
    # logits; reference layout is NCHW ([B,2,H,W] / [B,16,H,W])
    rng = np.random.default_rng(1115)
    maps = [ref_targets(pixellink_data, BOX_SETS["two"], "4s"),
            ref_targets(pixellink_data, BOX_SETS["single"], "4s")]
    hw = SIZE // 4
    pixel_logits = rng.normal(0, 1.5, (2, 2, hw, hw)).astype(np.float32)
    link_logits = rng.normal(0, 1.5, (2, 16, hw, hw)).astype(np.float32)
    out["loss_pixel_logits"] = pixel_logits
    out["loss_link_logits"] = link_logits
    tgt = torch.from_numpy(np.stack([m[0] for m in maps])).long()
    neg = torch.from_numpy(np.stack([m[1] for m in maps])).long()
    posw = torch.from_numpy(
        np.stack([m[2] for m in maps])).to(torch.float32)
    link_tgt = torch.from_numpy(np.stack([m[3] for m in maps])).long()
    crit = criterion.PixelLinkLoss()
    pp, pn = crit.pixel_loss(
        torch.from_numpy(pixel_logits), tgt, neg, posw)
    lp, ln = crit.link_loss(torch.from_numpy(link_logits), link_tgt)
    out["loss_pixel_pos"] = np.float32(pp.item())
    out["loss_pixel_neg"] = np.float32(pn.item())
    out["loss_link_pos"] = np.float32(lp.item())
    out["loss_link_neg"] = np.float32(ln.item())

    # ---- decode (mask_to_box + union-find) -----------------------------
    # clean logits derived from the 'two' 4s targets: fg logit +4 on
    # positive pixels / target links, -4 elsewhere -> two components
    for name in ("two", "touching", "single"):
        pm, _, _, lm = ref_targets(pixellink_data, BOX_SETS[name], "4s")
        pix = np.where(pm[None].astype(bool), 4.0, -4.0)  # [1, H, W]
        pix_l = np.stack([-pix, pix], axis=1).astype(np.float32)  # [1,2,H,W]
        lnk = np.where(lm[None].astype(bool), 4.0, -4.0)  # [1, 8, H, W]
        lnk_l = np.empty((1, 16, hw, hw), np.float32)
        lnk_l[:, 0::2] = -lnk
        lnk_l[:, 1::2] = lnk
        det = postprocess.mask_to_box(
            torch.from_numpy(pix_l), torch.from_numpy(lnk_l),
            img_shape=(SIZE, SIZE))
        out[f"dec_{name}_pixel_logits"] = pix_l
        out[f"dec_{name}_link_logits"] = lnk_l
        out[f"dec_{name}_detections"] = np.asarray(det, np.float32)

    path = os.path.join(OUT, "reference_pixellink.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({len(out)} arrays)")


if __name__ == "__main__":
    main()

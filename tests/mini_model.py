"""Tiny detector with the same (loc, conf) interface as SSD, for fast
tests of the step/parallelism machinery (compiles in seconds on the
1-core CPU test env, unlike the full 300x300 GSSD)."""

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gssd_tpu.config import AnchorConfig
from gssd_tpu.ops.anchors import make_anchors

MINI_ANCHORS = AnchorConfig(
    name="v2_mini",
    feature_maps=(8,),
    min_dim=64,
    steps=(8,),
    min_sizes=(16,),
    max_sizes=(32,),
    aspect_ratios=((2,),),
)


class MiniDetector(nn.Module):
    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        for feats in (8, 16, 32):
            x = nn.Conv(feats, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
        B = x.shape[0]
        nb = MINI_ANCHORS.num_priors_per_cell[0]
        loc = nn.Conv(nb * 4, (3, 3), padding="SAME")(x)
        conf = nn.Conv(nb * self.num_classes, (3, 3), padding="SAME")(x)
        return {
            "loc": loc.reshape(B, -1, 4).astype(jnp.float32),
            "conf": conf.reshape(B, -1, self.num_classes).astype(jnp.float32),
        }


def build_mini():
    return MiniDetector(), make_anchors(MINI_ANCHORS)


def mini_batch(rng, n, max_gt=4, size=64):
    img = rng.uniform(0, 1, (n, size, size, 12)).astype(np.float32)
    boxes = np.zeros((n, max_gt, 4), np.float32)
    labels = np.zeros((n, max_gt), np.int32)
    valid = np.zeros((n, max_gt), bool)
    for i in range(n):
        cx, cy = rng.uniform(0.3, 0.7, 2)
        w, h = rng.uniform(0.2, 0.4, 2)
        boxes[i, 0] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
        valid[i, 0] = True
        x0, y0 = int((cx - w / 2) * size), int((cy - h / 2) * size)
        x1, y1 = int((cx + w / 2) * size), int((cy + h / 2) * size)
        img[i, y0:y1, x0:x1, :] += 1.0
    return {"image": img, "boxes": boxes, "labels": labels, "valid": valid}

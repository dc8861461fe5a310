"""UNet liver-segmentation auxiliary model (flax, NHWC).

Reference: lib/unet.py (:9-143) — classic UNet with feature_scale-
divided filter widths [64,128,256,512,1024]/fs, double-conv (+BN+ReLU)
blocks, maxpool downs, deconv (or bilinear) ups with skip concats, and
a 1x1 class head; trained with pixel NLL (lib/loss_custom.py vendored
NLLLoss, utils/DEPRECATED/train_liverseg_unet.py harness). Used in the
reference as a liver-segmentation side experiment feeding ROI
extraction — kept here for pipeline completeness.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gssd_tpu.ops.layers import max_pool, xavier_uniform


class DoubleConv(nn.Module):
    features: int
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=xavier_uniform)(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=jnp.float32)(x).astype(self.dtype)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    n_classes: int = 2
    feature_scale: int = 4
    is_deconv: bool = True
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fs = self.feature_scale
        filters = [f // fs for f in (64, 128, 256, 512, 1024)]
        x = x.astype(self.dtype)

        skips = []
        for i, f in enumerate(filters[:-1]):
            x = DoubleConv(f, self.use_bn, self.dtype,
                           name=f"down_{i + 1}")(x, train)
            skips.append(x)
            x = max_pool(x, 2, 2)
        x = DoubleConv(filters[-1], self.use_bn, self.dtype,
                       name="center")(x, train)

        for i, f in reversed(list(enumerate(filters[:-1]))):
            if self.is_deconv:
                x = nn.ConvTranspose(f, (2, 2), strides=(2, 2),
                                     dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name=f"up_{i + 1}")(x)
            else:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
                x = nn.Conv(f, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"up_{i + 1}")(x)
            skip = skips[i]
            # center-crop the skip if shapes drifted (odd inputs)
            dh = skip.shape[1] - x.shape[1]
            dw = skip.shape[2] - x.shape[2]
            if dh or dw:
                skip = skip[:, dh // 2:dh // 2 + x.shape[1],
                            dw // 2:dw // 2 + x.shape[2]]
            x = jnp.concatenate([skip, x], axis=-1)
            x = DoubleConv(f, self.use_bn, self.dtype,
                           name=f"upconv_{i + 1}")(x, train)

        logits = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="final")(x)
        return logits


def segmentation_nll_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                          valid: jnp.ndarray = None,
                          class_weight: jnp.ndarray = None) -> jnp.ndarray:
    """Mean per-pixel negative log likelihood (reference
    loss_custom.NLLLoss over log-softmax maps).

    class_weight: optional [C] per-class weights with torch-NLLLoss
    semantics — weighted sum normalized by the summed weights of the
    target pixels (the liver-seg trainer passes per-batch balanced
    weights, train_liverseg_unet.py:90-117)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels = labels.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = jnp.ones_like(nll)
    if class_weight is not None:
        w = jnp.asarray(class_weight)[labels]
    if valid is not None:
        w = w * valid
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)

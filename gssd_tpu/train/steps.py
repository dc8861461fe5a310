"""Jitted train / eval / inference steps.

One fused program per step: forward (with BN + spectral-norm state
updates), on-device matching + OHNM multibox loss, backward, SGD update
— the TPU rebuild of the reference hot loop (train v2.py:194-253), which
did per-sample host matching and a CPU target copy each iteration.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from gssd_tpu.config import DetectConfig, LossConfig
from gssd_tpu.ops.losses import multibox_loss
from gssd_tpu.ops.nms import detect
from gssd_tpu.train.state import TrainState, step_lr_schedule


def make_train_step(
    model, priors, loss_cfg: LossConfig, optim_cfg=None
) -> Callable:
    priors = jnp.asarray(priors)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            out, mut = model.apply(
                {
                    "params": params,
                    "batch_stats": state.batch_stats,
                    "spectral": state.spectral,
                },
                batch["image"],
                train=True,
                mutable=["batch_stats", "spectral"],
            )
            loss_l, loss_c, aux = multibox_loss(
                out["loc"], out["conf"], priors,
                batch["boxes"], batch["labels"], batch["valid"],
                loss_cfg,
            )
            return loss_l + loss_c, (loss_l, loss_c, aux, mut)

        (loss, (loss_l, loss_c, aux, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        grad_norm = optax_global_norm(grads)
        new_state = state.apply_gradients(
            grads,
            batch_stats=mut.get("batch_stats", state.batch_stats),
            spectral=mut.get("spectral", state.spectral),
        )
        metrics = {
            "loss": loss,
            "loss_l": loss_l,
            "loss_c": loss_c,
            "grad_norm": grad_norm,
            "num_pos": aux["num_pos"],
        }
        if optim_cfg is not None:
            metrics["lr"] = step_lr_schedule(optim_cfg)(state.step)
        return new_state, metrics

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def make_eval_step(model, priors, loss_cfg: LossConfig) -> Callable:
    """Validation-loss step: eval-mode forward (frozen BN / spectral) +
    the same loss (reference valid loop, train v2.py:303-341)."""
    priors = jnp.asarray(priors)

    def eval_step(state: TrainState, batch):
        out = model.apply(state.variables(), batch["image"], train=False)
        loss_l, loss_c, aux = multibox_loss(
            out["loc"], out["conf"], priors,
            batch["boxes"], batch["labels"], batch["valid"], loss_cfg,
        )
        return {"loss": loss_l + loss_c, "loss_l": loss_l, "loss_c": loss_c}

    return eval_step


def make_pixellink_train_step(model, plc, optim_cfg=None) -> Callable:
    """PixelLink train step: forward + 2:1-weighted pixel/link loss
    (pixellink trainer :228-245) + SGD update, one jitted program."""
    from gssd_tpu.ops.pixellink_loss import pixellink_loss

    def train_step(state: TrainState, batch):
        targets = {
            k: batch[k]
            for k in ("pixel_mask", "neg_pixel_mask", "pixel_pos_weight",
                      "link_mask")
        }

        def loss_fn(params):
            out, mut = model.apply(
                {
                    "params": params,
                    "batch_stats": state.batch_stats,
                    "spectral": state.spectral,
                },
                batch["image"],
                train=True,
                mutable=["batch_stats", "spectral"],
            )
            loss, parts = pixellink_loss(
                out["pixel"], out["link"], targets,
                pixel_weight=plc.pixel_weight, link_weight=plc.link_weight,
                neg_pos_ratio=plc.neg_pos_ratio,
            )
            return loss, (parts, mut)

        (loss, (parts, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(
            grads,
            batch_stats=mut.get("batch_stats", state.batch_stats),
            spectral=mut.get("spectral", state.spectral),
        )
        metrics = {"loss": loss, "grad_norm": optax_global_norm(grads),
                   **parts}
        if optim_cfg is not None:
            metrics["lr"] = step_lr_schedule(optim_cfg)(state.step)
        return new_state, metrics

    return train_step


def make_pixellink_eval_step(model, plc) -> Callable:
    """Validation-loss step for PixelLink: eval-mode forward (frozen
    BN / spectral) + the same weighted pixel/link loss (reference
    pixellink trainer valid loop, :290-321)."""
    from gssd_tpu.ops.pixellink_loss import pixellink_loss

    def eval_step(state: TrainState, batch):
        targets = {
            k: batch[k]
            for k in ("pixel_mask", "neg_pixel_mask", "pixel_pos_weight",
                      "link_mask")
        }
        out = model.apply(state.variables(), batch["image"], train=False)
        loss, parts = pixellink_loss(
            out["pixel"], out["link"], targets,
            pixel_weight=plc.pixel_weight, link_weight=plc.link_weight,
            neg_pos_ratio=plc.neg_pos_ratio,
        )
        return {"loss": loss, **parts}

    return eval_step


def make_pixellink_forward_with_aux(model) -> Callable:
    """--visualize variant: (pixel, link) logits plus aux maps (DCN
    offsets, attention) for the dump path (test_ap_iobb.py:156-179)."""

    def forward(state: TrainState, images):
        out = model.apply(state.variables(), images, train=False)
        aux = {k: out[k] for k in ("offsets", "attn", "attn_base")
               if k in out}
        return out["pixel"], out["link"], aux

    return forward


def make_pixellink_forward(model) -> Callable:
    """Eval-mode forward returning (pixel_logits, link_logits) NHWC;
    host-side mask_to_boxes decodes them."""

    def forward(state: TrainState, images):
        out = model.apply(state.variables(), images, train=False)
        return out["pixel"], out["link"]

    return forward


def make_infer_step(model, priors, detect_cfg: DetectConfig) -> Callable:
    """Test-phase forward: softmax conf + decode + NMS on device,
    returning [B, C, top_k, 5] (the reference Detect output contract,
    detection_pytorch_ver_1point5.py:56)."""
    priors = jnp.asarray(priors)

    def infer_step(state: TrainState, images: jnp.ndarray):
        out = model.apply(state.variables(), images, train=False)
        conf = jax.nn.softmax(out["conf"], axis=-1)
        return detect(out["loc"], conf, priors, detect_cfg)

    return infer_step


def make_infer_step_with_aux(model, priors, detect_cfg: DetectConfig):
    """--visualize variant: also returns the model's aux maps (DCN
    offsets, attention) for the eval dump path (test_ap_iobb.py:156-179)."""
    priors = jnp.asarray(priors)

    def infer_step(state: TrainState, images: jnp.ndarray):
        out = model.apply(state.variables(), images, train=False)
        conf = jax.nn.softmax(out["conf"], axis=-1)
        det = detect(out["loc"], conf, priors, detect_cfg)
        aux = {k: out[k] for k in ("offsets", "attn", "attn_base")
               if k in out}
        return det, aux

    return infer_step

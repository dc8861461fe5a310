#!/usr/bin/env python
"""UNet liver-segmentation trainer (TPU-native mini-harness).

Rebuilds the reference's liver-segmentation side experiment
(utils/DEPRECATED/train_liverseg_unet.py:1-181): UNet (lib/unet.py) on
CT slices + liver masks, SGD(lr 1e-4, momentum 0.8, weight_decay 5e-4,
batch 8 — :18-25,70), per-batch class-balanced pixel NLL (:90-117;
intent: background weighted by the foreground pixel fraction), periodic
validation with loss logging (:146+). Data is the ml_ready npy contract
({id}_ct.npy [4,3,S,S] + {id}_mask.npy [S,S]) — the portal phase's
center slice is the single input channel (in_channels=1, :57) — instead
of the reference's one-off h5 cache (lib/datahandler.py); the split is
a deterministic slice-level holdout (:18-19,39 train_test_split).

Example:
  python train_unet.py --synthetic True --max_iter 200 --val_every 50
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def str2bool(v):
    return str(v).lower() in ("yes", "true", "t", "1")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="gssd_tpu UNet liver-seg trainer")
    p.add_argument("--datapath", default="", type=str)
    p.add_argument("--synthetic", default=False, type=str2bool)
    p.add_argument("--test_size", default=0.1, type=float,
                   help="validation slice fraction (reference :19)")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--momentum", default=0.8, type=float)
    p.add_argument("--weight_decay", default=5e-4, type=float)
    p.add_argument("--feature_scale", default=1, type=int,
                   help="UNet width divisor (the reference's float 0.5 "
                        "doubling is not supported; 1 = paper widths)")
    p.add_argument("--max_iter", default=2000, type=int)
    p.add_argument("--val_every", default=200, type=int)
    p.add_argument("--seed", default=1111, type=int)
    p.add_argument("--output", default="output", type=str)
    p.add_argument("--model_name", default="unet_liverseg", type=str)
    p.add_argument("--resume", default=None, type=int)
    p.add_argument("--compute_dtype", default="float32", type=str)
    return p.parse_args(argv)


def load_slices(datapath):
    """ml_ready dir -> (images [N, S, S, 1] f32 0..1, masks [N, S, S])."""
    ids = [line.split("|")[0] for line in
           open(os.path.join(datapath, "metadata.txt")).read().splitlines()
           if line]
    imgs, masks = [], []
    for rel in ids:
        ct = np.load(os.path.join(datapath, rel + "_ct.npy"))
        mask = np.load(os.path.join(datapath, rel + "_mask.npy"))
        imgs.append(ct[2, 1][..., None].astype(np.float32))  # portal, center
        masks.append((mask > 0).astype(np.int32))
    return np.stack(imgs), np.stack(masks)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gssd_tpu.config import OptimConfig
    from gssd_tpu.models.unet import UNet, segmentation_nll_loss
    from gssd_tpu.train import create_train_state
    from gssd_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from gssd_tpu.utils.logging import MetricsLogger

    if args.synthetic and not args.datapath:
        args.datapath = os.path.join(args.output, "synthetic_ml_ready")
    if args.synthetic and not os.path.exists(
            os.path.join(args.datapath, "metadata.txt")):
        from gssd_tpu.data.synthetic import make_synthetic_dataset

        print(f"generating synthetic dataset at {args.datapath}")
        make_synthetic_dataset(args.datapath)

    images, masks = load_slices(args.datapath)
    n = len(images)
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(n)
    n_val = max(1, int(n * args.test_size))
    val_idx, train_idx = order[:n_val], order[n_val:]
    print(f"{len(train_idx)} train / {n_val} valid slices of {images.shape}")

    model = UNet(n_classes=2, feature_scale=args.feature_scale,
                 dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16"
                 else jnp.float32)
    optim_cfg = OptimConfig(lr=args.lr, momentum=args.momentum,
                            weight_decay=args.weight_decay, stepvalues=())
    sample = jnp.zeros((1, *images.shape[1:]), jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), sample, optim_cfg)
    ckpt_dir = os.path.join(args.output, "checkpoints")
    start_iter = 0
    if args.resume is not None:
        state = restore_checkpoint(state, ckpt_dir, args.model_name,
                                   args.resume, 0)
        start_iter = args.resume
        print(f"resumed from iteration {args.resume}")

    logger = MetricsLogger(os.path.join(args.output, "logs",
                                        args.model_name))
    logger.log_args(vars(args))

    @jax.jit
    def train_step(state, x, y):
        # per-batch balanced class weights (reference :90-98 intent:
        # w_bg = foreground fraction, w_fg = 1 - w_bg)
        fg = jnp.mean(y.astype(jnp.float32))
        cw = jnp.stack([fg, 1.0 - fg])

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"])
            return segmentation_nll_loss(out, y, class_weight=cw), mut

        (loss, mut), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads, batch_stats=mut["batch_stats"])
        return new_state, loss

    @jax.jit
    def eval_step(state, x, y):
        out = model.apply(state.variables(), x, train=False)
        loss = segmentation_nll_loss(out, y)
        pred = jnp.argmax(out, -1)
        acc = jnp.mean((pred == y).astype(jnp.float32))
        inter = jnp.sum((pred == 1) & (y == 1))
        union = jnp.sum((pred == 1) | (y == 1))
        return loss, acc, inter / jnp.maximum(union, 1)

    def batches(idx, bs, seed):
        g = np.random.default_rng(seed)
        while True:
            for i in range(0, len(idx) - bs + 1, bs):
                sel = idx[i:i + bs]
                yield images[sel], masks[sel]
            idx = g.permutation(idx)

    stream = batches(train_idx, min(args.batch_size, len(train_idx)),
                     args.seed)
    t0, last = time.perf_counter(), start_iter
    for iteration in range(start_iter, args.max_iter):
        x, y = next(stream)
        state, loss = train_step(state, jnp.asarray(x), jnp.asarray(y))
        if iteration % 10 == 0:
            l = float(loss)
            dt = max(time.perf_counter() - t0, 1e-6)
            print(f"iter {iteration}: loss={l:.4f} "
                  f"{(iteration - last) * x.shape[0] / dt:.1f} slices/s")
            logger.log_scalars("loss", iteration, {"loss": l})
        if ((iteration % args.val_every == 0 and iteration > start_iter)
                or iteration == args.max_iter - 1):
            vl, va, vi = [], [], []
            vb = min(args.batch_size, n_val)
            for i in range(0, n_val - vb + 1, vb):
                sel = val_idx[i:i + vb]
                loss, acc, iou = eval_step(
                    state, jnp.asarray(images[sel]), jnp.asarray(masks[sel]))
                vl.append(float(loss))
                va.append(float(acc))
                vi.append(float(iou))
            res = {"loss": float(np.mean(vl)), "pixel_acc": float(np.mean(va)),
                   "fg_iou": float(np.mean(vi))}
            print(f"iter {iteration} valid: {json.dumps(res)}")
            logger.log_scalars("valid", iteration, res, file="valid")
            save_checkpoint(state, ckpt_dir, args.model_name, iteration, 0)
    logger.close()
    return res


if __name__ == "__main__":
    main()

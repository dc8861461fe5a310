#!/usr/bin/env python
"""Vanilla VOC SSD300 trainer — the upstream-fork baseline.

The reference repo descends from the amdegroot ssd.pytorch fork and
keeps its VOC path: the vanilla 3-channel 21-class SSD300
(models/ssd.py:194 build_ssd), the VOCdevkit dataset (data/voc0712.py:35
VOCDetection), and the mAP harness (eval.py). This CLI rebuilds that
end to end on the repo's machinery: VOCDataset -> SSDAugmentation (the
4D-aware pipeline with a single phase axis) -> BatchLoader ->
`ssd_type='ssd', num_phases=1, num_classes=21` model -> multibox loss
-> periodic VOC mAP (eval/voc_map.py) + checkpoints.

Example:
  python train_voc.py --voc_root VOCdevkit --max_iter 120000 \
      --lr 1e-3 --stepvalues 80000 100000
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
    p = argparse.ArgumentParser(description="gssd_tpu VOC SSD300 trainer")
    p.add_argument("--voc_root", default="VOCdevkit", type=str)
    p.add_argument("--train_sets", default="2007:trainval", type=str,
                   help="comma list of year:name image sets")
    p.add_argument("--eval_sets", default="2007:val", type=str)
    p.add_argument("--ssd_dim", default=300, type=int)
    p.add_argument("--num_classes", default=21, type=int)
    p.add_argument("--max_gt", default=50, type=int)
    p.add_argument("--means", default=114.0, type=float,
                   help="scalar pixel mean subtracted by the transform")
    p.add_argument("--use_normalize", default=False, type=str2bool)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--weight_decay", default=5e-4, type=float)
    p.add_argument("--stepvalues", nargs="*", type=int,
                   default=[80000, 100000])
    p.add_argument("--gamma", default=0.1, type=float)
    p.add_argument("--ohnm_neg_ratio", default=3, type=int)
    p.add_argument("--max_iter", default=120000, type=int)
    p.add_argument("--val_every", default=5000, type=int)
    p.add_argument("--speedrun", default=1, type=int)
    p.add_argument("--seed", default=1111, type=int)
    p.add_argument("--output", default="output", type=str)
    p.add_argument("--model_name", default="ssd300_voc", type=str)
    p.add_argument("--resume", default=None, type=int)
    p.add_argument("--compute_dtype", default="bfloat16", type=str)
    p.add_argument("--eval_batch", default=None, type=int)
    p.add_argument("--confidence_threshold", default=0.01, type=float)
    p.add_argument("--use_07_metric", default=True, type=str2bool)
    p.add_argument("--test", default=False, type=str2bool)
    p.add_argument("--checkpoint", default=None, type=int)
    return p.parse_args(argv)


def _sets(spec):
    return [tuple(s.split(":")) for s in spec.split(",") if s]


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gssd_tpu.config import LossConfig, DetectConfig, ModelConfig, OptimConfig
    from gssd_tpu.data.augment import SSDAugmentation
    from gssd_tpu.data.dataset import BatchLoader
    from gssd_tpu.data.transforms import BaseTransform
    from gssd_tpu.data.voc import VOCDataset
    from gssd_tpu.eval.voc_map import run_voc_map
    from gssd_tpu.models import build_model
    from gssd_tpu.parallel.mesh import (
        jit_plan_infer_step,
        jit_plan_train_step,
        plan_parallelism,
    )
    from gssd_tpu.train import create_train_state, make_train_step
    from gssd_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from gssd_tpu.train.steps import make_infer_step
    from gssd_tpu.utils.logging import MetricsLogger

    on_axon = "axon" in os.environ.get("JAX_PLATFORMS", "").lower()
    if os.environ.get("GSSD_EVAL_BATCH"):
        args.eval_batch = int(os.environ["GSSD_EVAL_BATCH"])
    elif args.eval_batch is None:
        args.eval_batch = 4 if on_axon else 16

    mcfg = ModelConfig(
        ssd_type="ssd", size=args.ssd_dim, num_classes=args.num_classes,
        num_phases=1, slices_per_phase=3, batch_norm=False,
        groups_vgg=1, groups_extra=1, use_fuseconv=False,
        compute_dtype=args.compute_dtype,
    )
    model, priors = build_model(mcfg)
    loss_cfg = LossConfig(num_classes=args.num_classes,
                          neg_pos_ratio=args.ohnm_neg_ratio,
                          max_gt_boxes=args.max_gt)
    optim_cfg = OptimConfig(
        lr=args.lr, momentum=args.momentum,
        weight_decay=args.weight_decay, gamma=args.gamma,
        stepvalues=tuple(args.stepvalues),
    )
    detect_cfg = DetectConfig(num_classes=args.num_classes)

    plan = plan_parallelism(1, args.batch_size)
    print(f"parallelism: {plan.describe()} layout={plan.layout}")

    base_tf = BaseTransform(args.ssd_dim, args.means, False,
                            args.use_normalize)
    eval_set = VOCDataset(args.voc_root, _sets(args.eval_sets),
                          keep_difficult=False)
    infer_step = jit_plan_infer_step(
        make_infer_step(model, priors, detect_cfg), plan, args.eval_batch)

    logger = MetricsLogger(os.path.join(args.output, "logs",
                                        args.model_name))
    logger.log_args(vars(args))
    ckpt_dir = os.path.join(args.output, "checkpoints")

    def eval_map(state, iteration):
        def infer_fn(batch):
            return infer_step(state, jnp.asarray(batch))

        res = run_voc_map(
            infer_fn, eval_set, base_tf, args.num_classes,
            args.confidence_threshold, 0.5, args.use_07_metric,
            args.eval_batch)
        logger.log_scalars("voc_map", iteration, res, file="test")
        print(f"iter {iteration} VOC mAP: {res['map']:.4f}")
        return res

    state = create_train_state(
        model, jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.ssd_dim, args.ssd_dim, mcfg.in_channels)),
        optim_cfg)
    start_iter = 0
    if args.resume is not None or (args.test and args.checkpoint):
        it = args.checkpoint if args.test else args.resume
        state = restore_checkpoint(state, ckpt_dir, args.model_name, it, 0)
        start_iter = it
        print(f"restored iteration {it}")
    if args.test:
        res = eval_map(state, start_iter)
        print(json.dumps(res))
        return res

    aug = SSDAugmentation(
        pixeljitter=0.0, ratio=1.5, size=args.ssd_dim, mean=args.means,
        use_normalize=args.use_normalize, seed=args.seed)
    train_set = VOCDataset(args.voc_root, _sets(args.train_sets),
                           transform=aug, keep_difficult=False)
    loader = iter(BatchLoader(train_set, args.batch_size, args.max_gt,
                              seed=args.seed))

    # single-model trainer: the vmapped fold machinery is unnecessary,
    # but the sharding plan still applies (batch on 'data')
    step_fn = make_train_step(model, priors, loss_cfg, optim_cfg)
    if plan.mesh is not None:
        import jax.sharding as jsh

        s = jsh.NamedSharding(plan.mesh, jsh.PartitionSpec())
        b = jsh.NamedSharding(plan.mesh, jsh.PartitionSpec("data"))
        train_step = jax.jit(step_fn, in_shardings=(s, b),
                             out_shardings=(s, s), donate_argnums=(0,))
    else:
        train_step = jax.jit(step_fn, donate_argnums=(0,))

    t0 = None
    res = {}
    for iteration in range(start_iter, args.max_iter):
        batch = next(loader)
        state, metrics = train_step(state, batch)
        if t0 is None:
            jax.block_until_ready(metrics["loss"])
            t0, it0 = time.perf_counter(), iteration
        if iteration % 10 == 0:
            m = {k: float(np.mean(np.asarray(v))) for k, v in metrics.items()}
            dt = max(time.perf_counter() - t0, 1e-6)
            sps = args.batch_size * max(iteration - it0, 1) / dt
            logger.log_scalars("loss", iteration, m)
            print(f"iter {iteration}: loss={m['loss']:.4f} "
                  f"(l={m['loss_l']:.4f} c={m['loss_c']:.4f}) "
                  f"{sps:.1f} img/s")
        last = iteration == args.max_iter - 1
        if ((iteration % args.val_every == 0 and iteration > start_iter)
                or last) and iteration >= args.speedrun:
            res = eval_map(state, iteration)
            save_checkpoint(state, ckpt_dir, args.model_name, iteration, 0)
    logger.close()
    return res


if __name__ == "__main__":
    main()

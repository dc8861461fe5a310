#!/usr/bin/env python
"""GSSD / GSSD++ training & evaluation harness (TPU-native).

The rebuild of the reference CLI train_lesion_multiphase_v2.py: same
public flag surface (ssd_type / use_self_attention / groups_dcn / ... ,
v2.py:31-113), k-fold cross-validation, periodic valid/test AP-IoBB
evaluation, checkpoint/resume, speedrun, and test-only mode — but the
hot loop is one jitted program: all k folds advance as a vmapped fold
axis, the batch is sharded data-parallel over the device mesh, and
matching/OHNM/NMS never leave the device.

Example (GSSD++):
  python train.py --ssd_type gssd --batch_norm True --use_fuseconv True \
      --use_self_attention True --use_self_attention_base True \
      --num_dcn_layers 1 --groups_dcn 4 --dcn_cat_sab True \
      --use_normalize True --datapath <ml_ready> --max_iter 60000
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def str2bool(v):
    return str(v).lower() in ("yes", "true", "t", "1")


def build_parser():
    p = argparse.ArgumentParser(description="gssd_tpu trainer")
    # data
    p.add_argument("--datapath", default="", type=str)
    p.add_argument("--synthetic", default=False, type=str2bool,
                   help="generate a synthetic ml_ready dataset in-place")
    p.add_argument("--load_data_to_ram", default=False, type=str2bool)
    p.add_argument("--num_workers", default=1, type=int)
    p.add_argument("--means", default=0.0, type=float)
    p.add_argument("--use_normalize", default=True, type=str2bool)
    p.add_argument("--p_only", default=False, type=str2bool)
    p.add_argument("--gt_pixel_jitter", default=0.01, type=float)
    p.add_argument("--expand_ratio", default=1.5, type=float)
    p.add_argument("--max_gt", default=16, type=int)
    p.add_argument("--aug_method", default="host",
                   choices=["host", "vanilla", "device", "device_cached"],
                   help="'host'/'vanilla' = numpy pipeline; 'device' = "
                        "jitted on-TPU warp (revival of the reference's "
                        "deprecated CUDA augmentation); 'device_cached' = "
                        "device-resident dataset + on-TPU warp (no "
                        "per-step image H2D; caps at GSSD_DEVICE_CACHE_GB)")
    # model
    p.add_argument("--ssd_type", default="gssd",
                   choices=["gssd", "ssd", "fssd", "groupfssd", "fusedssd"])
    p.add_argument("--ssd_dim", default=300, type=int)
    p.add_argument("--num_classes", default=2, type=int)
    p.add_argument("--batch_norm", default=True, type=str2bool)
    p.add_argument("--groups_vgg", default=4, type=int)
    p.add_argument("--groups_extra", default=4, type=int)
    p.add_argument("--feature_scale", default=1, type=int)
    p.add_argument("--use_fuseconv", default=True, type=str2bool)
    p.add_argument("--use_self_attention", default=False, type=str2bool)
    p.add_argument("--use_self_attention_base", default=False, type=str2bool)
    p.add_argument("--num_dcn_layers", default=0, type=int)
    p.add_argument("--groups_dcn", default=1, type=int)
    p.add_argument("--dcn_cat_sab", default=False, type=str2bool)
    p.add_argument("--detach_sab", default=False, type=str2bool)
    p.add_argument("--max_pool_factor", default=1, type=int)
    p.add_argument("--remat_attention", default=False, type=str2bool,
                   help="jax.checkpoint the attention blocks (memory/"
                        "compute trade-off; the reference checkpoints "
                        "only PixelLink attention, model.py:203)")
    p.add_argument("--compute_dtype", default="bfloat16", type=str)
    p.add_argument("--dcn_impl", default="hat",
                   choices=["xla", "pallas", "fused", "hat"])
    # optimization — defaults are the published recipe (README.md:51-90:
    # batch 32, 60k iters, lr 1e-3 x0.1 @ 30k/50k, OHNM 3:1)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--lr", "--learning-rate", default=1e-3, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--weight_decay", default=5e-4, type=float)
    p.add_argument("--stepvalues", nargs="*", type=int,
                   default=[30000, 50000])
    p.add_argument("--gamma", default=0.1, type=float)
    p.add_argument("--clip", default=None, type=float)
    p.add_argument("--modify_dcn_lr", default=False, type=str2bool)
    p.add_argument("--ohnm_neg_ratio", default=3, type=int)
    p.add_argument("--jaccard_threshold", default=0.5, type=float)
    # harness
    p.add_argument("--max_iter", default=60000, type=int)
    p.add_argument("--val_every", default=500, type=int)
    p.add_argument("--speedrun", default=1, type=int)
    p.add_argument("--cross_validation", default=1, type=int)
    p.add_argument("--num_test_subjects", default=10, type=int)
    p.add_argument("--start_iter", default=0, type=int)
    p.add_argument("--resume", default=None, type=int,
                   help="iteration to resume from. Exact-resume of the "
                        "data-stream order additionally needs "
                        "--num_workers > 1 (the MP loader's stream is a "
                        "pure function of the batch index; the thread "
                        "loader restarts its stream from batch 0)")
    p.add_argument("--seed", default=1111, type=int)
    p.add_argument("--output", default="output", type=str)
    p.add_argument("--model_name", default="gssd", type=str)
    p.add_argument("--log_iters", default=True, type=str2bool)
    p.add_argument("--profile_dir", default=None, type=str,
                   help="capture a jax.profiler (xplane) trace of steps "
                        "20-30 into this directory (view with "
                        "tensorboard-plugin-profile / xprof)")
    # eval
    p.add_argument("--test", default=False, type=str2bool)
    p.add_argument("--checkpoint", default=None, type=int)
    p.add_argument("--confidence_threshold", default=0.2, type=float)
    p.add_argument("--use_07_metric", default=False, type=str2bool)
    p.add_argument("--ap_list", default="0.3,0.5,0.7", type=str)
    p.add_argument("--iobb_list", default="0.3,0.5,0.7", type=str)
    p.add_argument("--visualize", default=False, type=str2bool)
    p.add_argument("--eval_batch", default=None, type=int,
                   help="inference batch for AP eval (default 16; 4 on "
                        "the axon backend, whose worker crashes loading "
                        "the full infer executable at b16 — STATUS.md). "
                        "The GSSD_EVAL_BATCH env var overrides both")
    p.add_argument("--warmup_eval", default=False, type=str2bool,
                   help="pre-compile eval/infer executables at startup")
    p.add_argument("--reference_recipe", default=None,
                   choices=["gssd", "gssd++"],
                   help="preset the full published training command "
                        "(README.md:51-90); explicit flags still override")
    return p


# Published training commands, verbatim flag sets (reference README.md:51-90).
REFERENCE_RECIPES = {
    "gssd": dict(
        ssd_type="gssd", use_normalize=True,
        use_self_attention=False, use_self_attention_base=False,
        num_dcn_layers=0, dcn_cat_sab=False,
        batch_size=32, max_iter=60000, stepvalues=[30000, 50000],
        gamma=0.1, lr=1e-3, gt_pixel_jitter=0.0, speedrun=4999,
        ohnm_neg_ratio=3, cross_validation=1,
        use_07_metric=False, confidence_threshold=0.2,
        ap_list="0.3,0.5,0.7", iobb_list="0.3,0.5,0.7",
        model_name="GSSD",
    ),
    "gssd++": dict(
        ssd_type="gssd", use_normalize=True,
        use_self_attention=True, use_self_attention_base=True,
        groups_dcn=4, num_dcn_layers=1, dcn_cat_sab=True,
        modify_dcn_lr=True,
        batch_size=32, max_iter=60000, stepvalues=[30000, 50000],
        gamma=0.1, lr=1e-3, gt_pixel_jitter=0.0, speedrun=4999,
        ohnm_neg_ratio=3, cross_validation=1,
        use_07_metric=False, confidence_threshold=0.2,
        ap_list="0.3,0.5,0.7", iobb_list="0.3,0.5,0.7",
        model_name="GSSD_plusplus",
    ),
}


def parse_args(argv=None):
    """Two-pass parse: if --reference_recipe is given, install the
    published flag set as defaults, then re-parse so anything the user
    typed explicitly still wins."""
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.reference_recipe is not None:
        parser.set_defaults(**REFERENCE_RECIPES[args.reference_recipe])
        args = parser.parse_args(argv)
    return args


def model_config(args):
    from gssd_tpu.config import ModelConfig

    return ModelConfig(
        ssd_type=args.ssd_type,
        size=args.ssd_dim,
        num_classes=args.num_classes,
        batch_norm=args.batch_norm,
        groups_vgg=args.groups_vgg,
        groups_extra=args.groups_extra,
        feature_scale=args.feature_scale,
        use_fuseconv=args.use_fuseconv,
        use_self_attention=args.use_self_attention,
        use_self_attention_base=args.use_self_attention_base,
        num_dcn_layers=args.num_dcn_layers,
        groups_dcn=args.groups_dcn,
        dcn_cat_sab=args.dcn_cat_sab,
        detach_sab=args.detach_sab,
        max_pool_factor=args.max_pool_factor,
        remat_attention=args.remat_attention,
        compute_dtype=args.compute_dtype,
        dcn_impl=args.dcn_impl,
    )


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gssd_tpu.config import DetectConfig, LossConfig, OptimConfig
    from gssd_tpu.data import BaseTransform, DataSplitter, LesionDataset
    from gssd_tpu.data.augment import SSDAugmentation
    from gssd_tpu.data.dataset import BatchLoader
    from gssd_tpu.eval import run_detection_eval
    from gssd_tpu.models import build_model
    from gssd_tpu.parallel.folds import stack_states, unstack_state, vmap_train_step
    from gssd_tpu.parallel.mesh import (
        jit_plan_eval_step,
        jit_plan_infer_step,
        jit_plan_train_step,
        plan_parallelism,
    )
    from gssd_tpu.train import create_train_state, make_train_step
    from gssd_tpu.train.checkpoint import (
        load_weights_partial,
        restore_checkpoint,
        save_checkpoint,
    )
    from gssd_tpu.train.steps import make_eval_step, make_infer_step
    from gssd_tpu.utils.logging import MetricsLogger

    if args.synthetic and not args.datapath:
        args.datapath = os.path.join(args.output, "synthetic_ml_ready")
    if args.synthetic and not os.path.exists(
        os.path.join(args.datapath, "metadata.txt")
    ):
        from gssd_tpu.data.synthetic import make_synthetic_dataset

        print(f"generating synthetic dataset at {args.datapath}")
        make_synthetic_dataset(args.datapath)

    k = args.cross_validation
    ap_list = [float(t) for t in args.ap_list.split(",")]
    iobb_list = [float(t) for t in args.iobb_list.split(",")]
    on_axon = "axon" in os.environ.get("JAX_PLATFORMS", "").lower()
    if os.environ.get("GSSD_EVAL_BATCH"):
        # env override outranks the heuristic (STATUS r2 lead: lets an
        # operator tune eval chunking without editing run commands)
        args.eval_batch = int(os.environ["GSSD_EVAL_BATCH"])
    elif args.eval_batch is None:
        # the tunneled axon worker crashes loading the full infer
        # executable at b16 once degraded (STATUS.md); b4 is reliable
        args.eval_batch = 4 if on_axon else 16

    logger = MetricsLogger(os.path.join(args.output, "logs", args.model_name))
    logger.log_args(vars(args))

    mcfg = model_config(args)
    loss_cfg = LossConfig(
        num_classes=args.num_classes,
        overlap_thresh=args.jaccard_threshold,
        neg_pos_ratio=args.ohnm_neg_ratio,
        max_gt_boxes=args.max_gt,
    )
    detect_cfg = DetectConfig(num_classes=args.num_classes)
    optim_cfg = OptimConfig(
        lr=args.lr,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        gamma=args.gamma,
        stepvalues=tuple(args.stepvalues),
        clip=args.clip,
        modify_dcn_lr=args.modify_dcn_lr,
    )

    model, priors = build_model(mcfg)
    splitter = DataSplitter(args.datapath, k, args.num_test_subjects)

    base_tf = BaseTransform(
        args.ssd_dim, args.means, args.p_only, args.use_normalize
    )
    test_set = LesionDataset(args.datapath, splitter.data_test)
    valid_sets = [
        LesionDataset(args.datapath, ids) for ids in splitter.data_cv_eval
    ]

    # SPMD layout from the runtime device count (torch DataParallel
    # analog, v2.py:593): fold axis and/or batch sharded over the mesh
    plan = plan_parallelism(k, args.batch_size)
    print(f"parallelism: {plan.describe()} layout={plan.layout}")
    infer_step = jit_plan_infer_step(
        make_infer_step(model, priors, detect_cfg), plan, args.eval_batch)

    def eval_fold(state, dataset, tag, iteration):
        def infer_fn(batch):
            return infer_step(state, jnp.asarray(batch))

        sink = {}
        res = run_detection_eval(
            infer_fn, dataset, base_tf, ap_list, iobb_list,
            args.confidence_threshold, args.use_07_metric, args.eval_batch,
            score_sink=sink,
        )
        logger.log_scalars(tag, iteration, res, file="test")
        # detection-score histograms pre/post confidence filter
        # (reference test_ap_iobb.py:201-207)
        logger.log_histogram(f"{tag}/scores_raw", iteration,
                             sink.get("raw", []))
        logger.log_histogram(f"{tag}/scores_filtered", iteration,
                             sink.get("filtered", []))
        return res

    ckpt_dir = os.path.join(args.output, "checkpoints")

    if args.test:
        assert args.checkpoint is not None, "--test requires --checkpoint"
        results = []
        for fold in range(k):
            state = create_train_state(
                model, jax.random.PRNGKey(args.seed),
                jnp.zeros((1, args.ssd_dim, args.ssd_dim, mcfg.in_channels)),
                optim_cfg,
            )
            state = load_weights_partial(
                state, ckpt_dir, args.model_name, args.checkpoint, fold
            )
            if args.visualize and fold == 0:
                from gssd_tpu.train.steps import make_infer_step_with_aux
                from gssd_tpu.utils.visualize import dump_eval_visuals

                vstep = jax.jit(
                    make_infer_step_with_aux(model, priors, detect_cfg))
                vdir = os.path.join(args.output, "visualize",
                                    args.model_name)
                for idx in range(len(test_set)):
                    raw = test_set.pull_image(idx)
                    anno = test_set.pull_anno(idx)
                    x, _, _ = base_tf(raw)
                    p, h, w, c = x.shape
                    img = np.transpose(x, (1, 2, 0, 3)).reshape(h, w, p * c)
                    det, aux = vstep(state, jnp.asarray(img[None],
                                                        jnp.float32))
                    scale = args.ssd_dim / raw.shape[1]
                    dump_eval_visuals(
                        vdir, idx, img, anno[:, :4] * scale,
                        np.asarray(det[0]),
                        offsets=[np.asarray(o[0]) for o in
                                 aux.get("offsets", [])] or None,
                        attn=[np.asarray(a[0]) for a in
                              aux.get("attn", [])] or None,
                        attn_base=[np.asarray(a[0]) for a in
                                   aux.get("attn_base", [])] or None,
                        conf_threshold=args.confidence_threshold,
                        image_size=args.ssd_dim,
                    )
                print(f"visualize dumps written to {vdir}")
            res = eval_fold(state, test_set, f"test_ap_cv{fold}",
                            args.checkpoint)
            print(f"[fold {fold}] {res}")
            results.append(res)
        mean = {key: float(np.mean([r[key] for r in results]))
                for key in results[0]}
        print("test mean over folds:", json.dumps(mean))
        return mean

    # ---- training ------------------------------------------------------
    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((1, args.ssd_dim, args.ssd_dim, mcfg.in_channels))
    states = []
    for fold in range(k):
        fold_rng = jax.random.fold_in(rng, fold)
        states.append(create_train_state(model, fold_rng, sample, optim_cfg))
    start_iter = args.start_iter
    if args.resume is not None:
        states = [
            restore_checkpoint(s, ckpt_dir, args.model_name, args.resume, i)
            for i, s in enumerate(states)
        ]
        start_iter = args.resume
        print(f"resumed from iteration {args.resume}")
    stacked = plan.put_state(stack_states(states))

    def make_train_loader(args, ds, seed, collate_fn=None):
        """--num_workers > 1 selects the multi-process loader (the
        reference's DataLoader(num_workers) analog, train v2.py:538);
        otherwise the single prefetch-thread loader. The MP batch
        stream is deterministic per (seed) but differs from the
        thread loader's (per-batch reseeding vs one continuous RNG)."""
        from gssd_tpu.data.dataset import MPBatchLoader

        if args.num_workers > 1:
            return MPBatchLoader(
                ds, args.batch_size, args.max_gt, seed=seed,
                collate_fn=collate_fn, num_workers=args.num_workers,
                start_batch=args.resume or args.start_iter or 0,
            )
        return BatchLoader(
            ds, args.batch_size, args.max_gt, seed=seed,
            collate_fn=collate_fn,
        )

    device_aug = None
    if args.aug_method == "device":
        from gssd_tpu.data.augment_device import DeviceAugmentation
        from gssd_tpu.data.dataset import collate_raw

        probe = LesionDataset(args.datapath, splitter.data_train[:1])
        src_size = probe.pull_image(0).shape[1]
        device_aug = [
            DeviceAugmentation(
                size=args.ssd_dim, src_size=src_size,
                pixeljitter=args.gt_pixel_jitter, ratio=args.expand_ratio,
                mean=args.means, use_normalize=args.use_normalize,
                seed=args.seed + i, max_gt=args.max_gt,
            )
            for i in range(k)
        ]
        loader_objs = [
            make_train_loader(
                args,
                LesionDataset(args.datapath, ids,
                              load_to_ram=args.load_data_to_ram),
                seed=args.seed + i, collate_fn=collate_raw,
            )
            for i, ids in enumerate(splitter.data_cv_train)
        ]
    elif args.aug_method == "device_cached":
        from gssd_tpu.data.device_cache import DeviceCacheLoader

        loader_objs = [
            DeviceCacheLoader(
                LesionDataset(args.datapath, ids),
                args.batch_size, size=args.ssd_dim, max_gt=args.max_gt,
                seed=args.seed + i, pixeljitter=args.gt_pixel_jitter,
                ratio=args.expand_ratio, mean=args.means,
                use_normalize=args.use_normalize,
                start_batch=args.resume or args.start_iter or 0,
            )
            for i, ids in enumerate(splitter.data_cv_train)
        ]
    else:
        # one augmentation pipeline (and numpy Generator) per fold: each
        # BatchLoader prefetches on its own thread, and numpy Generators
        # are not thread-safe, so sharing one across folds would corrupt
        # the seeded streams (mirrors the DeviceAugmentation path above)
        augs = [
            SSDAugmentation(
                pixeljitter=args.gt_pixel_jitter,
                ratio=args.expand_ratio,
                size=args.ssd_dim,
                mean=args.means,
                use_normalize=args.use_normalize,
                p_only=args.p_only,
                seed=args.seed + i,
            )
            for i in range(k)
        ]
        loader_objs = [
            make_train_loader(
                args,
                LesionDataset(args.datapath, ids, transform=augs[i],
                              load_to_ram=args.load_data_to_ram),
                seed=args.seed + i,
            )
            for i, ids in enumerate(splitter.data_cv_train)
        ]
    loaders = [iter(lo) for lo in loader_objs]
    # terminate MP loader workers explicitly at exit (daemon kill leaves
    # queue feeder threads mid-put and emits noisy errors at teardown)
    import atexit

    for lo in loader_objs:
        if hasattr(lo, "shutdown"):
            atexit.register(lo.shutdown)
    valid_loaders = [
        iter(BatchLoader(
            LesionDataset(args.datapath, ids, transform=base_tf),
            args.batch_size, args.max_gt, seed=args.seed + 100 + i,
        ))
        for i, ids in enumerate(splitter.data_cv_eval)
    ]

    step_fn = make_train_step(model, priors, loss_cfg, optim_cfg)
    train_step = jit_plan_train_step(vmap_train_step(step_fn), plan)
    eval_step = jit_plan_eval_step(
        jax.vmap(make_eval_step(model, priors, loss_cfg)), plan)

    # Optionally compile the eval/infer executables up front. Off by
    # default: on the tunneled axon worker, executing eval graphs built
    # against a pre-donation state correlated with worker crashes
    # (STATUS.md #6); on healthy hosts it simply front-loads compiles.
    if args.warmup_eval and (args.val_every <= args.max_iter
                             and args.speedrun <= args.max_iter):
        warm = {
            "image": np.zeros(
                (k, args.batch_size, args.ssd_dim, args.ssd_dim,
                 mcfg.in_channels), np.float32),
            "boxes": np.tile(
                np.asarray([0.3, 0.3, 0.6, 0.6], np.float32),
                (k, args.batch_size, args.max_gt, 1)),
            "labels": np.zeros((k, args.batch_size, args.max_gt), np.int32),
            "valid": np.ones((k, args.batch_size, args.max_gt), bool),
        }
        jax.block_until_ready(eval_step(stacked, warm)["loss"])
        jax.block_until_ready(infer_step(
            unstack_state(stacked, 0),
            jnp.zeros((args.eval_batch, args.ssd_dim, args.ssd_dim,
                       mcfg.in_channels), jnp.float32),
        ))
        print("eval executables warmed")

    def fold_batch(iters, augs=None):
        bs = [next(it) for it in iters]
        if augs is not None:
            bs = [
                augs[i](b["raw_image"], b["boxes_list"], b["labels_list"])
                for i, b in enumerate(bs)
            ]
            return {
                key: (jnp.stack([b[key] for b in bs]) if key == "image"
                      else np.stack([b[key] for b in bs]))
                for key in bs[0]
            }
        # device-resident leaves (DeviceCacheLoader images) stack on
        # device; host leaves stack on host
        out = {}
        for key in bs[0]:
            vals = [b[key] for b in bs]
            out[key] = (np.stack(vals) if isinstance(vals[0], np.ndarray)
                        else jnp.stack(vals))
        return out

    grid_src = {}  # host-side copy for the TB input grid (fold 0)

    # images are consumed as compute_dtype on device, so ship them in
    # that dtype: halves H2D bytes losslessly (the tunnel moves ~22MB/s;
    # an f32 b8 batch costs ~1.5s of transfer per step)
    wire_dtype = None
    if args.compute_dtype == "bfloat16":
        import ml_dtypes

        wire_dtype = ml_dtypes.bfloat16

    def batch_stream():
        count = 0
        while True:
            b = fold_batch(loaders, device_aug)
            if isinstance(b["image"], np.ndarray):
                # keep a host copy so the periodic TB grid never pulls
                # the device_put batch back over the tunnel — but only
                # every 25th batch (the grid logs every 100 iters;
                # copying tens of MB per step just burns host bandwidth)
                if logger.tb is not None and count % 25 == 0:
                    grid_src["image"] = b["image"][0].copy()
                    grid_src["boxes"] = b["boxes"][0].copy()
                    grid_src["valid"] = b["valid"][0].copy()
                if wire_dtype is not None:
                    b["image"] = b["image"].astype(wire_dtype)
            count += 1
            yield b

    # H2D rides under compute: transfer the next batches while the
    # current step runs (torch DataLoader pin_memory+prefetch analog)
    from gssd_tpu.data.dataset import device_prefetch

    batches = device_prefetch(batch_stream(), size=2,
                              sharding=plan.batch_sharding())

    t_start = None  # set after the first (compile) step
    input_wait = 0.0  # host time blocked waiting for the next batch
    trace_open = False
    metrics = {"loss": jnp.zeros(())}
    for iteration in range(start_iter, args.max_iter):
        if args.profile_dir and iteration - start_iter == 20:
            jax.profiler.start_trace(args.profile_dir)
            trace_open = True
        if args.profile_dir and trace_open and (
                iteration - start_iter == 30
                or iteration == args.max_iter - 1):
            # np.asarray forces a D2H sync (block_until_ready is a
            # no-op over the axon tunnel — CLAUDE.md)
            np.asarray(metrics["loss"])
            jax.profiler.stop_trace()
            trace_open = False
            print(f"xplane trace written to {args.profile_dir}")
        t_in = time.perf_counter()
        batch = next(batches)
        input_wait += time.perf_counter() - t_in
        stacked, metrics = train_step(stacked, batch)
        if t_start is None:
            jax.block_until_ready(metrics["loss"])
            t_start = time.perf_counter()
            t_iters = iteration
            input_wait = 0.0

        if args.log_iters and iteration % 10 == 0:
            m = {key: float(np.mean(np.asarray(v)))
                 for key, v in metrics.items()}
            dt = max(time.perf_counter() - t_start, 1e-6)
            sps = args.batch_size * k * max(iteration - t_iters, 1) / dt
            wait_frac = input_wait / dt
            logger.log_scalars("loss", iteration, m)
            logger.log_scalars("meta", iteration,
                               {"input_wait_frac": wait_frac})
            print(f"iter {iteration}: loss={m['loss']:.4f} "
                  f"(l={m['loss_l']:.4f} c={m['loss_c']:.4f}) "
                  f"lr={m.get('lr', 0):.2e} {sps:.1f} slices/s "
                  f"input_wait={wait_frac * 100:.0f}%")

        if iteration % 100 == 0 and logger.tb is not None:
            # input-image grid with gt boxes, fold 0 (train v2.py:294-298).
            # With device-resident batches on the tunneled backend the
            # D2H pull costs ~1.5 s — skip the fallback there.
            from gssd_tpu.utils.visualize import input_grid_with_boxes

            if "image" in grid_src:
                src = grid_src
            elif not on_axon:
                src = {
                    "image": np.asarray(batch["image"][0]),
                    "boxes": np.asarray(batch["boxes"][0]),
                    "valid": np.asarray(batch["valid"][0]),
                }
            else:
                src = None
            if src is not None:
                panel = input_grid_with_boxes(
                    src["image"], src["boxes"], src["valid"])
                logger.log_image("inputs/train_fold0", iteration, panel)

        last = iteration == args.max_iter - 1
        if ((iteration % args.val_every == 0 and iteration > start_iter)
                or last) and iteration >= args.speedrun:
            # NOTE: if the runtime dies here with "TPU worker process
            # crashed", the eval compile exceeded worker memory on top
            # of the live training state — lower --eval_batch /
            # --batch_size (see STATUS.md #6)
            if on_axon:
                # don't launch the eval executables into a worker
                # outage; probe and wait it out (self-recovers)
                from gssd_tpu.utils.device_health import (
                    wait_for_healthy_device,
                )

                wait_for_healthy_device()
            vbatch = fold_batch(valid_loaders)
            vm = eval_step(stacked, vbatch)
            logger.log_scalars(
                "eval_loss", iteration,
                {key: float(np.mean(np.asarray(v))) for key, v in vm.items()},
                file="valid",
            )
            ap_accum = []
            for fold in range(k):
                st = unstack_state(stacked, fold)
                res_v = eval_fold(st, valid_sets[fold],
                                  f"eval_ap_cv{fold}", iteration)
                res_t = eval_fold(st, test_set, f"test_ap_cv{fold}",
                                  iteration)
                ap_accum.append((res_v, res_t))
                save_checkpoint(st, ckpt_dir, args.model_name, iteration, fold)
            mean_v = {key: float(np.mean([a[0][key] for a in ap_accum]))
                      for key in ap_accum[0][0]}
            mean_t = {key: float(np.mean([a[1][key] for a in ap_accum]))
                      for key in ap_accum[0][1]}
            logger.log_scalars("eval_ap", iteration, mean_v, file="valid")
            logger.log_scalars("test_ap", iteration, mean_t, file="test")
            print(f"iter {iteration} valid: {json.dumps(mean_v)}")
            print(f"iter {iteration} test:  {json.dumps(mean_t)}")

    logger.close()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""PixelLink++ training & evaluation harness (TPU-native).

Rebuild of the reference CLI train_lesion_multiphase_v2_pixellink.py:
same flag surface (cascade_fuse / use_fuseconv / use_self_attention /
num_dcn_layers / ..., :31-121), k-fold CV as a vmapped fold axis,
2:1-weighted pixel/link loss (:228-245), periodic AP/IoBB eval through
the union-find mask decoder, checkpoint/resume, and test-only mode.
"""

from __future__ import annotations

import json
import os

import numpy as np

from train import str2bool


def build_parser():
    import argparse

    p = argparse.ArgumentParser(description="gssd_tpu pixellink trainer")
    p.add_argument("--datapath", default="", type=str)
    p.add_argument("--synthetic", default=False, type=str2bool)
    p.add_argument("--load_data_to_ram", default=False, type=str2bool)
    p.add_argument("--num_workers", default=1, type=int)
    p.add_argument("--means", default=0.0, type=float)
    p.add_argument("--use_normalize", default=True, type=str2bool)
    p.add_argument("--p_only", default=False, type=str2bool)
    p.add_argument("--gt_pixel_jitter", default=0.01, type=float)
    p.add_argument("--expand_ratio", default=1.5, type=float)
    p.add_argument("--max_gt", default=16, type=int)
    p.add_argument("--ssd_dim", default=300, type=int)
    # pixellink arch (reference pixel_link_config.py + trainer flags)
    p.add_argument("--version", default="4s", choices=["2s", "4s"])
    p.add_argument("--cascade_fuse", default=False, type=str2bool)
    p.add_argument("--batch_norm", default=True, type=str2bool)
    p.add_argument("--use_fuseconv", default=True, type=str2bool)
    p.add_argument("--use_self_attention", default=False, type=str2bool)
    p.add_argument("--use_self_attention_base", default=False, type=str2bool)
    p.add_argument("--num_dcn_layers", default=0, type=int)
    p.add_argument("--groups_dcn", default=1, type=int)
    p.add_argument("--dcn_cat_sab", default=False, type=str2bool)
    p.add_argument("--detach_sab", default=False, type=str2bool)
    p.add_argument("--max_pool_factor", default=1, type=int)
    p.add_argument("--remat_attention", default=True, type=str2bool,
                   help="jax.checkpoint the attention blocks (reference "
                        "wraps every PixelLink Self_Attn in "
                        "torch.utils.checkpoint, model.py:203)")
    p.add_argument("--vgg_groups", default=4, type=int)
    p.add_argument("--feature_scale", default=1, type=int)
    p.add_argument("--compute_dtype", default="bfloat16", type=str)
    p.add_argument("--dcn_impl", default="hat",
                   choices=["xla", "pallas", "fused", "hat"])
    p.add_argument("--pixel_weight", default=2.0, type=float)
    p.add_argument("--link_weight", default=1.0, type=float)
    p.add_argument("--neg_pos_ratio", default=3, type=int)
    # optimization / harness
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--lr", default=5e-4, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--weight_decay", default=5e-4, type=float)
    # reference pixellink trainer default: no LR decay (:76 uses a
    # sentinel stepvalue of 9999999999999; here no-decay is an empty
    # list — a giant sentinel overflows the int32 schedule counter)
    p.add_argument("--stepvalues", nargs="*", type=int, default=[])
    p.add_argument("--gamma", default=0.1, type=float)
    p.add_argument("--clip", default=None, type=float)
    p.add_argument("--modify_dcn_lr", default=False, type=str2bool)
    p.add_argument("--max_iter", default=10001, type=int)
    p.add_argument("--val_every", default=500, type=int)
    p.add_argument("--speedrun", default=1, type=int)
    p.add_argument("--cross_validation", default=1, type=int)
    p.add_argument("--num_test_subjects", default=10, type=int)
    p.add_argument("--resume", default=None, type=int)
    p.add_argument("--seed", default=1115, type=int)
    p.add_argument("--output", default="output", type=str)
    p.add_argument("--model_name", default="pixellink", type=str)
    p.add_argument("--test", default=False, type=str2bool)
    p.add_argument("--checkpoint", default=None, type=int)
    p.add_argument("--confidence_threshold", default=0.01, type=float)
    # reference pixellink trainer default: correct-AUC AP, not the VOC07
    # 11-point metric (:104 use_07_metric default False)
    p.add_argument("--use_07_metric", default=False, type=str2bool)
    p.add_argument("--ap_list", default="0.5", type=str)
    p.add_argument("--iobb_list", default="0.5", type=str)
    p.add_argument("--eval_batch", default=16, type=int,
                   help="inference batch for AP eval; the "
                        "GSSD_EVAL_BATCH env var overrides")
    p.add_argument("--visualize", default=False, type=str2bool,
                   help="with --test: dump x/annotation/attention/offset "
                        "npys + detection jpgs (test_ap_iobb.py:156-179)")
    p.add_argument("--reference_recipe", default=None,
                   choices=["pixellink", "pixellink++"],
                   help="preset the reference PixelLink training protocol "
                        "(trainer defaults :28-121 + paper-variant model "
                        "flags); explicit flags still override")
    return p


# Reference pixellink trainer defaults (:28-121) + the paper's variant
# flags: 'pixellink' is the vanilla (ungrouped, no fusion) baseline row of
# pics/gssdpp4.png; 'pixellink++' adds grouped conv, channel fusion,
# spectral-norm self-attention, and attention-guided DCN.
REFERENCE_RECIPES = {
    "pixellink": dict(
        vgg_groups=1, use_fuseconv=False,
        use_self_attention=False, use_self_attention_base=False,
        num_dcn_layers=0, groups_dcn=1, dcn_cat_sab=False,
        batch_size=16, lr=5e-4, max_iter=10001, val_every=500,
        stepvalues=[], use_normalize=True,
        use_07_metric=False, confidence_threshold=0.01,
        model_name="pixellink",
    ),
    "pixellink++": dict(
        vgg_groups=4, use_fuseconv=True,
        use_self_attention=True, use_self_attention_base=True,
        num_dcn_layers=1, groups_dcn=4, dcn_cat_sab=True,
        modify_dcn_lr=True,
        batch_size=16, lr=5e-4, max_iter=10001, val_every=500,
        stepvalues=[], use_normalize=True,
        use_07_metric=False, confidence_threshold=0.01,
        model_name="pixellink_plusplus",
    ),
}


def parse_args(argv=None):
    """Two-pass parse (train.py pattern): install the recipe flag set as
    defaults, then re-parse so explicit flags still win."""
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.reference_recipe is not None:
        parser.set_defaults(**REFERENCE_RECIPES[args.reference_recipe])
        args = parser.parse_args(argv)
    return args


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gssd_tpu.config import OptimConfig, PixelLinkConfig
    from gssd_tpu.data import BaseTransform, DataSplitter, LesionDataset
    from gssd_tpu.data.augment import SSDAugmentation
    from gssd_tpu.data.dataset import BatchLoader, collate_pixellink
    from gssd_tpu.eval import run_detection_eval
    from gssd_tpu.models.pixellink import build_pixellink
    from gssd_tpu.parallel.folds import stack_states, unstack_state, vmap_train_step
    from gssd_tpu.parallel.mesh import (
        jit_plan_eval_step,
        jit_plan_infer_step,
        jit_plan_train_step,
        plan_parallelism,
    )
    from gssd_tpu.train import create_train_state
    from gssd_tpu.train.checkpoint import (
        load_weights_partial,
        restore_checkpoint,
        save_checkpoint,
    )
    from gssd_tpu.train.steps import (
        make_pixellink_eval_step,
        make_pixellink_forward,
        make_pixellink_train_step,
    )
    from gssd_tpu.utils.logging import MetricsLogger

    if args.synthetic and not args.datapath:
        args.datapath = os.path.join(args.output, "synthetic_ml_ready")
    if args.synthetic and not os.path.exists(
        os.path.join(args.datapath, "metadata.txt")
    ):
        from gssd_tpu.data.synthetic import make_synthetic_dataset

        make_synthetic_dataset(args.datapath)

    k = args.cross_validation
    ap_list = [float(t) for t in args.ap_list.split(",")]
    iobb_list = [float(t) for t in args.iobb_list.split(",")]
    if os.environ.get("GSSD_EVAL_BATCH"):
        # env override (same contract as train.py)
        args.eval_batch = int(os.environ["GSSD_EVAL_BATCH"])

    logger = MetricsLogger(os.path.join(args.output, "logs", args.model_name))
    logger.log_args(vars(args))

    plc = PixelLinkConfig(
        version=args.version,
        pixel_weight=args.pixel_weight,
        link_weight=args.link_weight,
        neg_pos_ratio=args.neg_pos_ratio,
        vgg_groups=args.vgg_groups,
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
    )
    optim_cfg = OptimConfig(
        lr=args.lr, momentum=args.momentum, weight_decay=args.weight_decay,
        gamma=args.gamma, stepvalues=tuple(args.stepvalues), clip=args.clip,
        modify_dcn_lr=args.modify_dcn_lr,
    )

    model = build_pixellink(plc, args.cascade_fuse, args.batch_norm,
                            args.compute_dtype, args.dcn_impl)
    splitter = DataSplitter(args.datapath, k, args.num_test_subjects)
    base_tf = BaseTransform(args.ssd_dim, args.means, args.p_only,
                            args.use_normalize)
    test_set = LesionDataset(args.datapath, splitter.data_test)
    valid_sets = [LesionDataset(args.datapath, ids)
                  for ids in splitter.data_cv_eval]

    # SPMD layout from the runtime device count (the reference's
    # torch.nn.DataParallel one-liner, pixellink trainer :578)
    plan = plan_parallelism(k, args.batch_size)
    print(f"parallelism: {plan.describe()} layout={plan.layout}")
    forward = jit_plan_infer_step(
        make_pixellink_forward(model), plan, args.eval_batch)

    def eval_fold(state, dataset, tag, iteration):
        def fwd(batch):
            return forward(state, jnp.asarray(batch))

        res = run_detection_eval(
            fwd, dataset, base_tf, ap_list, iobb_list,
            args.confidence_threshold, args.use_07_metric, args.eval_batch,
            use_pixel_link=True, img_size=args.ssd_dim, pl_cfg=plc,
        )
        logger.log_scalars(tag, iteration, res, file="test")
        return res

    ckpt_dir = os.path.join(args.output, "checkpoints")
    sample = jnp.zeros((1, args.ssd_dim, args.ssd_dim, 12))

    if args.test:
        assert args.checkpoint is not None
        results = []
        for fold in range(k):
            state = create_train_state(
                model, jax.random.PRNGKey(args.seed), sample, optim_cfg)
            state = load_weights_partial(
                state, ckpt_dir, args.model_name, args.checkpoint, fold)
            if args.visualize and fold == 0:
                from gssd_tpu.eval.pixellink_decode import mask_to_boxes
                from gssd_tpu.train.steps import (
                    make_pixellink_forward_with_aux,
                )
                from gssd_tpu.utils.visualize import dump_eval_visuals

                vfwd = jax.jit(make_pixellink_forward_with_aux(model))
                vdir = os.path.join(args.output, "visualize",
                                    args.model_name)
                for idx in range(len(test_set)):
                    raw = test_set.pull_image(idx)
                    anno = test_set.pull_anno(idx)
                    x, _, _ = base_tf(raw)
                    p_, h, w, c = x.shape
                    img = np.transpose(x, (1, 2, 0, 3)).reshape(
                        h, w, p_ * c)
                    pix, lnk, aux = vfwd(
                        state, jnp.asarray(img[None], jnp.float32))
                    scores, boxes = mask_to_boxes(
                        np.asarray(pix[0]), np.asarray(lnk[0]),
                        args.ssd_dim, plc)
                    # pack decoded boxes into the Detect [C, K, 5]
                    # contract (normalized) so the dump path is shared
                    det = np.zeros((2, max(len(scores), 1), 5),
                                   np.float32)
                    if len(scores):
                        det[1, :, 0] = scores
                        det[1, :, 1:] = boxes / args.ssd_dim
                    sy = args.ssd_dim / raw.shape[1]
                    sx = args.ssd_dim / raw.shape[2]
                    anno_scaled = anno[:, :4] * np.asarray(
                        [sx, sy, sx, sy], np.float32)
                    dump_eval_visuals(
                        vdir, idx, img, anno_scaled, det,
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

    rng = jax.random.PRNGKey(args.seed)
    states = [
        create_train_state(model, jax.random.fold_in(rng, f), sample,
                           optim_cfg)
        for f in range(k)
    ]
    start_iter = 0
    if args.resume is not None:
        states = [
            restore_checkpoint(s, ckpt_dir, args.model_name, args.resume, i)
            for i, s in enumerate(states)
        ]
        start_iter = args.resume
    stacked = plan.put_state(stack_states(states))

    # one augmentation pipeline (one numpy Generator) per fold: each
    # BatchLoader prefetch thread mutates its own RNG (thread-safety +
    # reproducibility; see train.py)
    augs = [
        SSDAugmentation(
            pixeljitter=args.gt_pixel_jitter, ratio=args.expand_ratio,
            size=args.ssd_dim, mean=args.means,
            use_normalize=args.use_normalize, p_only=args.p_only,
            seed=args.seed + i, pixel_link_size=args.ssd_dim,
            pixel_link_version=args.version,
        )
        for i in range(k)
    ]
    def make_train_loader(ds, seed):
        """--num_workers > 1 selects the multi-process loader (reference
        DataLoader(num_workers) analog); see train.py for determinism
        notes. start_batch gives exact-resume of the MP data stream
        (mirrors train.py)."""
        from gssd_tpu.data.dataset import MPBatchLoader

        if getattr(args, "num_workers", 1) > 1:
            return MPBatchLoader(
                ds, args.batch_size, args.max_gt, seed=seed,
                collate_fn=collate_pixellink,
                num_workers=args.num_workers,
                start_batch=args.resume or 0,
            )
        return BatchLoader(
            ds, args.batch_size, args.max_gt, seed=seed,
            collate_fn=collate_pixellink,
        )

    loader_objs = [
        make_train_loader(
            LesionDataset(args.datapath, ids, transform=augs[i],
                          load_to_ram=args.load_data_to_ram),
            seed=args.seed + i,
        )
        for i, ids in enumerate(splitter.data_cv_train)
    ]
    loaders = [iter(lo) for lo in loader_objs]

    # valid-loss loaders: augmentation transform so the pixel/link
    # target maps are generated (reference valid loop :290-321 feeds the
    # cv_valid DataLoader through the same collate)
    valid_augs = [
        SSDAugmentation(
            pixeljitter=0.0, ratio=args.expand_ratio, size=args.ssd_dim,
            mean=args.means, use_normalize=args.use_normalize,
            p_only=args.p_only, seed=args.seed + 100 + i,
            pixel_link_size=args.ssd_dim, pixel_link_version=args.version,
        )
        for i in range(k)
    ]
    valid_loaders = [
        iter(BatchLoader(
            LesionDataset(args.datapath, ids, transform=valid_augs[i]),
            args.batch_size, args.max_gt, seed=args.seed + 100 + i,
            collate_fn=collate_pixellink,
        ))
        for i, ids in enumerate(splitter.data_cv_eval)
    ]

    step_fn = make_pixellink_train_step(model, plc, optim_cfg)
    train_step = jit_plan_train_step(vmap_train_step(step_fn), plan)
    eval_step = jit_plan_eval_step(
        jax.vmap(make_pixellink_eval_step(model, plc)), plan)

    def fold_batch(iters):
        bs = [next(it) for it in iters]
        return {key: np.stack([b[key] for b in bs]) for key in bs[0]}

    try:
        _train_loop(args, k, start_iter, loaders, valid_loaders, stacked,
                    train_step, eval_step, fold_batch, logger, eval_fold,
                    valid_sets, test_set, ckpt_dir)
    finally:
        # terminate MP loader workers explicitly (daemon kill at exit
        # leaves queue feeder threads mid-put and emits noisy errors)
        for lo in loader_objs:
            if hasattr(lo, "shutdown"):
                lo.shutdown()
        logger.close()


def _train_loop(args, k, start_iter, loaders, valid_loaders, stacked,
                train_step, eval_step, fold_batch, logger, eval_fold,
                valid_sets, test_set, ckpt_dir):
    import json

    import numpy as np

    from gssd_tpu.parallel.folds import unstack_state
    from gssd_tpu.train.checkpoint import save_checkpoint

    for iteration in range(start_iter, args.max_iter):
        batch = fold_batch(loaders)
        stacked, metrics = train_step(stacked, batch)
        if iteration % 10 == 0:
            m = {key: float(np.mean(np.asarray(v)))
                 for key, v in metrics.items()}
            logger.log_scalars("loss", iteration, m)
            print(f"iter {iteration}: loss={m['loss']:.4f} "
                  f"(pixel={m['pixel_loss']:.4f} link={m['link_loss']:.4f})")
        last = iteration == args.max_iter - 1
        if ((iteration % args.val_every == 0 and iteration > start_iter)
                or last) and iteration >= args.speedrun:
            if "axon" in os.environ.get("JAX_PLATFORMS", "").lower():
                from gssd_tpu.utils.device_health import (
                    wait_for_healthy_device,
                )

                wait_for_healthy_device()
            vbatch = fold_batch(valid_loaders)
            vm = eval_step(stacked, vbatch)
            logger.log_scalars(
                "eval_loss", iteration,
                {key: float(np.mean(np.asarray(v)))
                 for key, v in vm.items()},
                file="valid",
            )
            accum = []
            for fold in range(k):
                st = unstack_state(stacked, fold)
                res_v = eval_fold(st, valid_sets[fold],
                                  f"eval_ap_cv{fold}", iteration)
                res_t = eval_fold(st, test_set, f"test_ap_cv{fold}",
                                  iteration)
                accum.append((res_v, res_t))
                save_checkpoint(st, ckpt_dir, args.model_name, iteration,
                                fold)
            mean_v = {key: float(np.mean([a[0][key] for a in accum]))
                      for key in accum[0][0]}
            mean_t = {key: float(np.mean([a[1][key] for a in accum]))
                      for key in accum[0][1]}
            print(f"iter {iteration} valid: {json.dumps(mean_v)}")
            print(f"iter {iteration} test:  {json.dumps(mean_t)}")


if __name__ == "__main__":
    main()

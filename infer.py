#!/usr/bin/env python
"""Batch inference CLI — the serving surface.

Loads a trained checkpoint and runs the jitted detect pipeline over an
ml_ready directory (or its test split), writing one JSON of detections
per slice: {"id", "boxes" [[x1,y1,x2,y2] px], "scores"}. The analog of
the reference's test/--visualize inference paths (test_ap_iobb.py
make_pred) stripped down to a deployable tool.

Also reports per-image detection latency (forward + on-device Detect +
transfer), the analog of the reference's per-image timing printout
(test.py:57-60 "im_detect: i/N timer.toc()"); the first batch includes
jit compilation and is excluded from the summary statistics.

Example:
  python infer.py --datapath <ml_ready> --checkpoint 60000 \
      --output dets.json --ssd_type gssd --use_self_attention True ...
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from train import build_parser, model_config


def main(argv=None):
    base = build_parser()
    base.add_argument("--det_output", default="detections.json", type=str)
    base.add_argument("--split", default="test", choices=["test", "all"])
    base.add_argument("--fold", default=0, type=int)
    args = base.parse_args(argv)
    assert args.checkpoint is not None, "--checkpoint required"

    import jax
    import jax.numpy as jnp

    from gssd_tpu.config import DetectConfig, OptimConfig
    from gssd_tpu.data import BaseTransform, DataSplitter, LesionDataset
    from gssd_tpu.models import build_model
    from gssd_tpu.train import create_train_state
    from gssd_tpu.train.checkpoint import load_weights_partial
    from gssd_tpu.train.steps import make_infer_step

    mcfg = model_config(args)
    model, priors = build_model(mcfg)
    detect_cfg = DetectConfig(num_classes=args.num_classes)
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.ssd_dim, args.ssd_dim, mcfg.in_channels)),
        OptimConfig(),
    )
    state = load_weights_partial(
        state, os.path.join(args.output, "checkpoints"), args.model_name,
        args.checkpoint, args.fold,
    )
    infer = jax.jit(make_infer_step(model, priors, detect_cfg))

    splitter = DataSplitter(args.datapath, args.cross_validation,
                            args.num_test_subjects)
    ids = splitter.data_test if args.split == "test" else (
        splitter.data_train + splitter.data_test)
    ds = LesionDataset(args.datapath, ids)
    tf = BaseTransform(args.ssd_dim, args.means, args.p_only,
                       args.use_normalize)

    results = []
    bs = args.eval_batch
    images, sizes = [], []
    for i in range(len(ds)):
        raw = ds.pull_image(i)
        x, _, _ = tf(raw)
        p, h, w, c = x.shape
        images.append(np.transpose(x, (1, 2, 0, 3)).reshape(h, w, p * c))
        sizes.append((raw.shape[2], raw.shape[1]))
    lat_ms = []  # per-image latency, one entry per batch after warm-up
    for start in range(0, len(ds), bs):
        chunk = images[start:start + bs]
        pad = bs - len(chunk)
        batch = np.stack(chunk + [chunk[-1]] * pad).astype(np.float32)
        t0 = time.perf_counter()
        # np.asarray forces the device->host transfer, the only reliable
        # sync over the tunneled runtime (block_until_ready is async).
        det = np.asarray(infer(state, jnp.asarray(batch)))
        dt_ms = (time.perf_counter() - t0) * 1e3 / len(chunk)
        if start:  # batch 0 pays jit compile; keep stats honest
            lat_ms.append(dt_ms)
        print(f"im_detect: {min(start + bs, len(ds))}/{len(ds)} "
              f"{dt_ms:.1f} ms/image")
        for bi in range(len(chunk)):
            rows = det[bi, 1]
            keep = rows[:, 0] > args.confidence_threshold
            rows = rows[keep]
            W, H = sizes[start + bi]
            results.append({
                "id": ids[start + bi],
                "scores": [float(s) for s in rows[:, 0]],
                "boxes": [
                    [float(r[1] * W), float(r[2] * H),
                     float(r[3] * W), float(r[4] * H)]
                    for r in rows
                ],
            })
    with open(args.det_output, "w") as f:
        json.dump(results, f, indent=1)
    n_det = sum(len(r["scores"]) for r in results)
    if lat_ms:
        print(f"latency: mean {np.mean(lat_ms):.1f} ms/image, "
              f"median {np.median(lat_ms):.1f} ms/image "
              f"(excl. first/compile batch, batch={bs})")
    print(f"wrote {len(results)} slices, {n_det} detections "
          f"-> {args.det_output}")


if __name__ == "__main__":
    main()

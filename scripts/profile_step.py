"""Capture an xplane trace of the flagship GSSD++ train step and print
the top TPU ops by total duration — exact attribution for kernel work
(standalone probes overstate; fusion context changes everything).

Usage: python scripts/profile_step.py [--steps 5] [--batch 32]
"""

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

import numpy as np


def capture(trace_dir, steps, batch):
    import jax
    import jax.numpy as jnp

    from gssd_tpu.config import LossConfig, OptimConfig
    from gssd_tpu.models import build_model
    from gssd_tpu.train import create_train_state, make_train_step
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    model, priors = build_model(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, 300, 300, 12), jnp.float32), OptimConfig())
    step = jax.jit(
        make_train_step(model, priors, LossConfig(), OptimConfig()),
        donate_argnums=(0,))
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(
            rng.uniform(0, 1, (batch, 300, 300, 12)).astype(np.float32)),
        "boxes": jnp.asarray(np.tile(
            np.asarray([0.3, 0.3, 0.6, 0.6], np.float32), (batch, 1, 1))),
        "labels": jnp.zeros((batch, 1), jnp.int32),
        "valid": jnp.ones((batch, 1), bool),
    }
    state, m = step(state, batch_data)
    float(m["loss"])
    for _ in range(5):
        state, m = step(state, batch_data)
    float(m["loss"])
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        state, m = step(state, batch_data)
    float(m["loss"])  # D2H sync before stop
    jax.profiler.stop_trace()


def _read_varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _parse_msg(buf):
    """Minimal protobuf wire parser -> {field: [values]}. The installed
    tensorboard_plugin_profile/tensorflow pair cannot parse xplane.pb
    (version skew), so we walk the wire format with the stable xplane
    field numbers (XSpace.planes=1; XPlane.name=2/lines=3/
    event_metadata=4; XLine.name=2/events=4; XEvent.metadata_id=1/
    duration_ps=3; XEventMetadata.id=1/name=2)."""
    import struct

    out = defaultdict(list)
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack("<I", buf[i:i + 4])[0]
            i += 4
        elif wt == 1:
            v = struct.unpack("<Q", buf[i:i + 8])[0]
            i += 8
        else:
            raise ValueError(f"wiretype {wt}")
        out[field].append(v)
    return out


def report(trace_dir, steps, top=45):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with open(path, "rb") as f:
        space = _parse_msg(f.read())
    for pbuf in space[1]:
        plane = _parse_msg(pbuf)
        pname = plane[2][0].decode() if plane.get(2) else "?"
        if "TPU" not in pname:
            continue
        names = {}
        for ent in plane.get(4, []):
            e = _parse_msg(ent)
            if not e.get(2):
                continue
            md = _parse_msg(e[2][0])
            names[md[1][0] if md.get(1) else 0] = (
                md[2][0].decode() if md.get(2) else "?")
        for lbuf in plane.get(3, []):
            line = _parse_msg(lbuf)
            lname = line[2][0].decode() if line.get(2) else "?"
            if "XLA Ops" not in lname:
                continue
            totals = defaultdict(float)
            for ebuf in line.get(4, []):
                ev = _parse_msg(ebuf)
                mid = ev[1][0] if ev.get(1) else 0
                dur = ev[3][0] if ev.get(3) else 0
                totals[names.get(mid, str(mid))] += dur / 1e9  # ms
            total_ms = sum(totals.values()) / steps
            print(f"== {pname} / {lname}: {total_ms:.2f} ms/step "
                  f"accounted over {steps} steps")
            for name, ms in sorted(totals.items(),
                                   key=lambda kv: -kv[1])[:top]:
                print(f"  {ms / steps:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--trace_dir", default="/tmp/xplane_step")
    ap.add_argument("--skip_capture", action="store_true")
    args = ap.parse_args()
    if not args.skip_capture:
        capture(args.trace_dir, args.steps, args.batch)
    report(args.trace_dir, args.steps)

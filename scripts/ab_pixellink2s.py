"""Same-regime A/B of the PixelLink-2s train step (the one in-tree DCN
site above GSSD_HAT_MAX_HW: conv2_2 at 150^2, pixel_link/model.py:153
placement) — gather fallback vs a hat-DCN tiling under test. Runs
bench.py --pixellink-only --pl-version 2s back-to-back interleaved
(A B A B) so worker-regime drift can't masquerade as a win.

Usage (on the TPU):
  python scripts/ab_pixellink2s.py --env GSSD_HAT_MAX_HW=99999 \
         [--env GSSD_HAT_TP=64 ...] [--iters 15] [--reps 2] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(env_extra, iters, batch):
    env = dict(os.environ, **env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--pixellink-only", "--pl-version", "2s",
         "--iters", str(iters), "--batch", str(batch)],
        env=env, capture_output=True, text=True, timeout=2400,
    )
    try:
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return {"error": (out.stderr or out.stdout)[-400:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", action="append", default=[],
                    help="KEY=VAL for the B arm (repeatable)")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    b_env = dict(kv.split("=", 1) for kv in args.env)

    results = {"A(gather)": [], f"B({args.env})": []}
    for _ in range(args.reps):
        for name, env in (("A(gather)", {}), (f"B({args.env})", b_env)):
            r = run_once(env, args.iters, args.batch)
            results[name].append(r.get("train_slices_per_sec", r))
            print(name, json.dumps(r), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Same-regime bench A/B: run bench.py back-to-back under two env
settings, interleaved (A B A B) so worker-regime drift between runs
cannot masquerade as a win (CLAUDE.md: only same-regime back-to-back
comparisons decide).

Usage:
  python scripts/ab_bench.py --env GSSD_HAT_BF16=1 [--size 300]
         [--iters 20] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(env_extra, size, iters):
    env = dict(os.environ, **env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--size", str(size), "--iters", str(iters),
         "--skip-torch", "--skip-512", "--internal-json"],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    try:
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return {"error": (out.stderr or out.stdout)[-400:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", action="append", default=[],
                    help="KEY=VAL for the B arm (repeatable)")
    ap.add_argument("--size", type=int, default=300)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    b_env = dict(kv.split("=", 1) for kv in args.env)

    results = {"A(base)": [], f"B({args.env})": []}
    for rep in range(args.reps):
        for name, env in (("A(base)", {}), (f"B({args.env})", b_env)):
            r = run_bench(env, args.size, args.iters)
            v = r.get("value")
            results[name].append(v)
            print(f"rep{rep} {name}: {v} slices/s "
                  f"(mfu_hw={r.get('mfu_hw')})")
    for name, vals in results.items():
        ok = [v for v in vals if v]
        if ok:
            print(f"{name}: mean {sum(ok) / len(ok):.1f} over {ok}")


if __name__ == "__main__":
    main()

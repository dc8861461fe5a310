"""Collect the published-protocol run (train.py --reference_recipe
gssd++, 60k iters) into PROTOCOL_r{N}.json: loss curve samples, the LR
step behavior at the 30k/50k boundaries, eval AP/IoBB curves, resume
events, and throughput.

Usage: python scripts/protocol_report.py <run.log> [<resume.log> ...] \
           --out PROTOCOL_r04.json
"""

from __future__ import annotations

import argparse
import json
import re

ITER_RE = re.compile(
    r"iter (\d+): loss=([\d.]+) \(l=([\d.]+) c=([\d.]+)\) lr=([\de.+-]+) "
    r"([\d.]+) slices/s input_wait=(\d+)%")
EVAL_RE = re.compile(r"iter (\d+) (valid|test):\s+(\{.*\})")
RESUME_RE = re.compile(r"resumed from iteration (\d+)")


def parse_logs(paths):
    iters, evals, resumes = [], [], []
    for path in paths:
        with open(path) as fh:
            for line in fh:
                m = ITER_RE.match(line)
                if m:
                    iters.append({
                        "iter": int(m.group(1)),
                        "loss": float(m.group(2)),
                        "loss_l": float(m.group(3)),
                        "loss_c": float(m.group(4)),
                        "lr": float(m.group(5)),
                        "slices_per_sec": float(m.group(6)),
                        "input_wait_pct": int(m.group(7)),
                    })
                    continue
                m = EVAL_RE.match(line)
                if m:
                    evals.append({
                        "iter": int(m.group(1)),
                        "split": m.group(2),
                        **json.loads(m.group(3)),
                    })
                    continue
                m = RESUME_RE.search(line)
                if m:
                    resumes.append(int(m.group(1)))
    return iters, evals, resumes


def lr_boundaries(iters, stepvalues=(30000, 50000)):
    """LR observed just before/after each decay boundary."""
    out = {}
    for sv in stepvalues:
        before = [r for r in iters if r["iter"] < sv]
        after = [r for r in iters if r["iter"] >= sv]
        out[str(sv)] = {
            "lr_before": before[-1]["lr"] if before else None,
            "lr_after": after[0]["lr"] if after else None,
        }
    return out


def decimate(rows, keep=200):
    if len(rows) <= keep:
        return rows
    step = len(rows) / keep
    return [rows[int(i * step)] for i in range(keep)] + [rows[-1]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--out", default="PROTOCOL_r04.json")
    ap.add_argument("--stepvalues", nargs="*", type=int,
                    default=[30000, 50000])
    args = ap.parse_args()
    iters, evals, resumes = parse_logs(args.logs)
    if not iters:
        raise SystemExit("no iteration lines parsed")
    final_evals = {}
    for row in evals:
        final_evals.setdefault(row["split"], row)
        if row["iter"] >= final_evals[row["split"]]["iter"]:
            final_evals[row["split"]] = row
    steady = [r["slices_per_sec"] for r in iters if r["iter"] % 1000 == 0]
    report = {
        "recipe": "gssd++ (reference README.md:51-90: batch 32, 60k "
                  "iters, lr 1e-3 x0.1 @30k/50k, OHNM 3:1, eval "
                  "{0.3,0.5,0.7} conf 0.2 non-07, val_every 500)",
        "logs": args.logs,
        "total_iters_logged": iters[-1]["iter"],
        "resume_events": resumes,
        "lr_boundaries": lr_boundaries(iters, args.stepvalues),
        "final_eval": final_evals,
        "throughput_slices_per_sec": {
            "first": iters[1]["slices_per_sec"] if len(iters) > 1 else None,
            "last": iters[-1]["slices_per_sec"],
            "samples_every_1k": steady,
        },
        "loss_curve": decimate(
            [{"iter": r["iter"], "loss": r["loss"]} for r in iters]),
        "eval_curve": decimate(evals, keep=300),
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}: {iters[-1]['iter']} iters, "
          f"{len(evals)} eval rows, resumes at {resumes}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Matched-step comparison of two training runs' validation metrics.

Round-5 evidence tool (VERDICT r4 ask #1's done-criterion asks for "an
h8-vs-h4 matched val_nll pair"): reads each run's metrics stream — a
committed snapshot (`runs/<name>/metrics.jsonl.gz`, tools/snapshot_run.py)
or a live `sparse-vae-logs/<exp>/<name>/metrics.jsonl` — aligns the second
run's validation records to the first's steps by linear interpolation
(same convention as tools/ref_parity/parity_table.py), and prints markdown
tables plus each side's best value. Usage:

  python tools/compare_runs.py runs/real-prose-vae-r5 runs/real-prose-vae-r5-h4 \
      --metrics val_nll,val_kl [--labels h8,h4]
"""
import argparse
import gzip
import json
import os
import sys


def read_metrics(path):
    """-> {metric: [(step, value)]} from a run dir or a jsonl(.gz) file."""
    if os.path.isdir(path):
        for cand in ("metrics.jsonl.gz", "metrics.jsonl"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
        else:
            sys.exit(f"no metrics stream under {path}")
    op = gzip.open if path.endswith(".gz") else open
    series = {}
    with op(path, "rt") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            step = rec.get("step")
            if step is None:
                continue
            for k, v in rec.items():
                if k in ("step", "t") or not isinstance(v, (int, float)):
                    continue
                series.setdefault(k, []).append((step, float(v)))
    return series


def interp(points, step):
    """Linear interpolation of [(step, val)] at `step`; None outside range."""
    points = sorted(points)
    if not points or step < points[0][0] or step > points[-1][0]:
        return None
    for (s0, v0), (s1, v1) in zip(points, points[1:]):
        if s0 <= step <= s1:
            if s1 == s0:
                return v0
            return v0 + (v1 - v0) * (step - s0) / (s1 - s0)
    return points[-1][1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_a")
    ap.add_argument("run_b")
    ap.add_argument("--metrics", default="val_nll")
    ap.add_argument("--labels", default="")
    ap.add_argument("--points", type=int, default=8,
                    help="max table rows (evenly spaced over run A's steps)")
    args = ap.parse_args()

    la, lb = (args.labels.split(",") + ["A", "B"])[:2] if args.labels \
        else (os.path.basename(args.run_a.rstrip("/")),
              os.path.basename(args.run_b.rstrip("/")))
    sa, sb = read_metrics(args.run_a), read_metrics(args.run_b)

    for metric in args.metrics.split(","):
        pa, pb = sa.get(metric, []), sb.get(metric, [])
        if not pa or not pb:
            print(f"### {metric}\n(absent in one run: "
                  f"{la}={len(pa)} pts, {lb}={len(pb)} pts)\n")
            continue
        steps = sorted({s for s, _ in pa})
        if len(steps) > args.points:
            idx = [round(i * (len(steps) - 1) / (args.points - 1))
                   for i in range(args.points)]
            steps = [steps[i] for i in idx]
        print(f"### {metric}")
        print(f"| step | {la} | {lb} (interp.) | Δ ({lb}−{la}) |")
        print("|---|---|---|---|")
        for s in steps:
            va, vb = interp(pa, s), interp(pb, s)
            if va is None or vb is None:
                continue
            print(f"| {s} | {va:.4f} | {vb:.4f} | {vb - va:+.4f} |")
        ba, bb = min(v for _, v in pa), min(v for _, v in pb)
        print(f"\nbest {metric}: {la} **{ba:.4f}**, {lb} **{bb:.4f}**\n")


if __name__ == "__main__":
    main()

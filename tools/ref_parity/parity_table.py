#!/usr/bin/env python
"""Matched-step parity table from run artifacts.

Merges a reference-side JSONL (tools/ref_parity/train_ref_*.py --out) with
our side's snapshot (runs/<name>/metrics.jsonl.gz) into the BASELINE.md
table format: for each of OUR validation steps, the reference's metric
linearly interpolated to that step, ours, and the delta — the exact method
of the round-4 LSTM/transformer parity sections.

Usage:
  python tools/ref_parity/parity_table.py \
      runs/ref-lstm-vae-parity/reference.jsonl runs/parity-lstm-vae \
      --metrics val_nll,val_kl,val_loss
"""
import argparse
import gzip
import json
from pathlib import Path


def load_jsonl(path):
    op = gzip.open if str(path).endswith(".gz") else open
    with op(path, "rt") as fh:
        return [json.loads(line) for line in fh]


def series(records, metric):
    pts = [(r["step"], r[metric]) for r in records
           if metric in r and r[metric] is not None and "step" in r]
    return sorted(dict(pts).items())  # last value per step wins


def interp(pts, step):
    if not pts:
        return None
    lo = max((p for p in pts if p[0] <= step), default=None)
    hi = min((p for p in pts if p[0] >= step), default=None)
    if lo is None:
        return hi[1]
    if hi is None or hi[0] == lo[0]:
        return lo[1]
    t = (step - lo[0]) / (hi[0] - lo[0])
    return lo[1] + t * (hi[1] - lo[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("reference_jsonl")
    ap.add_argument("ours_run_dir")
    ap.add_argument("--metrics", default="val_nll,val_kl,val_loss")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    ref = load_jsonl(args.reference_jsonl)
    ours_path = Path(args.ours_run_dir) / "metrics.jsonl.gz"
    ours = load_jsonl(ours_path)
    metrics = args.metrics.split(",")

    lines, rows = [], []
    for metric in metrics:
        rp = series(ref, metric)
        op = series(ours, metric)
        if not rp or not op:
            lines.append(f"(no data for {metric}: ref {len(rp)} pts, "
                         f"ours {len(op)} pts)")
            continue
        lines.append(f"\n### {metric}")
        lines.append("| step (ours) | reference (interp.) | ours | Δ |")
        lines.append("|---|---|---|---|")
        ref_max = max(s for s, _ in rp)
        for step, val in op:
            if step > ref_max + (rp[-1][0] - rp[0][0]) * 0.1:
                continue  # don't extrapolate far past the reference run
            rv = interp(rp, step)
            lines.append(f"| {step} | {rv:.4f} | {val:.4f} "
                         f"| {val - rv:+.4f} |")
            rows.append({"metric": metric, "step": step,
                         "reference": rv, "ours": val})
    div = [r for r in ref if r.get("diverged")]
    if div:
        lines.append(f"\nreference run DIVERGED at step {div[0]['step']} "
                     f"(kl_weight {div[0].get('kl_weight')})")
    text = "\n".join(lines)
    print(text)
    if args.out:
        Path(args.out).write_text(json.dumps(rows, indent=2) + "\n")


if __name__ == "__main__":
    main()

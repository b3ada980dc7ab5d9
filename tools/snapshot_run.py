#!/usr/bin/env python
"""Snapshot a training run's metrics into the repo (runs/<name>/).

VERDICT r3 weak #6: quality claims must be auditable from in-repo
artifacts, not from files left on whatever host ran the training. This
copies the run's metrics.jsonl (gzipped), meta.json, and best-step marker
from sparse-vae-logs/<experiment>/<name>/ into runs/<name>/, plus a
summary.json with the best validation metrics — small enough to commit.

Usage: python tools/snapshot_run.py <experiment> <name> [logroot]
"""
import gzip
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 1
    experiment, name = argv[1], argv[2]
    log_root = Path(argv[3]) if len(argv) > 3 else REPO / "sparse-vae-logs"
    run_dir = log_root / experiment / name
    out = REPO / "runs" / name
    out.mkdir(parents=True, exist_ok=True)

    metrics = run_dir / "metrics.jsonl"
    best_val = {}
    n_records = 0
    if metrics.exists():
        with open(metrics, "rb") as src, \
                gzip.open(out / "metrics.jsonl.gz", "wb") as dst:
            shutil.copyfileobj(src, dst)
        for line in open(metrics):
            n_records += 1
            rec = json.loads(line)
            for k, v in rec.items():
                if k.startswith("val_") and isinstance(v, (int, float)):
                    if k not in best_val or v < best_val[k][0]:
                        best_val[k] = (v, rec.get("step"))

    for extra in ("checkpoints/meta.json", "checkpoints/best.json"):
        p = run_dir / extra
        if p.exists():
            shutil.copy(p, out / Path(extra).name)

    summary = {
        "experiment": experiment, "name": name, "records": n_records,
        "best": {k: {"value": v, "step": s} for k, (v, s) in
                 best_val.items()},
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2) + "\n")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

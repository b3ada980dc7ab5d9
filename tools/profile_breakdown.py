#!/usr/bin/env python
"""Leaf-op time breakdown of a jax.profiler trace:
``python tools/profile_breakdown.py [profile_root] [steps]``.

Reads the newest ``<hostname>.trace.json.gz`` under the profile root (default
/tmp/svt-profile, as written by ``bench.py --profile``), takes the
device's "XLA Ops" lane (leaf executions only — the Steps / XLA Modules
lanes duplicate the same wall time as containers), and prints per-step
self-time bucketed by kernel family. This is the analysis behind
BASELINE.md's step-time tables; keeping it in-tree beats re-deriving the
lane/bucket conventions every round.
"""
import collections
import glob
import gzip
import json
import sys


# The CE backward's dg and dE pallas calls both execute inside the `_bwd`
# jit and are not separable from the trace's op names — the bucket reports
# their sum.
BUCKETS = [
    ("_bwd_pallas", "attention pallas bwd kernels"),
    ("_sliding_window_attention_fwd_pallas", "attention pallas fwd"),
    ("fwd_kernel", "attention pallas fwd"),
    ("_bwd", "CE backward (dg+dE jit)"),
    ("_fwd", "CE forward kernel"),
    ("copy", "copies/transposes"),
    ("transpose", "copies/transposes"),
    ("fusion", "XLA fusions"),
]


def bucket(name: str) -> str:
    for prefix, key in BUCKETS:
        if name.startswith(prefix) or (prefix in name and "pallas" in prefix):
            return key
    if "fusion" in name:           # named fusions: multiply_reduce_fusion...
        return "XLA fusions"
    return "other"


def main(argv):
    root = argv[1] if len(argv) > 1 else "/tmp/svt-profile"
    steps = int(argv[2]) if len(argv) > 2 else 10
    # jax.profiler names the file <hostname>.trace.json.gz.
    traces = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        sys.exit(f"no *.trace.json.gz under {root}")
    path = traces[-1]
    print(f"# {path}", file=sys.stderr)
    with gzip.open(path) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # Device pid: the one whose thread lanes include "XLA Ops".
    lanes = {(e.get("pid"), e.get("tid")): e["args"].get("name")
             for e in events
             if e.get("ph") == "M" and e.get("name") == "thread_name"}
    all_op_lanes = {k for k, v in lanes.items() if v == "XLA Ops"}
    if not all_op_lanes:
        sys.exit("no 'XLA Ops' lane in trace (CPU-only profile?)")
    # One lane per device — report device 0 only, so a multi-chip trace is
    # not silently summed N-fold.
    pid0 = min(pid for pid, _ in all_op_lanes)
    op_lanes = {k for k in all_op_lanes if k[0] == pid0}
    if len(all_op_lanes) > len(op_lanes):
        print(f"# {len(all_op_lanes)} device op lanes; reporting device "
              f"pid={pid0} only", file=sys.stderr)

    agg = collections.Counter()
    raw = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        agg[bucket(e["name"])] += e["dur"]
        raw[e["name"].split(".")[0]] += e["dur"]

    total = sum(agg.values())
    print(f"total {total / 1e3 / steps:.1f} ms/step over {steps} steps")
    for k, us in agg.most_common():
        print(f"{us / 1e3 / steps:8.2f}  {k}")
    print("\ntop raw op groups:")
    for k, us in raw.most_common(20):
        print(f"{us / 1e3 / steps:8.2f}  {k}")


if __name__ == "__main__":
    main(sys.argv)

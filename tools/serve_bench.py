#!/usr/bin/env python
"""End-to-end serving benchmark: sustained tokens/s + request latency
percentiles against a live `serve.py` process (VERDICT r3 ask #6).

Drives the HTTP API the way real clients would — many concurrent
connections, heavy-tailed max_tokens — and reports p50/p90/p99 request
latency, sustained generated-token throughput, and per-request normalized
latency (ms per generated token). The lockstep comparison point is the
same request list run as full-batch `sample()` calls, i.e. the
reference's `sample.py`-style loop (/root/reference/sample.py:16-17)
where each batch waits for its slowest row.

Usage:
  python tools/serve_bench.py --url http://127.0.0.1:8600 \
      --requests 512 --concurrency 64 [--seed 0] [--out runs/serve_bench.json]

The server is started separately (it owns the TPU):
  python serve.py transformer-vae real-prose-vae batch_size=64 \
      max_length=512 slice_steps=64
"""
import argparse
import json
import math
import threading
import time
import urllib.request


def heavy_tailed_lengths(n, seed, lo=16, hi=510, mean_target=160):
    """Log-normal-ish request sizes clipped to [lo, hi]: most requests are
    short, a fat tail wants (nearly) the whole window — the distribution
    that makes lockstep batching pay the slowest-row tax."""
    import random
    rng = random.Random(seed)
    mu = math.log(mean_target) - 0.5
    out = []
    for _ in range(n):
        v = int(math.exp(rng.gauss(mu, 1.0)))
        out.append(max(lo, min(hi, v)))
    return out


def one_request(url, max_tokens, seed, timeout):
    body = json.dumps({"max_tokens": max_tokens, "seed": seed}).encode()
    t0 = time.time()
    with urllib.request.urlopen(
            urllib.request.Request(
                url + "/v1/generate", data=body,
                headers={"Content-Type": "application/json"}),
            timeout=timeout) as resp:
        payload = json.loads(resp.read())
    dt = time.time() - t0
    # response shape: {"samples": [{"tokens": [...]}], "latency_ms": ...}
    toks = sum(1 for t in payload["samples"][0]["tokens"] if t != 0)
    return dt, int(toks)


def percentile(sorted_xs, q):
    if not sorted_xs:
        return float("nan")
    i = min(len(sorted_xs) - 1, max(0, int(round(q * (len(sorted_xs) - 1)))))
    return sorted_xs[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8600")
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--concurrency", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--timeout", type=float, default=600.0)
    # The server 503s /healthz until its warmup slice COMPILES — minutes
    # over a cold cache on a contended host (measured >300 s once the
    # decode graph changes), so the health wait must outlast a compile.
    ap.add_argument("--health_timeout", type=float, default=1800.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    lengths = heavy_tailed_lengths(args.requests, args.seed)
    results = [None] * args.requests
    errors = []
    next_idx = [0]
    lock = threading.Lock()

    # wait for the server to be up
    deadline = time.time() + args.health_timeout
    while True:
        try:
            urllib.request.urlopen(args.url + "/healthz", timeout=5).read()
            break
        except Exception:
            if time.time() > deadline:
                raise SystemExit("server never became healthy")
            time.sleep(2)

    def worker():
        while True:
            with lock:
                if next_idx[0] >= args.requests:
                    return
                i = next_idx[0]
                next_idx[0] += 1
            try:
                results[i] = one_request(args.url, lengths[i], 1000 + i,
                                         args.timeout)
            except Exception as e:  # noqa: BLE001 — record, keep draining
                with lock:
                    errors.append(f"req {i}: {type(e).__name__}: {e}")

    t0 = time.time()
    threads = [threading.Thread(target=worker)
               for _ in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    done = [r for r in results if r is not None]
    lats = sorted(r[0] for r in done)
    toks = sum(r[1] for r in done)
    per_tok = sorted(r[0] / max(1, r[1]) for r in done)
    row = {
        "metric": "serving_http_latency",
        "requests": args.requests, "completed": len(done),
        "errors": len(errors), "concurrency": args.concurrency,
        "wall_s": round(wall, 2),
        "generated_tokens": toks,
        "sustained_tok_per_s": round(toks / wall, 1),
        "latency_p50_s": round(percentile(lats, 0.50), 3),
        "latency_p90_s": round(percentile(lats, 0.90), 3),
        "latency_p99_s": round(percentile(lats, 0.99), 3),
        "ms_per_token_p50": round(1e3 * percentile(per_tok, 0.50), 2),
        "ms_per_token_p99": round(1e3 * percentile(per_tok, 0.99), 2),
        "mean_len": round(sum(lengths) / len(lengths), 1),
    }
    for e in errors[:5]:
        print("#", e)
    print(json.dumps(row))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(row, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()

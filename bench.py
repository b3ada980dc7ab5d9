#!/usr/bin/env python
"""Training-throughput benchmark. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "tokens/s/chip", "vs_baseline": N/1e5}.

Measures the flagship TransformerVAE train step (sparse sliding-window
attention, remat, bf16, chunked fused projection+CE) at the reference's
'wikipedia' preset scale — d_model 512, 8 heads, 6 layers, latent 64, 32768
vocab, ~100k-token batches (hparam_presets.py:122-148) — against the
north-star target of 100,000 tokens/sec/chip (BASELINE.json).

The axon-tunneled TPU worker can crash transiently (FAILED_PRECONDITION at
the first device sync) and recovers after ~1-2 min idle. The default
invocation therefore SUPERVISES the measurement in a subprocess: a fresh
attempt gets a fresh TPU client, failures back off and retry, and the JSON
line is always printed (with an "error" field if every attempt died) so the
driver's BENCH record never ends at rc=1 with no output.

Flags:
  --smoke    tiny config on CPU (CI sanity; runs in-process, no supervisor)
  --pallas   use the fused Pallas attention kernel (first Mosaic compile is
             slow over the axon tunnel; cached afterwards)
  --steps N  timed steps (default 10)
"""
import argparse
import functools
import json
import os
import subprocess
import sys
import time

ATTEMPTS = 3
BACKOFF_S = 100  # axon worker recovers in ~1-2 min

# The single physical chip is EXCLUSIVE: a second JAX client hangs at
# backend init (measured: jax.devices() blocks >240 s) while any process
# holds it. Long measurement/training queues on this machine park their
# top-level shell PID in these files; the supervisor below preempts them
# for the duration of a bench run so the driver's round-end invocation
# never records value=0 against a busy chip.
DEFAULT_QUEUE_PIDFILE_GLOB = "/tmp/r*_*queue*.pid"
PREEMPT_GRACE_S = 240  # give a holder this long to finish on its own


def _pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except (OSError, ValueError):
        return False


def _proc_children():
    """ppid -> [pid] map from /proc (Linux only; empty map elsewhere)."""
    children = {}
    try:
        pids = [int(p) for p in os.listdir("/proc") if p.isdigit()]
    except FileNotFoundError:
        return children
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as fh:
                # field 4 is ppid; comm (field 2) may contain spaces but is
                # parenthesized — split after the closing paren.
                ppid = int(fh.read().rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            continue
        children.setdefault(ppid, []).append(pid)
    return children


def _descendants(root, children):
    out, stack = [], [root]
    while stack:
        for child in children.get(stack.pop(), []):
            out.append(child)
            stack.append(child)
    return out


def _comm(pid):
    try:
        with open(f"/proc/{pid}/comm") as fh:
            return fh.read().strip()
    except OSError:
        return ""


def _ancestors(pid):
    out = set()
    while pid > 1:
        try:
            with open(f"/proc/{pid}/stat") as fh:
                pid = int(fh.read().rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            break
        out.add(pid)
    return out


def _queue_roots():
    import glob
    pattern = os.environ.get("BENCH_QUEUE_PIDFILE_GLOB",
                             DEFAULT_QUEUE_PIDFILE_GLOB)
    # A bench running FROM INSIDE a queue (gen_bench.py in a measurement
    # queue reuses supervise()) must never preempt its own chain: skip any
    # root that is this process or one of its ancestors.
    own = _ancestors(os.getpid()) | {os.getpid()}
    roots = []
    for path in sorted(glob.glob(pattern)):
        try:
            with open(path) as fh:
                pid = int(fh.read().split()[0])
        except (OSError, IndexError, ValueError):
            continue
        if _pid_alive(pid) and pid not in own:
            roots.append(pid)
    return roots


def preempt_chip_queues(grace_s=PREEMPT_GRACE_S, poll_s=20, settle_s=75,
                        log=None):
    """If known queue processes (QUEUE_PIDFILE_GLOB) hold the chip, wait up
    to grace_s for them to free it, then pause the queues and terminate the
    in-flight chip job: SIGSTOP each queue root and every non-python
    descendant (freezing the chain so it cannot launch the next job), then
    SIGTERM/SIGKILL python descendants (training jobs checkpoint
    periodically and re-run from_checkpoint; losing tail steps beats a
    zeroed bench row). Only PIDs reached from the explicit pidfiles are
    touched — never name/pattern matching. Returns the SIGSTOPped pids for
    resume_chip_queues()."""
    log = log or (lambda m: print(m, file=sys.stderr))
    deadline = time.time() + grace_s
    while True:
        roots = _queue_roots()
        if not roots:
            return []
        children = _proc_children()
        pythons = [p for r in roots for p in _descendants(r, children)
                   if "python" in _comm(p)]
        if not pythons:
            return []  # queues alive but idle/waiting: chip is free
        if time.time() >= deadline:
            break
        log(f"# bench: chip held by queue jobs {pythons}; waiting "
            f"{int(deadline - time.time())}s more for it to free up")
        time.sleep(poll_s)

    stopped = []
    children = _proc_children()
    for root in roots:
        try:
            os.kill(root, 19)  # SIGSTOP — the chain cannot advance now
            stopped.append(root)
        except OSError:
            continue
    doomed = []
    for root in stopped[:]:
        for pid in _descendants(root, children):
            if pid == os.getpid():
                continue
            if "python" in _comm(pid):
                doomed.append(pid)
            else:
                try:
                    os.kill(pid, 19)
                    stopped.append(pid)
                except OSError:
                    pass
    log(f"# bench: paused queue pids {stopped}, terminating chip jobs "
        f"{doomed} (they resume from their last checkpoint)")
    for pid in doomed:
        try:
            os.kill(pid, 15)
        except OSError:
            pass
    deadline = time.time() + 90
    while time.time() < deadline and any(_pid_alive(p) for p in doomed):
        time.sleep(2)
    for pid in doomed:
        if _pid_alive(pid):
            try:
                os.kill(pid, 9)
            except OSError:
                pass
    if doomed:
        # The axon worker needs ~1-2 min after a client dies before a new
        # client can attach; burn most of it here so attempt 1 succeeds.
        time.sleep(settle_s)
    return stopped


def resume_chip_queues(stopped, log=None):
    log = log or (lambda m: print(m, file=sys.stderr))
    for pid in reversed(stopped):
        try:
            os.kill(pid, 18)  # SIGCONT
        except OSError:
            pass
    if stopped:
        log(f"# bench: resumed queue pids {stopped}")


def supervise(argv, script=None, backoff_s=BACKOFF_S, attempts=ATTEMPTS,
              timeout_first=1800, timeout_rest=900, error_payload=None,
              accept_nonzero=False):
    """Run a benchmark script as a subprocess, retrying transient TPU-worker
    crashes and bounding each attempt (a dead tunnel/worker hangs the JAX
    client at backend init without raising). Prints the inner run's JSON
    line (or the error payload) and always exits 0 so the driver records a
    parseable result. gen_bench.py reuses this with attempts=1. If a known
    measurement/training queue holds the chip, it is preempted for the
    duration (preempt_chip_queues) and resumed afterwards."""
    script = script or os.path.abspath(__file__)
    stopped = preempt_chip_queues()
    try:
        return _supervise_attempts(argv, script, backoff_s, attempts,
                                   timeout_first, timeout_rest,
                                   error_payload, accept_nonzero)
    finally:
        resume_chip_queues(stopped)


def _supervise_attempts(argv, script, backoff_s, attempts, timeout_first,
                        timeout_rest, error_payload, accept_nonzero):
    last_err = "unknown"
    for attempt in range(1, attempts + 1):
        try:
            # First attempt gets cold Mosaic-compile headroom.
            proc = subprocess.run(
                [sys.executable, script, "--_inner"] + argv,
                stdout=subprocess.PIPE, text=True,
                timeout=timeout_first if attempt == 1 else timeout_rest)
        except subprocess.TimeoutExpired as e:
            proc = subprocess.CompletedProcess(
                e.cmd, returncode=-1,
                stdout=(e.stdout.decode() if isinstance(e.stdout, bytes)
                        else e.stdout) or "")
        json_line = None
        for line in (proc.stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                json_line = line
            elif line:
                print(line, file=sys.stderr)
        if json_line is not None and (proc.returncode == 0 or accept_nonzero):
            print(json_line)
            return 0
        last_err = (f"attempt {attempt}/{attempts} rc={proc.returncode}, "
                    f"json={'yes' if json_line else 'no'}")
        print(f"# bench {last_err}; backing off {backoff_s}s for the TPU "
              f"worker to recover", file=sys.stderr)
        if attempt < attempts:
            time.sleep(backoff_s)
    print(json.dumps(error_payload or {
        "metric": "transformer_vae_train_throughput", "value": 0,
        "unit": "tokens/s/chip", "vs_baseline": 0.0,
        "error": f"all {attempts} attempts failed ({last_err})"}))
    return 0


def bench_generate(args):
    """Full-document generation: Jacobi fixed-point parallel decode vs the
    token-at-a-time AR while_loop, identical sampling semantics."""
    import jax
    import jax.numpy as jnp

    from sparse_vae_tpu.models.generation import SamplingParams
    from sparse_vae_tpu.models.transformer_vae import (TransformerVAE,
                                                       TransformerVAEHparams)

    if args.smoke:
        b, L = 4, 128
        hp = TransformerVAEHparams(
            d_model=64, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=1024, num_encoder_latents=8,
            sparse_self_attention=False, use_pallas_kernel=False)
    else:
        # Latency regime (small batch): the setting where parallel decoding
        # pays. At large batch the AR while_loop is already compute-bound
        # and the comparison reduces to sequential-pass count (reported).
        # Long documents (--seq >= 2048, 128-multiple) run the sparse
        # sliding-window path — each Jacobi pass costs O(L * window) there,
        # while the AR loop pays L sequential steps against the block-ring
        # cache. e.g.: bench.py --mode generate --batch 1 --seq 8192
        b, L = args.batch, args.seq
        if args.mode == "generate" and args.seq == 12800:
            b, L = 4, 512  # the train default doesn't apply to generate
        sparse = L >= 2048 and L % 128 == 0
        hp = TransformerVAEHparams(
            d_model=512, num_heads=8, num_layers=6, latent_depth=64,
            vocab_size=2 ** 15, num_encoder_latents=64,
            sparse_self_attention=sparse, attn_window_size=2,
            attn_block_size=128,
            use_pallas_kernel=bool(sparse and args.pallas),
            precision="bf16")

    model = TransformerVAE(hp)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng},
                        jnp.ones((1, 64), jnp.int32))["params"]
    z = jax.random.normal(rng, (b, 1, hp.latent_depth))
    sampling = SamplingParams()  # reference defaults: top-p 0.9, rep 1.2

    @jax.jit
    def ar(params, rng):
        return model.apply({"params": params}, rng, L, b, z, sampling,
                           method=model.sample)

    @jax.jit
    def ar_fused(params, rng):
        # Selection through the VMEM-resident kernel: one HBM read of the
        # [B, V] logits per AR step instead of ~24 bisection sweeps — the
        # lever that matters at mass-sampling batch sizes (b >= 64).
        return model.apply({"params": params}, rng, L, b, z, sampling,
                           fused_select=True, method=model.sample)

    ITERS_PER_CALL = 8

    @jax.jit
    def jacobi_step(params, rng, tokens):
        # Small selection chunk: top-p filtering materializes [b, chunk, V]
        # temporaries per chunk, which dominate transient memory at 32k
        # vocab — scale the chunk down with batch so mass-sampling configs
        # (b >= 256) stay within HBM/compile limits. Iterations run in
        # host-driven slices of ITERS_PER_CALL so no single device
        # execution runs unboundedly long (resumable via init_tokens).
        return model.apply({"params": params}, rng, L, b, z, sampling,
                           chunk_size=max(8, min(64, 4096 // b)),
                           max_iters=ITERS_PER_CALL,
                           init_tokens=tokens,
                           method=model.parallel_generate)

    def jacobi(params, rng):
        tokens = None
        total = 0
        while True:
            out, it = jacobi_step(params, rng, tokens)
            it = int(it)
            total += it
            if it < ITERS_PER_CALL:
                return out, total
            tokens = jnp.concatenate(
                [jnp.ones((b, 1), jnp.int32), out], axis=-1)

    sparse = hp.sparse_self_attention

    @jax.jit
    def frontier(params, rng):
        # Frontier-windowed Jacobi: per-pass cost O(window_tokens), not
        # O(L) — the sparse band bounds each position's support, so passes
        # over the converged prefix are skipped entirely.
        return model.apply({"params": params}, rng, L, b, z, sampling,
                           window_tokens=min(args.frontier_window, L),
                           method=model.frontier_generate)

    @jax.jit
    def frontier_fused(params, rng):
        # + the VMEM-resident selection kernel (ops/pallas_select.py): the
        # nucleus bisection reads the window's logits from HBM once instead
        # of once per bisection iteration.
        return model.apply({"params": params}, rng, L, b, z, sampling,
                           window_tokens=min(args.frontier_window, L),
                           fused_select=True,
                           method=model.frontier_generate)

    def timed(fn):
        jax.device_get(fn(params, jax.random.PRNGKey(1)))  # compile
        t0 = time.time()
        out = fn(params, jax.random.PRNGKey(2))
        out = jax.device_get(out)
        return time.time() - t0, out

    def gen_len(tokens):
        """Mean generated length (non-PAD tokens) — the equal-length check:
        AR can emit [SEP] early while a parallel mode converges the full
        buffer, so wall-clocks are only comparable at like lengths."""
        import numpy as np
        return float(np.mean(np.sum(np.asarray(tokens) != 0, axis=-1)))

    t_ar, ar_out = timed(ar)
    # ar_fused is still AR (not a parallel mode): reported in the detail
    # line, never as the "parallel" best.
    t_af = None
    if b >= 64:
        try:
            t_af, af_out = timed(ar_fused)
        except Exception as e:
            print(f"# ar_fused failed: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", file=sys.stderr)
    t_j, (j_out, iters) = timed(jacobi)
    rows = {"jacobi": (t_j, int(iters), gen_len(j_out))}
    if sparse:
        t_f, (f_out, f_iters) = timed(frontier)
        rows["frontier"] = (t_f, int(f_iters), gen_len(f_out))
        try:
            t_ff, (ff_out, ff_iters) = timed(frontier_fused)
            rows["frontier_fused"] = (t_ff, int(ff_iters), gen_len(ff_out))
        except Exception as e:  # Mosaic compile regression must not kill
            print(f"# frontier_fused failed: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", file=sys.stderr)
    best_name, (t_best, best_iters, best_len) = min(
        rows.items(), key=lambda kv: kv[1][0])
    result = {
        "metric": "parallel_vs_ar_generation_speedup",
        "value": round(t_ar / t_best, 3),
        "unit": "x wall-clock",
        "vs_baseline": round(t_ar / t_best, 3),
    }
    print(json.dumps(result))
    detail = " ".join(
        f"{name}={t:.2f}s(passes={it},len={ln:.0f})"
        for name, (t, it, ln) in rows.items())
    if t_af is not None:
        detail = f"ar_fused={t_af:.2f}s " + detail
    print(f"# ar={t_ar:.2f}s(len={gen_len(ar_out):.0f}) {detail} "
          f"best={best_name} vs {L - 1} AR steps "
          f"(pass_reduction={(L - 1) / max(best_iters, 1):.1f}x) "
          f"batch=({b},{L}) backend={jax.default_backend()}",
          file=sys.stderr)


def bench_longdoc(args):
    """pg19-regime demonstration: AR-sample a 102,400-token document through
    the O(window) block-ring KV cache (bounded resumable device slices), and
    run the IWAE estimator at full length through the chunked per-document
    log-likelihood — neither is feasible with a full-length cache or
    materialized [K, B, L, 32768] logits."""
    import functools

    import jax
    import jax.numpy as jnp

    from sparse_vae_tpu.models.generation import SamplingParams
    from sparse_vae_tpu.models.transformer_vae import (TransformerVAE,
                                                       TransformerVAEHparams)
    from sparse_vae_tpu.models.vae import estimate_log_prob_iw

    L = args.seq if args.seq != 12800 else 102_400
    if args.smoke:
        L = 2048
    hp = TransformerVAEHparams(
        d_model=512, num_heads=8, num_layers=6, latent_depth=64,
        vocab_size=2 ** 15, num_encoder_latents=64,
        sparse_self_attention=True, attn_window_size=2, attn_block_size=128,
        use_pallas_kernel=args.pallas and not args.smoke,
        loss_chunk_size=2048, precision="bf16")
    model = TransformerVAE(hp)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng},
                        jnp.ones((1, 256), jnp.int32))["params"]
    sampling = SamplingParams()

    SLICE = min(8192, max(1, (L - 1) // 4))  # bounded device execution
    # (the tunneled worker kills executions that run much over a minute)

    @functools.partial(jax.jit, static_argnames=("max_steps",))
    def sample_slice(params, rng, z, state, caches, max_steps):
        # end_token=-1: never emitted, so the benchmark always decodes the
        # full document length (untrained logits would hit [SEP] by chance).
        return model.apply({"params": params}, rng, L, 1, z,
                           method=model.sample_resumable,
                           state=state, caches=caches, max_steps=max_steps,
                           end_token=-1)

    z = jax.random.normal(rng, (1, 1, hp.latent_depth))
    state, caches, _ = sample_slice(params, jax.random.PRNGKey(1), z,
                                    None, None, SLICE)  # compile+first slice
    jax.device_get(state.index)
    t0 = time.time()
    done = SLICE
    while done < L - 1:
        state, caches, _ = sample_slice(params, jax.random.PRNGKey(1), z,
                                        state, caches, SLICE)
        done += SLICE
    timed_tokens = int(jax.device_get(state.index)) - 1 - SLICE
    ar_s = time.time() - t0
    ar_tps = max(timed_tokens, 1) / max(ar_s, 1e-9)

    # IWAE at full length through the chunked reconstruct_ll path.
    tokens = jax.random.randint(rng, (1, L), 3, hp.vocab_size)
    tokens = tokens.at[:, 0].set(1)

    @jax.jit
    def iwae(params, tokens, key):
        posterior = model.apply({"params": params}, tokens,
                                method=model.posterior)

        def rec_ll(zk):
            return model.apply({"params": params}, tokens, zk,
                               method=model.reconstruct_ll)

        return estimate_log_prob_iw(rec_ll, posterior, tokens, key,
                                    num_samples=4, num_iter=4)

    lp = float(jax.device_get(iwae(params, tokens,
                                   jax.random.PRNGKey(2)))[0])  # compile
    t0 = time.time()
    lp = float(jax.device_get(iwae(params, tokens, jax.random.PRNGKey(3)))[0])
    iwae_s = time.time() - t0

    print(json.dumps({
        "metric": "longdoc_ar_sample_tokens_per_sec", "value": round(ar_tps, 1),
        "unit": f"tokens/s at L={L} (ring KV cache)",
        "vs_baseline": round(ar_tps / 1000.0, 3)}))
    print(f"# L={L} ar={ar_s:.1f}s ({1000 * ar_s / max(L - 1 - SLICE, 1):.2f} "
          f"ms/token) iwae_4samples={iwae_s:.1f}s log_p={lp:.1f} "
          f"backend={jax.default_backend()}", file=sys.stderr)


def bench_select(args):
    """Microbenchmark of decode-time selection at the frontier-window shape
    ([B*W, 32768]): the jnp nucleus stack (penalty + 24-iteration bisection
    + Gumbel argmax, ~1.9 GB HBM traffic) vs the VMEM-resident fused kernel
    (ops/pallas_select.py, one logits read). Also the kernel's first real
    Mosaic compile check."""
    import jax
    import jax.numpy as jnp

    from sparse_vae_tpu.models.generation import SamplingParams
    from sparse_vae_tpu.ops.pallas_select import (nucleus_gumbel_argmax,
                                                  _select_tile)

    n = args.batch * min(args.seq, 512)      # rows = B * window_tokens
    v = 2 ** 15 if not args.smoke else 1024
    if args.smoke:
        n = 64
    rng = jax.random.PRNGKey(0)
    s = jax.random.normal(rng, (n, v), jnp.float32) * 3.0
    noise = jax.random.gumbel(jax.random.PRNGKey(1), (n, v), jnp.float32)
    sp = SamplingParams()

    @jax.jit
    def jnp_path(s, noise):
        return _select_tile(s, noise, top_p=sp.top_p,
                            temperature=sp.temperature, num_iters=24)

    @jax.jit
    def fused(s, noise):
        return nucleus_gumbel_argmax(
            s, noise, top_p=sp.top_p, temperature=sp.temperature,
            interpret=args.smoke)

    def timeit(fn, reps=10):
        out = jax.device_get(fn(s, noise))  # compile
        t0 = time.time()
        for _ in range(reps):
            r = fn(s, noise)
        jax.device_get(r)
        return (time.time() - t0) / reps * 1000.0, out

    t_jnp, out_jnp = timeit(jnp_path)
    t_fused, out_fused = timeit(fused)
    import numpy as np
    agree = float(np.mean(np.asarray(out_jnp) == np.asarray(out_fused)))
    print(json.dumps({
        "metric": "fused_select_speedup", "value": round(t_jnp / t_fused, 2),
        "unit": f"x at [{n}, {v}] (jnp {t_jnp:.2f}ms vs fused "
                f"{t_fused:.2f}ms)",
        "vs_baseline": round(t_jnp / t_fused, 2)}))
    print(f"# agreement={agree:.4f} backend={jax.default_backend()}",
          file=sys.stderr)


def bench_cetune(args):
    """Tile-geometry sweep for the fused projection+CE kernels at the train
    step's shape (~108 ms of the round-1 profile; VERDICT r2 #4). Times
    fwd-only and fwd+bwd at each (token_tile, vocab_tile) pair."""
    import jax
    import jax.numpy as jnp

    from sparse_vae_tpu.ops.pallas_ce import fused_tied_cross_entropy

    n = args.batch * args.seq          # tokens per step (default 102,400)
    d, v = 512, 2 ** 15
    rng = jax.random.PRNGKey(0)
    g = jax.random.normal(rng, (n, d), jnp.bfloat16)
    table = jax.random.normal(jax.random.PRNGKey(1), (v, d), jnp.bfloat16)
    bias = jnp.zeros((v,), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (n,), 1, v)

    def run(tt, vt):
        @jax.jit
        def fwd(g, table, bias):
            return jnp.sum(fused_tied_cross_entropy(g, table, bias, labels,
                                                    tt, vt))

        @jax.jit
        def both(g, table, bias):
            l, grads = jax.value_and_grad(fwd, argnums=(0, 1, 2))(
                g, table, bias)
            return l, grads

        def timeit(fn, reps=5):
            jax.device_get(fn(g, table, bias))  # compile
            t0 = time.time()
            for _ in range(reps):
                out = fn(g, table, bias)
            jax.device_get(out)
            return (time.time() - t0) / reps * 1000.0

        return timeit(fwd), timeit(both)

    best = None
    for tt in (512, 1024, 2048):
        for vt in (512, 1024, 2048):
            try:
                f_ms, fb_ms = run(tt, vt)
            except Exception as e:
                print(f"# tt={tt} vt={vt}: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:100]}", file=sys.stderr)
                continue
            print(f"# tt={tt} vt={vt}: fwd={f_ms:.1f}ms fwd+bwd={fb_ms:.1f}ms",
                  file=sys.stderr)
            if best is None or fb_ms < best[2]:
                best = (tt, vt, fb_ms)
    if best is None:
        print(json.dumps({
            "metric": "fused_ce_fwd_bwd_ms", "value": 0,
            "unit": f"ms at n={n}", "vs_baseline": 0,
            "error": "no tile configuration compiled"}))
        return
    print(json.dumps({
        "metric": "fused_ce_fwd_bwd_ms", "value": round(best[2], 1),
        "unit": f"ms at n={n} (tt={best[0]}, vt={best[1]})",
        "vs_baseline": round(best[2], 1)}))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                        default=True)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--profile", action="store_true",
                        help="jax.profiler trace of the timed steps to "
                             "/tmp/svt-profile")
    # Default from the round-4 on-chip A/B (BASELINE.md): at the bench
    # shape (8x12800, d512x6) every activation fits in the v5e's 16 GB HBM
    # (~5-6 GB), so skipping the backward recompute entirely beats the best
    # remat policy — 320.7 vs 359.2 ms/step, loss canary bit-identical
    # (10.4936). Remat remains the default in train.py for the regimes
    # that need it (pg19's 102,400-token documents); --ckpt restores it
    # here. The round-3 remat A/B (dots_attn_qkv > dots > dots_attn) still
    # governs the --ckpt path.
    parser.add_argument("--ckpt", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="layer gradient checkpointing; the default "
                        "(off) saves every activation (≈5-6 GB at the "
                        "bench shape) and skips the backward recompute. "
                        "NOTE: off is only memory-safe near the validated "
                        "default shape — larger --batch/--seq can OOM the "
                        "16 GB v5e where remat was safe (bench warns and "
                        "auto-enables --ckpt past ~2x the default tokens)")
    parser.add_argument("--remat", default="dots_attn_qkv",
                        choices=["full", "dots", "dots_attn",
                                 "dots_attn_qkv", "offload"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seq", type=int, default=12800)
    parser.add_argument("--heads", type=int, default=8,
                        help="attention heads for the train bench (4 -> "
                             "Dh=128 lane-filling geometry)")
    parser.add_argument("--frontier-window", type=int, default=512,
                        help="active-window tokens for frontier Jacobi")
    parser.add_argument("--mode",
                        choices=["train", "generate", "longdoc", "cetune",
                                 "select"],
                        default="train",
                        help="generate: Jacobi parallel decode vs the AR "
                             "while_loop; longdoc: 102,400-token AR sample "
                             "(ring KV cache) + chunked IWAE at full length; "
                             "cetune: fused-CE tile sweep")
    parser.add_argument("--_inner", action="store_true",
                        help=argparse.SUPPRESS)
    args = parser.parse_args()

    if not args._inner and not args.smoke:
        return supervise([a for a in sys.argv[1:] if a != "--_inner"])

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    from sparse_vae_tpu.cli import isolate_cpu_cache
    jax.config.update("jax_compilation_cache_dir",
                      isolate_cpu_cache("/tmp/svt-jax-cache"))

    if args.mode == "generate":
        return bench_generate(args)
    if args.mode == "longdoc":
        return bench_longdoc(args)
    if args.mode == "cetune":
        return bench_cetune(args)
    if args.mode == "select":
        return bench_select(args)

    import jax.numpy as jnp
    import optax

    from sparse_vae_tpu.models.transformer_vae import (TransformerVAE,
                                                       TransformerVAEHparams)
    from sparse_vae_tpu.models.vae import VAEObjective
    from sparse_vae_tpu.training.optimizer import make_optimizer

    if args.smoke:
        b, L = 4, 512
        hp = TransformerVAEHparams(
            d_model=64, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=1024, num_encoder_latents=8,
            sparse_self_attention=True, attn_window_size=2,
            attn_block_size=128, grad_checkpointing=True,
            loss_chunk_size=256, use_pallas_kernel=False, precision="fp32")
    else:
        b, L = args.batch, args.seq
        # No-remat is only validated to fit the 16 GB v5e near the default
        # 8x12800 shape (~5-6 GB of saved activations); past ~2x that token
        # count, auto-restore grad checkpointing instead of OOMing. An
        # EXPLICIT --no-ckpt (args.ckpt is False, not None) wins.
        if args.ckpt is None and b * L > 2 * 8 * 12800:
            print(f"# bench: {b}x{L} exceeds 2x the validated no-remat "
                  "shape; enabling --ckpt (pass --no-ckpt explicitly after "
                  "verifying memory)", file=sys.stderr)
            args.ckpt = True
        args.ckpt = bool(args.ckpt)
        # --heads 4 gives Dh=128 — the geometry where per-head slices fill
        # the 128-lane registers and the custom-call boundary copies vanish
        # (BASELINE.md attention-layout experiments). The canonical bench
        # stays at the reference's 8 heads (Dh=64).
        hp = TransformerVAEHparams(
            d_model=512, num_heads=args.heads, num_layers=6, latent_depth=64,
            vocab_size=2 ** 15, num_encoder_latents=64,
            sparse_self_attention=True, attn_window_size=2,
            attn_block_size=128, grad_checkpointing=args.ckpt,
            loss_chunk_size=2048, use_pallas_kernel=args.pallas,
            precision="bf16", remat_policy=args.remat)

    model = TransformerVAE(hp)
    objective = VAEObjective(hp)
    optimizer = make_optimizer(lr=3e-4, lr_decay_steps=250_000,
                               grad_clip_threshold=150.0)

    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (b, L), 3, hp.vocab_size)
    tokens = tokens.at[:, 0].set(1)
    batch = {
        "token_ids": tokens,
        "num_tokens": jnp.full((b,), L, jnp.int32),
        "num_bytes": jnp.full((b,), L * 4, jnp.int32),
    }
    params = model.init({"params": rng, "sample": rng},
                        tokens[:1, :256])["params"]
    opt_state = optimizer.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, step, rng):
        def loss_fn(p):
            return objective.loss(model, p, batch, step, rng)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    def sync(x):
        # device_get forces real completion; block_until_ready can return
        # early on tunneled backends (axon), which breaks wall timing.
        return float(jax.device_get(x))

    # Warmup / compile
    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state, batch,
                                         jnp.asarray(0), rng)
    sync(loss)
    compile_s = time.time() - t0

    # Second step: steady-state check (no compile)
    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state, batch,
                                         jnp.asarray(1), rng)
    sync(loss)
    first_step_s = time.time() - t0

    # Timed steady state
    from sparse_vae_tpu.utils.profiling import trace
    with trace("/tmp/svt-profile", enabled=args.profile):
        t0 = time.time()
        for i in range(args.steps):
            params, opt_state, loss = train_step(
                params, opt_state, batch, jnp.asarray(i + 2),
                jax.random.fold_in(rng, i))
        sync(loss)
        elapsed = time.time() - t0

    tokens_per_step = b * L
    tps = tokens_per_step * args.steps / elapsed
    result = {
        "metric": "transformer_vae_train_throughput",
        "value": round(tps, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tps / 100_000, 4),
    }
    print(json.dumps(result))
    print(f"# loss={float(loss):.4f} compile={compile_s:.1f}s "
          f"first_step={first_step_s*1000:.0f}ms "
          f"step={elapsed/args.steps*1000:.1f}ms batch=({b},{L}) "
          f"backend={jax.default_backend()} pallas={args.pallas}",
          file=sys.stderr)


if __name__ == "__main__":
    main()

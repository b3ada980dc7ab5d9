#!/usr/bin/env python
"""Trained-checkpoint generation benchmark at EQUAL generated lengths:
``python gen_bench.py <model> <run-name> [seq=8192] [batch=1] [full=0]
[window=512] [modes=greedy,sampled] [draft=3] [serve=0] [step=<n|best>]``.
``draft=N`` adds a frontier row with suffix-match drafting (greedy modes
only; 0 disables) and sets the sampled modes' speculative-decoding draft
n-gram (a speculative_draftN row always accompanies sampled modes);
``step`` selects the checkpoint (default newest).
``serve=N`` adds the mass-sampling serving comparison: N documents with
natural [SEP] stops, lockstep batches vs continuous batching
(sparse_vae_tpu/serving.py) — e.g. ``modes=none serve=4000 batch=256
seq=512``.

Round 2's trained-checkpoint AR-vs-Jacobi table compared unequal work (the
AR run emitted [SEP] early while Jacobi converged the whole buffer —
BASELINE.md footnote). Here every decoder runs with end_token=-1 (never
emitted), so AR, frontier Jacobi, and fused-selection frontier all generate
exactly seq-1 tokens; wall-clocks are directly comparable. full=1 adds the
full-document Jacobi mode (slow on trained checkpoints; round-2 numbers).
"""
import functools
import json
import os
import sys
import time


def supervise(argv):
    """Bounded single-shot run via bench.supervise (one tested supervisor
    implementation): a wedged TPU tunnel blocks the JAX client without
    raising (measured: a >60s device execution can crash the worker and
    hang every later call), so the default invocation gets a hard timeout
    and always emits a JSON line."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import supervise as bench_supervise
    bench_supervise(
        argv[1:], script=os.path.abspath(__file__), attempts=1,
        timeout_first=2700, accept_nonzero=False,
        error_payload={"metric": "trained_generation_equal_length",
                       "runs": [], "error": "inner run failed or hung"})


def main(args):
    from sparse_vae_tpu.cli import apply_platform_env
    apply_platform_env()
    experiment, name = args[1], args[2]
    extra = dict(kv.split("=", 1) for kv in args[3:])
    seq = int(extra.get("seq", 8192))
    batch = int(extra.get("batch", 1))
    window = int(extra.get("window", 512))
    draft = int(extra.get("draft", 3))
    run_full = extra.get("full", "0") == "1"
    check = extra.get("check", "0") == "1"
    modes = extra.get("modes", "greedy,sampled").split(",")

    import jax
    import jax.numpy as jnp

    from sparse_vae_tpu import load_checkpoint_for_name
    from sparse_vae_tpu.models.generation import SamplingParams

    module, hparams, objective, state, meta = load_checkpoint_for_name(
        experiment, name, step=extra.get("step"))
    from sparse_vae_tpu import cast_float_params
    # params_dtype=bf16: serving-weight cast A/B — decode is weight-
    # bandwidth-bound, so bf16-stored weights should approach 2x.
    params_dtype = extra.get("params_dtype", "fp32")
    params = cast_float_params(state["params"], params_dtype)
    is_vae = experiment.endswith("vae")

    # spec_draft=<experiment>:<name> enables the draft-MODEL speculative
    # row (models/spec_decode.py): that checkpoint proposes spec_k tokens
    # per pass, the target verifies them in one chunked decode. Batch 1.
    spec_draft = extra.get("spec_draft")
    spec_k = int(extra.get("spec_k", 8))
    draft_propose = draft_init = None
    if spec_draft:
        d_exp, d_name = spec_draft.split(":", 1)
        d_mod, _, _, d_state, _ = load_checkpoint_for_name(
            d_exp, d_name, step=extra.get("spec_draft_step"))
        d_params = cast_float_params(d_state["params"], params_dtype)

        def draft_propose(state, last, rng):
            return d_mod.apply({"params": d_params}, state, last, rng,
                               spec_k, method=type(d_mod).draft_propose)

        d_cls = type(d_mod)
        if hasattr(d_cls, "initial_rnn_state"):  # LSTM drafts: hidden state
            draft_init = d_mod.apply({"params": d_params}, 1,
                                     method=d_cls.initial_rnn_state)
        else:  # transformer drafts: (decode caches, index), sized to cover
            # the full generated length plus the final over-proposed chunk
            draft_init = d_mod.apply({"params": d_params}, 1,
                                     seq + spec_k + 2,
                                     method=d_cls.draft_init_state)

    z = None
    if is_vae:
        z = jax.random.normal(jax.random.PRNGKey(7),
                              (batch, 1, hparams.latent_depth))

    def run_mode(sampling, label):
        @jax.jit
        def ar(rng):
            return module.apply(
                {"params": params}, rng, seq, *((batch, z) if is_vae
                                                else (batch,)),
                sampling, end_token=-1, method=type(module).sample)

        @functools.partial(jax.jit, static_argnums=(1, 2))
        def frontier(rng, fused, ngram):
            return module.apply(
                {"params": params}, rng, seq, *((batch, z) if is_vae
                                                else (batch,)),
                sampling, end_token=-1, window_tokens=window,
                fused_select=fused, draft_ngram=ngram,
                method=type(module).frontier_generate)

        @functools.partial(jax.jit, static_argnums=(1,))
        def speculative(rng, ngram):
            return module.apply(
                {"params": params}, rng, seq, *((batch, z) if is_vae
                                                else (batch,)),
                sampling, end_token=-1, window_tokens=window,
                draft_ngram=ngram,
                method=type(module).speculative_generate)

        @jax.jit
        def full_jacobi(rng):
            return module.apply(
                {"params": params}, rng, seq, *((batch, z) if is_vae
                                                else (batch,)),
                sampling, end_token=-1, chunk_size=128,
                method=type(module).parallel_generate)

        def timed(fn, *a):
            jax.device_get(fn(jax.random.PRNGKey(1), *a))  # compile
            t0 = time.time()
            out = jax.device_get(fn(jax.random.PRNGKey(2), *a))
            return time.time() - t0, out

        t_ar, ar_out = timed(ar)
        rows = {"ar": (t_ar, seq - 1)}
        extras = {}
        if getattr(hparams, "sparse_self_attention", False):
            t_f, (f_out, f_it) = timed(frontier, False, 0)
            rows["frontier"] = (t_f, int(f_it))
            greedy = sampling.temperature <= 0.0 or sampling.top_k == 1
            if check and greedy:
                import numpy as np
                mism = int((np.asarray(ar_out) != np.asarray(f_out)).sum())
                extras["frontier_mismatch_tokens"] = mism
            if draft > 0 and greedy:
                # Greedy only: suffix-match drafts cannot anticipate the
                # Gumbel-perturbed fixed point, and overwriting the stale
                # tail (often already correct under settled context) drives
                # sampled runs toward the max_iters ceiling — long enough
                # to trip the device execution limit.
                t_fd, (fd_out, fd_it) = timed(frontier, False, draft)
                rows[f"frontier_draft{draft}"] = (t_fd, int(fd_it))
                if check:
                    # Greedy Jacobi's contract: the fixed point IS the AR
                    # trajectory — drafted or not. check=1 verifies the
                    # decoded tokens on the chip, not just in unit tests.
                    import numpy as np
                    mism = int((np.asarray(ar_out)
                                != np.asarray(fd_out)).sum())
                    extras[f"draft{draft}_mismatch_tokens"] = mism
            if not greedy:
                try:
                    t_ff, (ff_out, ff_it) = timed(frontier, True, 0)
                    rows["frontier_fused"] = (t_ff, int(ff_it))
                except Exception as e:
                    print(f"# frontier_fused failed: {type(e).__name__}: "
                          f"{str(e).splitlines()[0][:120]}", file=sys.stderr)
                # Frontier SPECULATIVE sampling: the sampled-mode draft
                # lever Jacobi lacks — distribution-exact (not
                # trajectory-exact), window drafts verified by
                # accept/residual-resample (models/parallel_decode.py).
                t_sp, (sp_out, sp_it) = timed(speculative,
                                              max(draft, 0))
                rows[f"speculative_draft{max(draft, 0)}"] = (t_sp,
                                                             int(sp_it))
        if draft_propose is not None and batch == 1:
            @jax.jit
            def spec_model(rng):
                kw = {"z": z} if is_vae else {}
                return module.apply(
                    {"params": params}, rng, seq, draft_propose,
                    draft_init, sampling=sampling, end_token=-1,
                    draft_k=spec_k, **kw,
                    method=type(module).spec_draft_generate)

            t_sm, (sm_out, sm_it, sm_acc) = timed(spec_model)
            rows[f"spec_model_k{spec_k}"] = (t_sm, int(sm_it))
            extras["spec_model_accepted"] = int(sm_acc)
            extras["spec_model_tokens_per_pass"] = round(
                (seq - 1) / max(int(sm_it), 1), 3)
            if check and (sampling.temperature <= 0.0
                          or sampling.top_k == 1):
                # Greedy draft-model speculative decoding is trajectory-
                # exact vs AR in exact arithmetic (tested on CPU). On the
                # chip the two paths reduce different-shaped matmuls, so a
                # near-tie argmax can flip once and cascade — the FIRST
                # divergence index separates that from a systematic bug
                # (an early first divergence with a large count is a bug;
                # a late single flip is numerics).
                import numpy as np
                neq = np.asarray(ar_out) != np.asarray(sm_out)
                extras["spec_model_mismatch_tokens"] = int(neq.sum())
                extras["spec_model_first_mismatch"] = (
                    int(np.flatnonzero(neq.any(0))[0])
                    if neq.any() else None)
        if run_full:
            t_j, (j_out, j_it) = timed(full_jacobi)
            rows["jacobi_full"] = (t_j, int(j_it))
        detail = " ".join(f"{k}={t:.2f}s({it} passes)"
                          for k, (t, it) in rows.items())
        print(f"# {label} batch=({batch},{seq}) {detail}", file=sys.stderr)
        best = min((t for k, (t, _) in rows.items() if k != "ar"),
                   default=None)
        return {"mode": label, **{k: round(t, 3)
                                  for k, (t, _) in rows.items()},
                **extras,
                # null (not a fabricated 0.0) when no parallel decoder ran
                # (dense checkpoint with full=0: AR is the only row).
                "parallel_speedup_vs_ar": (round(t_ar / best, 3)
                                           if best else None)}

    def run_serve(n):
        """Mass sampling with NATURAL [SEP] stops (the workload the
        reference's sample.py runs at 700k x <=512): lockstep batches — each
        batch ends when its slowest row does — vs continuous batching
        (sparse_vae_tpu/serving.py), which refills finished rows between
        bounded slices. Both generate n documents from the model's own
        length distribution; tokens/sec counts real (pre-[SEP]) tokens."""
        import math

        import numpy as np

        from sparse_vae_tpu.data.tokenizer import SEP_ID
        from sparse_vae_tpu.serving import continuous_batch_sample
        sampling = SamplingParams()

        @jax.jit
        def sample_batch(rng):
            return module.apply({"params": params}, rng, seq, batch,
                                sampling=sampling, end_token=SEP_ID,
                                method=type(module).sample)

        def row_tokens(out):
            out = np.asarray(out)
            # A row that never emits [SEP] carries seq-2 real tokens: the
            # scalar loop's final buffer position is never written (PAD) —
            # counting it would credit the lockstep path one phantom token
            # per capped document.
            return np.where((out == SEP_ID).any(axis=-1),
                            np.argmax(out == SEP_ID, axis=-1) + 1,
                            out.shape[-1] - 1).astype(np.int64)

        # Warm both compile paths outside the timings. slice_steps MUST
        # match the timed run: it is baked into the while_loop trace and
        # keys the compiled-slice cache, so a different value compiles an
        # executable the timed run can never reuse.
        serve_slice = 256
        jax.device_get(sample_batch(jax.random.PRNGKey(0)))
        continuous_batch_sample(module, params, jax.random.PRNGKey(0),
                                batch, seq, batch, sampling=sampling,
                                end_token=SEP_ID, slice_steps=serve_slice)

        calls = math.ceil(n / batch)
        t0 = time.time()
        tok_scalar = 0
        for i in range(calls):
            out = jax.device_get(sample_batch(jax.random.PRNGKey(100 + i)))
            lens = row_tokens(out)
            keep = min(batch, n - i * batch)
            tok_scalar += int(lens[:keep].sum())
        t_scalar = time.time() - t0

        t0 = time.time()
        docs = continuous_batch_sample(
            module, params, jax.random.PRNGKey(200), n, seq, batch,
            sampling=sampling, end_token=SEP_ID, slice_steps=serve_slice)
        t_cont = time.time() - t0
        tok_cont = int(sum(len(d) for d in docs))

        row = {"mode": "serve", "docs": n, "batch": batch,
               "scalar_s": round(t_scalar, 2),
               "continuous_s": round(t_cont, 2),
               "scalar_tok_per_s": round(tok_scalar / t_scalar, 1),
               "continuous_tok_per_s": round(tok_cont / t_cont, 1),
               "scalar_mean_len": round(tok_scalar / n, 1),
               "continuous_mean_len": round(tok_cont / n, 1),
               "continuous_speedup": round(
                   (tok_cont / t_cont) / (tok_scalar / t_scalar), 3)}
        print(f"# serve n={n} batch={batch} scalar={t_scalar:.1f}s "
              f"({tok_scalar / t_scalar:.0f} tok/s) "
              f"continuous={t_cont:.1f}s ({tok_cont / t_cont:.0f} tok/s) "
              f"speedup={row['continuous_speedup']}x", file=sys.stderr)
        return row

    results = []
    if "greedy" in modes:
        results.append(run_mode(
            SamplingParams(temperature=0.0, top_p=1.0,
                           repetition_penalty=1.0), "greedy"))
    if "sampled" in modes:
        results.append(run_mode(SamplingParams(), "sampled"))
    serve_n = int(extra.get("serve", 0))
    if serve_n:
        results.append(run_serve(serve_n))
    print(json.dumps({"metric": "trained_generation_equal_length",
                      "runs": results}))


if __name__ == "__main__":
    if "--_inner" in sys.argv:
        main([a for a in sys.argv if a != "--_inner"])
    else:
        supervise(sys.argv)

#!/usr/bin/env python
"""Mass sampling: ``python sample.py <model> <run-name> [num_samples=700000]
[batch_size=1000] [max_length=512] [ignore_end=0] [step=<n|best>]``.

Counterpart of /root/reference/sample.py: loads the newest checkpoint, mass
generates samples with the on-device decode loop, and saves an HF dataset
with a 50k test split (:16-25). Defaults match the reference workload.
``ignore_end=1`` disables the [SEP] stop so every sample runs to
max_length — for full-length qualitative documents from long-context
(pg19-configuration) checkpoints, whose training streams contain
document-boundary separators the sampler would otherwise stop at.
"""
import sys
from pathlib import Path

import jax


def main(args):
    from sparse_vae_tpu.cli import apply_platform_env
    apply_platform_env()
    experiment, name = args[1], args[2]
    extra = dict(kv.split("=", 1) for kv in args[3:])
    num_samples = int(extra.get("num_samples", 700_000))
    batch_size = int(extra.get("batch_size", 1000))
    max_length = int(extra.get("max_length", 512))
    ignore_end = extra.get("ignore_end", "0") == "1"
    # fused_select=1: VMEM-resident nucleus selection kernel — one HBM
    # read of the [B, V] logits per decode step instead of ~24 bisection
    # sweeps; the throughput lever at mass-sampling batch sizes.
    fused_select = extra.get("fused_select", "0") == "1"
    # continuous=1: continuous batching (sparse_vae_tpu/serving.py) — every
    # row decodes its own document at its own position and finished rows
    # are refilled between bounded device slices, so utilization stays
    # ~100% under heavy-tailed document lengths instead of waiting for each
    # batch's slowest row.
    continuous = extra.get("continuous", "0") == "1"
    slice_steps = int(extra.get("slice_steps", 256))

    from sparse_vae_tpu import load_checkpoint_for_name
    from sparse_vae_tpu.batch_generation import batch_generate_samples
    from sparse_vae_tpu.data.tokenizer import SEP_ID

    module, hparams, objective, state, meta = load_checkpoint_for_name(
        experiment, name, step=extra.get("step"))
    from sparse_vae_tpu import cast_float_params
    # params_dtype=bf16: serving-weight cast (halves decode HBM traffic).
    params = cast_float_params(state["params"],
                               extra.get("params_dtype", "fp32"))
    end = -1 if ignore_end else SEP_ID

    # spec_draft=<experiment>:<name>: draft-model speculative decoding
    # (models/spec_decode.py) — batch-1 only, the low-latency single-
    # document path (e.g. one long qualitative sample). A cheaper trained
    # checkpoint proposes spec_k tokens per pass; the target verifies them
    # in one chunked decode. Distribution-exact.
    spec_draft = extra.get("spec_draft")
    if spec_draft:
        assert batch_size == 1, "spec_draft is the batch-1 latency path"
        spec_k = int(extra.get("spec_k", 8))
        d_exp, d_name = spec_draft.split(":", 1)
        d_mod, _, _, d_state, _ = load_checkpoint_for_name(
            d_exp, d_name, step=extra.get("spec_draft_step"))
        d_params = cast_float_params(d_state["params"],
                                     extra.get("params_dtype", "fp32"))

        def draft_propose(dstate, last, rng):
            return d_mod.apply({"params": d_params}, dstate, last, rng,
                               spec_k, method=type(d_mod).draft_propose)

        draft_init = d_mod.apply({"params": d_params}, 1,
                                 method=type(d_mod).initial_rnn_state)

        @jax.jit
        def spec_batch(rng):
            out, _, _ = module.apply(
                {"params": params}, rng, max_length, draft_propose,
                draft_init, end_token=end, draft_k=spec_k,
                method=type(module).spec_draft_generate)
            return out

        from sparse_vae_tpu.batch_generation import batch_generate_samples
        outputs = batch_generate_samples(
            lambda i: spec_batch(jax.random.PRNGKey(i)), num_samples,
            max_length, end_token=None if ignore_end else SEP_ID)
    elif continuous:
        from sparse_vae_tpu.serving import continuous_batch_sample
        outputs = continuous_batch_sample(
            module, params, jax.random.PRNGKey(0), num_samples, max_length,
            batch_size, end_token=end, slice_steps=slice_steps,
            fused_select=fused_select, progress=True)
    else:
        import functools

        @functools.partial(jax.jit)
        def sample_batch(rng):
            kw = {"fused_select": True} if fused_select else {}
            return module.apply({"params": params}, rng, max_length,
                                batch_size, end_token=end,
                                method=type(module).sample, **kw)

        def sample_fn(i):
            return sample_batch(jax.random.PRNGKey(i))

        outputs = batch_generate_samples(
            sample_fn, num_samples, max_length,
            end_token=None if ignore_end else SEP_ID)

    print("Saving to disk...")
    # Decode to text like the reference (sample.py:19-22); the tokenizer is
    # resolved from the run's recorded data hparams.
    from sparse_vae_tpu.cli import tokenizer_for_run
    tokenizer = tokenizer_for_run(experiment, meta)
    texts = tokenizer.decode_batch(
        [[int(t) for t in o if t != 0] for o in outputs])

    from datasets import Dataset
    dataset_path = Path.cwd() / "sparse-vae-datasets" / "samples" / name
    dataset = Dataset.from_dict({"text": texts})
    # The reference always carves out a 50k test split (sample.py:23-25); at
    # its 700k default that is fine, but tiny qualitative runs (num_samples=1)
    # cannot split, so only split when a non-degenerate one exists.
    test_size = min(50_000, len(outputs) // 10)
    if test_size >= 1:
        dataset = dataset.train_test_split(test_size=test_size)
    dataset.save_to_disk(str(dataset_path))
    print("Done.")


if __name__ == "__main__":
    main(sys.argv)

#!/usr/bin/env python
"""Long-document reconstruction check (VERDICT r3 ask #4): encode a
held-out ~100k-token document with the trained pg19 VAE, decode from the
posterior MEAN at temperature 0.7 (the reference's reconstruction protocol,
/root/reference/core/text_sampling_callback.py:34-54), and report BLEU-2 of
the reconstruction against the original plus the posterior's scale stats
(a live latent has scales well below the prior's 1.0).

Usage: python tools/pg19_recon.py <experiment> <run-name> [step=best]
       [max_tokens=102400] [doc=0] [out=runs/gen_r4/pg19_recon.json]
"""
import json
import sys

import numpy as np


def main(args):
    sys.path.insert(0, "/root/repo")
    from sparse_vae_tpu.cli import apply_platform_env
    apply_platform_env()
    experiment, name = args[1], args[2]
    extra = dict(kv.split("=", 1) for kv in args[3:])
    step = extra.get("step", "best")
    max_tokens = int(extra.get("max_tokens", 102_400))
    doc_idx = int(extra.get("doc", 0))
    out_path = extra.get("out", "runs/gen_r4/pg19_recon.json")

    import jax
    import jax.numpy as jnp

    from sparse_vae_tpu import load_checkpoint_for_name
    from sparse_vae_tpu.cli import assemble_config, build_data
    from sparse_vae_tpu.models.generation import SamplingParams
    from sparse_vae_tpu.utils.math_utils import bleu_score_corpus

    module, hparams, objective, state, meta = load_checkpoint_for_name(
        experiment, name, step=step)
    params = state["params"]

    cfg = assemble_config(experiment, [])
    cfg.data = type(cfg.data)(**meta.get("data_hparams", {}))
    data = build_data(cfg)
    tokenizer = data.tokenizer

    corpus = data.splits["test"]
    doc = np.asarray(corpus.docs[doc_idx], np.int32)[:max_tokens]
    tokens = jnp.asarray(doc)[None, :]

    posterior = module.apply({"params": params}, tokens,
                             method=type(module).posterior)
    loc = np.asarray(posterior.loc, np.float32)
    scale = np.asarray(posterior.scale, np.float32)

    # Decode the same length from the posterior mean; [SEP] disabled so the
    # reconstruction covers the whole document (equal-length BLEU).
    recon = module.apply(
        {"params": params}, jax.random.PRNGKey(0), int(tokens.shape[1]), 1,
        jnp.asarray(loc), SamplingParams(temperature=0.7), end_token=-1,
        method=type(module).sample)
    recon = np.asarray(jax.device_get(recon))[0]

    orig_str = tokenizer.decode([int(t) for t in doc if t != 0])
    recon_str = tokenizer.decode([int(t) for t in recon if t != 0])
    bleu2 = float(bleu_score_corpus([recon_str.split(" ")],
                                    [[orig_str.split(" ")]], max_n=2))

    # An unconditional sample from the prior as the no-information floor:
    # reconstruction BLEU only means something above this.
    base = module.apply(
        {"params": params}, jax.random.PRNGKey(1), int(tokens.shape[1]), 1,
        None, SamplingParams(temperature=0.7), end_token=-1,
        method=type(module).sample)
    base_str = tokenizer.decode(
        [int(t) for t in np.asarray(jax.device_get(base))[0] if t != 0])
    bleu2_prior = float(bleu_score_corpus([base_str.split(" ")],
                                          [[orig_str.split(" ")]], max_n=2))

    row = {
        "metric": "pg19_reconstruction_bleu",
        "run": name, "step": step, "doc_tokens": int(tokens.shape[1]),
        "bleu2_posterior_mean": round(bleu2, 4),
        "bleu2_prior_sample": round(bleu2_prior, 4),
        "posterior_scale_mean": round(float(scale.mean()), 4),
        "posterior_scale_min": round(float(scale.min()), 4),
        "posterior_loc_rms": round(float(np.sqrt((loc ** 2).mean())), 4),
    }
    print(json.dumps(row))
    with open(out_path, "w") as f:
        json.dump(row, f, indent=2)
        f.write("\n")
    with open(out_path.replace(".json", "_text.txt"), "w") as f:
        f.write("ORIGINAL (first 2000 chars):\n" + orig_str[:2000]
                + "\n\nRECONSTRUCTION (first 2000 chars):\n"
                + recon_str[:2000] + "\n")


if __name__ == "__main__":
    main(sys.argv)

#!/usr/bin/env python
"""Importance-weighted NLL evaluation over the test split:
``python test.py <model> <run-name> [data.k=v ...] [num_samples=N num_iter=M]``.

Counterpart of /root/reference/test.py: loads the newest checkpoint for the
run, iterates the test split, and reports the running-average IWAE NLL per
token (100 samples x 100 iters for the TransformerVAE, x20 for the LSTMVAE,
transformer_vae.py:76 / lstm_vae.py:137; AR models fall back to plain NLL).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(args):
    from sparse_vae_tpu.cli import apply_platform_env
    apply_platform_env()
    experiment, name = args[1], args[2]
    extra = dict(kv.split("=", 1) for kv in args[3:])
    num_samples = int(extra.pop("num_samples", 100))
    default_iter = 100 if experiment == "transformer-vae" else 20
    num_iter = int(extra.pop("num_iter", default_iter))
    step = extra.pop("step", None)  # None -> newest; 'best'; or a step int

    from sparse_vae_tpu import load_checkpoint_for_name
    from sparse_vae_tpu.cli import assemble_config, build_data
    from sparse_vae_tpu.models.vae import estimate_log_prob_iw
    from sparse_vae_tpu.training.objectives import batch_arrays

    module, hparams, objective, state, meta = load_checkpoint_for_name(
        experiment, name, step=step)
    params = state["params"]

    data_dot = [f"data.{k.removeprefix('data.')}={v}"
                for k, v in extra.items()]
    cfg = assemble_config(experiment, data_dot)
    cfg.data = type(cfg.data)(**meta.get("data_hparams", {})) \
        if not data_dot else cfg.data
    data = build_data(cfg)

    is_vae = experiment.endswith("vae")
    losses = []
    for i, batch in enumerate(data.epoch_batches("test", seed=0)):
        arr = batch_arrays(batch)
        real = np.asarray(arr["num_tokens"]) > 0
        if not real.any():
            continue
        if is_vae:
            posterior = module.apply({"params": params}, arr["token_ids"],
                                     method=type(module).posterior)
            # Chunked per-document log p(x|z) when the model offers it —
            # required at pg19 scale where [B, L, 32768] logits don't fit.
            method = getattr(type(module), "reconstruct_ll",
                             type(module).reconstruct)

            def rec(z):
                return module.apply({"params": params}, arr["token_ids"], z,
                                    method=method)

            lp = estimate_log_prob_iw(rec, posterior, arr["token_ids"],
                                      jax.random.PRNGKey(i), num_samples,
                                      num_iter)
            per_tok = -np.asarray(lp)[real] / np.asarray(
                arr["num_tokens"])[real]
            nll = float(per_tok.mean())
        else:
            # Chunked eval (fused projection+CE when available) — full
            # [B, L, 32768] logits don't fit at 50k-token eval batches.
            stats = objective.eval_stats(module, params, arr,
                                         jax.random.PRNGKey(i))
            nll = float(stats["nll_sum"]) / max(float(stats["token_count"]),
                                                1.0)
        losses.append(nll)
        print(f"batch {i}: last={nll:.4f} avg={sum(losses)/len(losses):.4f}")

    print("Average test loss:", sum(losses) / max(len(losses), 1))


if __name__ == "__main__":
    main(sys.argv)

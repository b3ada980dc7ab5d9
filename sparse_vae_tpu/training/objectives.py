"""Training objectives: autoregressive NLL (VAE ELBO lives in vae.py models).

The AR objective reproduces LanguageModel.training_step/validation_step
(/root/reference/sparse_vae/core/language_model.py:98-126): teacher-forced
logits shifted against the next token, pad-ignoring NLL, and for validation
the summed statistics needed for token-weighted val_nll and val_bpb.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.cross_entropy import token_nll


def batch_arrays(batch) -> Dict[str, jax.Array]:
    """TextBatch (host numpy) -> device-ready dict."""
    return {
        "token_ids": jnp.asarray(batch.token_ids),
        "num_tokens": jnp.asarray(batch.num_tokens),
        "num_bytes": jnp.asarray(batch.num_bytes),
    }


class ARObjective:
    """Plain language-model objective (LSTM-LM / Transformer-LM)."""

    def loss(self, module, params, batch, step, rng
             ) -> Tuple[jax.Array, Dict[str, Any]]:
        logits = module.apply({"params": params}, batch["token_ids"],
                              rngs={"dropout": rng})
        nll = token_nll(logits[:, :-1], batch["token_ids"][:, 1:])
        return nll, {"train_nll": nll}

    def eval_stats(self, module, params, batch, rng) -> Dict[str, jax.Array]:
        logits = module.apply({"params": params}, batch["token_ids"])
        nll, mask = token_nll(logits[:, :-1], batch["token_ids"][:, 1:],
                              reduce=False)
        return {
            "nll_sum": jnp.sum(nll),
            "token_count": jnp.sum(mask),
            "byte_count": jnp.sum(batch["num_bytes"]).astype(jnp.float32),
            "loss_sum": jnp.sum(nll),
        }

    @staticmethod
    def reduce_eval(stats: Dict[str, float]) -> Dict[str, float]:
        tokens = max(stats["token_count"], 1.0)
        nats_per_token = stats["nll_sum"] / tokens
        return {
            "val_nll": nats_per_token,
            "val_bpb": stats["nll_sum"] / max(stats["byte_count"], 1.0)
                       / jnp.log(2.0).item(),
            "val_loss": stats["loss_sum"] / tokens,
        }

"""Continuous-VAE machinery: hparams, ELBO objective, IWAE evaluator.

Re-design of /root/reference/sparse_vae/core/continuous_autoencoder.py as
pure functions: the KL weight is a schedule of the step counter (not mutated
hparams), sample_z's per-token KL normalization guards the batcher's all-pad
rows, and the importance-weighted log p(x) estimator is a lax.scan over
sample chunks with a vmapped reconstruct (continuous_autoencoder.py:62-80's
memory-bounded num_iter loop, on-device).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.cross_entropy import sequence_log_likelihood, token_nll
from ..utils.distributions import DiagonalGaussian, standard_normal_log_prob
from ..utils.math_utils import marginal_kl
from ..utils.schedules import kl_weight_schedule
from .base import LanguageModelHparams


@dataclass
class ContinuousVAEHparams(LanguageModelHparams):
    """continuous_autoencoder.py:10-20."""
    latent_depth: int = 64
    kl_annealing_steps: int = 0
    kl_weight_start: float = 1.0
    kl_weight_end: float = 1.0
    early_stopping_metric: str = "val_loss"


def normalized_kl(raw_kl, num_tokens):
    """Sum KL over everything but batch, divide by each doc's token count,
    mean over *real* rows (sample_z, continuous_autoencoder.py:42-52; the
    real-row mean guards the batcher's all-[PAD] filler rows)."""
    per_doc = raw_kl.reshape(raw_kl.shape[0], -1).sum(axis=-1)
    real = num_tokens > 0
    denom = jnp.maximum(num_tokens, 1)
    kl = jnp.sum(jnp.where(real, per_doc / denom, 0.0)) / jnp.maximum(
        jnp.sum(real), 1)
    raw_mean = jnp.sum(jnp.where(real, per_doc, 0.0)) / jnp.maximum(
        jnp.sum(real), 1)
    return kl, raw_mean


class VAEObjective:
    """ELBO training objective shared by LSTMVAE and TransformerVAE.

    loss = nll + kl_weight(step) * kl  (transformer_vae.py:50-55), with the
    weight from the linear annealing schedule and mc_mutual_info logged via
    the (sign-corrected) marginal-KL estimator (:59-61).
    """

    def __init__(self, hparams: ContinuousVAEHparams,
                 mutual_info_samples: int = 10):
        self.hp = hparams
        self.mi_samples = mutual_info_samples

    def kl_weight(self, step):
        return kl_weight_schedule(step, self.hp.kl_weight_start,
                                  self.hp.kl_weight_end,
                                  self.hp.kl_annealing_steps)

    def loss(self, module, params, batch, step, rng
             ) -> Tuple[jax.Array, Dict[str, Any]]:
        drop_rng, sample_rng, mi_rng = jax.random.split(rng, 3)
        rngs = {"dropout": drop_rng, "sample": sample_rng}
        if getattr(self.hp, "loss_chunk_size", 0) and hasattr(
                type(module), "forward_chunked_nll"):
            # Long-document path: fused projection+CE over sequence chunks,
            # full [B, L, V] logits never materialize (ops/cross_entropy.py).
            nll_sum, count, raw_kl, posterior, z = module.apply(
                {"params": params}, batch["token_ids"], rngs=rngs,
                method=type(module).forward_chunked_nll)
            nll = nll_sum / jnp.maximum(count, 1.0)
        else:
            logits, raw_kl, posterior, z = module.apply(
                {"params": params}, batch["token_ids"], rngs=rngs)
            nll = token_nll(logits[:, :-1], batch["token_ids"][:, 1:])
        kl, raw_kl_mean = normalized_kl(raw_kl, batch["num_tokens"])
        weight = self.kl_weight(step)
        loss = nll + weight * kl

        metrics = {"train_nll": nll, "train_kl": raw_kl_mean,
                   "kl_weight": weight}
        if batch["token_ids"].shape[0] > 1:
            detached = DiagonalGaussian(
                jax.lax.stop_gradient(posterior.loc),
                jax.lax.stop_gradient(posterior.scale))
            metrics["train_mc_mutual_info"] = kl - marginal_kl(
                detached, mi_rng, self.mi_samples)
        return loss, metrics

    def eval_stats(self, module, params, batch, rng) -> Dict[str, jax.Array]:
        sample_rng, _ = jax.random.split(rng)
        logits, raw_kl, posterior, z = module.apply(
            {"params": params}, batch["token_ids"],
            rngs={"sample": sample_rng})
        nll, mask = token_nll(logits[:, :-1], batch["token_ids"][:, 1:],
                              reduce=False)
        kl, _ = normalized_kl(raw_kl, batch["num_tokens"])
        real_rows = jnp.sum(batch["num_tokens"] > 0)
        return {
            "nll_sum": jnp.sum(nll),
            "token_count": jnp.sum(mask),
            "byte_count": jnp.sum(batch["num_bytes"]).astype(jnp.float32),
            "kl_weighted_rows": kl * real_rows,  # re-averaged in reduce
            "row_count": real_rows.astype(jnp.float32),
        }

    @staticmethod
    def reduce_eval(stats: Dict[str, float]) -> Dict[str, float]:
        tokens = max(stats["token_count"], 1.0)
        nll = stats["nll_sum"] / tokens
        kl = stats["kl_weighted_rows"] / max(stats["row_count"], 1.0)
        return {
            "val_nll": nll,
            "val_bpb": stats["nll_sum"] / max(stats["byte_count"], 1.0)
                       / math.log(2.0),
            "val_kl": kl,
            "val_loss": nll + kl,   # transformer_vae.py:66
        }


def estimate_log_prob_iw(reconstruct_logits, posterior: DiagonalGaussian,
                         token_ids, rng, num_samples: int, num_iter: int = 1):
    """Importance-weighted log p(x) (continuous_autoencoder.py:62-80).

    reconstruct_logits: fn z [B, ...latent] -> logits [B, L, V] (teacher
    forced over token_ids); posterior: q(z|x); token_ids: [B, L] (0 = pad) —
    the next-token shift (logits[:-1] vs token_ids[1:]) happens here.
    Computation runs in `num_iter` sequential chunks of num_samples/num_iter
    vmapped samples to bound memory. Returns [B] log p(x) estimates.
    """
    assert num_samples % num_iter == 0
    chunk = num_samples // num_iter
    labels = token_ids[..., 1:]

    def one_chunk(rng_i):
        z = posterior.sample(rng_i, (chunk,))       # [chunk, B, ...]
        flat = z.reshape(*z.shape[:2], -1)
        log_p_z = standard_normal_log_prob(flat)    # [chunk, B]
        log_q_z = posterior.log_prob(z).reshape(
            *z.shape[:2], -1).sum(axis=-1)
        logits = jax.vmap(reconstruct_logits)(z)    # [chunk, B, L, V]
        log_p_x = sequence_log_likelihood(logits[..., :-1, :],
                                          jnp.broadcast_to(
                                              labels, (chunk, *labels.shape)))
        return log_p_z + log_p_x - log_q_z          # [chunk, B]

    def body(_, rng_i):
        return None, one_chunk(rng_i)

    _, log_ws = jax.lax.scan(body, None, jax.random.split(rng, num_iter))
    log_ws = log_ws.reshape(num_samples, -1)        # [K, B]
    return jax.nn.logsumexp(log_ws, axis=0) - math.log(num_samples)

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
    # >1: train on the K-sample IWAE bound with the DReG estimator instead
    # of the single-sample ELBO. The reference intended this
    # (lstm_vae.py:74,104-106 references train_mc_samples and a removed
    # dreg_backward_pass; SURVEY §2.9) — here it is a working path.
    train_mc_samples: int = 1
    # Free-bits KL floor in nats per latent dimension (Kingma et al. 2016):
    # the ELBO's KL term uses max(kl_d, free_bits) elementwise, so dims
    # already below the floor stop receiving collapse pressure. Round-3
    # measurement: at this corpus/scale both the mc=1 ELBO and the mc=4
    # DReG bound collapse (val_kl ~2e-4); this is the constructive lever.
    # Logged train_kl/val_kl stay RAW — the floor only shapes gradients.
    free_bits: float = 0.0


def kl_sums(raw_kl, num_tokens):
    """Per-batch KL numerators: (sum over real rows of per-doc KL / doc
    tokens, sum of raw per-doc KL, real-row count). Dividing the first two
    by the third gives the reference's per-token-normalized KL and its raw
    mean (sample_z, continuous_autoencoder.py:42-52); keeping them as sums
    lets the data-parallel path psum them for an exact global mean."""
    per_doc = raw_kl.reshape(raw_kl.shape[0], -1).sum(axis=-1)
    real = num_tokens > 0
    denom = jnp.maximum(num_tokens, 1)
    kl_sum = jnp.sum(jnp.where(real, per_doc / denom, 0.0))
    raw_sum = jnp.sum(jnp.where(real, per_doc, 0.0))
    return kl_sum, raw_sum, jnp.sum(real).astype(per_doc.dtype)


def normalized_kl(raw_kl, num_tokens):
    """Sum KL over everything but batch, divide by each doc's token count,
    mean over *real* rows (the real-row mean guards the batcher's all-[PAD]
    filler rows)."""
    kl_sum, raw_sum, rows = kl_sums(raw_kl, num_tokens)
    rows = jnp.maximum(rows, 1)
    return kl_sum / rows, raw_sum / rows


class VAEObjective:
    """ELBO training objective shared by LSTMVAE and TransformerVAE.

    loss = nll + kl_weight(step) * kl  (transformer_vae.py:50-55), with the
    weight from the linear annealing schedule and mc_mutual_info logged via
    the (sign-corrected) marginal-KL estimator (:59-61).

    CONTRACT: compose_loss must stay LINEAR in `sums` at fixed `counts`
    (see ARObjective's docstring / parallel.spmd.assert_compose_loss_linear)
    — the sharded train step's exactness depends on it. Both the ELBO and
    the DReG branch are sums-over-rows divided by psum'd counts; keep any
    future term in that numerator/denominator form (nonlinear quantities
    only as stop_gradient diagnostics, like marginal_kl_rows).
    """

    # Per-ROW statistics (see ARObjective.ROW_SUMS): replicated across a
    # 'seq'-sharded length axis, contributed once (sequence shard 0) by the
    # sharded train step before its global psum. nll_sum / token_count stay
    # shard-local.
    ROW_SUMS = ("kl_sum", "raw_kl_sum", "marginal_kl_rows",
                "neg_bound_sum", "bound_sum")
    ROW_COUNTS = ("row_count",)
    ROW_EVAL = ("byte_count", "kl_weighted_rows", "row_count")

    def __init__(self, hparams: ContinuousVAEHparams,
                 mutual_info_samples: int = 10):
        self.hp = hparams
        self.mi_samples = mutual_info_samples

    def kl_weight(self, step):
        return kl_weight_schedule(step, self.hp.kl_weight_start,
                                  self.hp.kl_weight_end,
                                  self.hp.kl_annealing_steps)

    def loss_sums(self, module, params, batch, step, rng
                  ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """(differentiable numerator sums, count denominators) whose
        composition (compose_loss) is the ELBO. Sums/counts are local to
        `batch`; the data-parallel step psums both before composing, making
        the sharded loss and gradient exactly the global token/row-weighted
        ones no matter how unevenly real tokens spread over shards."""
        drop_rng, sample_rng, mi_rng = jax.random.split(rng, 3)
        # NOTE: the VAE training forwards run with deterministic=True (their
        # default) — dropout is OFF, matching every trained quality number
        # in BASELINE.md (a deliberate deviation from the reference's 0.1).
        # If dropout is ever enabled here, do NOT fold drop_rng by the 'seq'
        # index the way ARObjective does: the Perceiver's latent compute is
        # REPLICATED across sequence shards, and per-shard masks would
        # de-replicate the posterior/z that the sp gradient assembly (and
        # the shard-0 KL masking) assume identical on every shard. Identical
        # masks across shards are the correct (if position-correlated)
        # choice for this model family.
        rngs = {"dropout": drop_rng, "sample": sample_rng}
        if getattr(self.hp, "train_mc_samples", 1) > 1:
            if getattr(self.hp, "num_experts", 0) > 1:
                # The K-sample bound vmaps the decoder over z samples;
                # routing/capacity would differ per sample and the balance
                # sums would need an extra vmapped-sow reduction. Fail
                # loudly rather than silently dropping the aux losses.
                raise ValueError(
                    "MoE (num_experts > 1) requires train_mc_samples=1: "
                    "the multi-sample bound does not collect the MoE "
                    "balance losses")
            if getattr(self.hp, "free_bits", 0.0) > 0.0:
                # The IWAE/DReG objective has no separate KL term to floor
                # (KL lives inside each importance weight), so a free-bits
                # clamp is undefined there. Fail loudly rather than train
                # as plain DReG while the config claims a floor.
                raise ValueError(
                    "free_bits requires train_mc_samples=1: the multi-"
                    "sample (IWAE/DReG) objective has no per-dimension KL "
                    "term to clamp")
            return self._multi_sample_sums(module, params, batch, rngs)
        # MoE decoders sow balance statistics into the "losses" collection;
        # one apply per branch serves both configs (only the mutable kwarg
        # and the matching unpack differ).
        moe_stats = None
        moe_on = getattr(self.hp, "num_experts", 0) > 1
        mutable = ["losses"] if moe_on else False

        def unpack(out):
            if not moe_on:
                return out, None
            from .moe import collect_moe_stats
            out, lvars = out
            return out, collect_moe_stats(lvars.get("losses", {}))

        if getattr(self.hp, "loss_chunk_size", 0) and hasattr(
                type(module), "forward_chunked_nll"):
            # Long-document path: fused projection+CE over sequence chunks,
            # full [B, L, V] logits never materialize (ops/cross_entropy.py).
            out, moe_stats = unpack(module.apply(
                {"params": params}, batch["token_ids"], rngs=rngs,
                mutable=mutable, method=type(module).forward_chunked_nll))
            nll_sum, count, raw_kl, posterior, z = out
        else:
            out, moe_stats = unpack(module.apply(
                {"params": params}, batch["token_ids"], rngs=rngs,
                mutable=mutable))
            logits, raw_kl, posterior, z = out
            nll, mask = token_nll(logits[:, :-1], batch["token_ids"][:, 1:],
                                  reduce=False)
            nll_sum, count = jnp.sum(nll), jnp.sum(mask).astype(jnp.float32)
        # Free-bits floor (hparams.free_bits): clamp per latent dimension
        # BEFORE the sums so compose_loss stays linear in `sums` (the
        # data-parallel exactness contract above).
        fb = getattr(self.hp, "free_bits", 0.0)
        kl_for_loss = jnp.maximum(raw_kl, fb) if fb > 0.0 else raw_kl
        kl_sum, _, rows = kl_sums(kl_for_loss, batch["num_tokens"])
        _, raw_kl_sum, _ = kl_sums(raw_kl, batch["num_tokens"])
        sums = {"nll_sum": nll_sum, "kl_sum": kl_sum,
                "raw_kl_sum": raw_kl_sum}
        counts = {"token_count": count, "row_count": rows}
        if batch["token_ids"].shape[0] > 1:
            # Mutual-info diagnostic (transformer_vae.py:59-61). The
            # marginal-KL MC estimate uses this shard's posterior mixture;
            # under sharding the row-weighted average of per-shard estimates
            # is logged (a diagnostic, not part of the loss).
            detached = DiagonalGaussian(
                jax.lax.stop_gradient(posterior.loc),
                jax.lax.stop_gradient(posterior.scale))
            sums["marginal_kl_rows"] = jax.lax.stop_gradient(
                marginal_kl(detached, mi_rng, self.mi_samples)) * rows
        if moe_stats is not None:
            from .moe import moe_loss_terms
            moe_loss_terms(moe_stats, sums, counts)
        return sums, counts

    def compose_loss(self, sums, counts, step
                     ) -> Tuple[jax.Array, Dict[str, Any]]:
        tokens = jnp.maximum(counts["token_count"], 1.0)
        rows = jnp.maximum(counts["row_count"], 1.0)
        if "neg_bound_sum" in sums:  # multi-sample DReG path
            loss = sums["neg_bound_sum"] / rows
            return loss, {"train_iwae_log_prob": sums["bound_sum"] / rows}
        nll = sums["nll_sum"] / tokens
        kl = sums["kl_sum"] / rows
        weight = self.kl_weight(step)
        loss = nll + weight * kl
        metrics = {"train_nll": nll, "train_kl": sums["raw_kl_sum"] / rows,
                   "kl_weight": weight}
        if "marginal_kl_rows" in sums:
            metrics["train_mc_mutual_info"] = kl - (
                sums["marginal_kl_rows"] / rows)
        if "moe_imp_sum" in sums:
            from .moe import compose_moe_losses
            extra, moe_metrics = compose_moe_losses(
                sums, counts,
                getattr(self.hp, "moe_aux_weight", 1e-2),
                getattr(self.hp, "moe_zloss_weight", 1e-3))
            loss = loss + extra
            metrics.update(moe_metrics)
        return loss, metrics

    def loss(self, module, params, batch, step, rng
             ) -> Tuple[jax.Array, Dict[str, Any]]:
        sums, counts = self.loss_sums(module, params, batch, step, rng)
        return self.compose_loss(sums, counts, step)

    def _multi_sample_sums(self, module, params, batch, rngs
                           ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """K-sample IWAE-DReG training (train_mc_samples > 1). The KL
        annealing schedule does not apply — the IWAE bound has no separate
        KL term."""
        token_ids = batch["token_ids"]
        posterior = module.apply({"params": params}, token_ids,
                                 rngs=rngs, method=type(module).posterior)
        # Chunked per-document log-likelihood when the model offers it and
        # chunking is requested — [K, B, L, V] logits never materialize.
        use_ll = (getattr(self.hp, "loss_chunk_size", 0)
                  and hasattr(type(module), "reconstruct_ll"))
        if getattr(module.hparams, "sp_size", 1) > 1 and not use_ll:
            raise ValueError(
                "multi-sample training on a 'seq' mesh requires the chunked "
                "per-document path (loss_chunk_size > 0 and a reconstruct_ll "
                "method): full logits are length-sharded and the bound is "
                "nonlinear in per-shard partial likelihoods")
        method = (type(module).reconstruct_ll if use_ll
                  else type(module).reconstruct)

        def reconstruct(z):
            return module.apply({"params": params}, token_ids, z,
                                rngs=rngs, method=method)

        neg_sum, bound_sum, rows = iwae_dreg_sums(
            reconstruct, posterior, token_ids, batch["num_tokens"],
            rngs["sample"], self.hp.train_mc_samples)
        return ({"neg_bound_sum": neg_sum, "bound_sum": bound_sum},
                {"token_count": jnp.asarray(0.0), "row_count": rows})

    def eval_stats(self, module, params, batch, rng) -> Dict[str, jax.Array]:
        sample_rng, _ = jax.random.split(rng)
        rngs = {"sample": sample_rng}
        if getattr(self.hp, "loss_chunk_size", 0) and hasattr(
                type(module), "forward_chunked_nll"):
            # Long-document path for validation too: full [B, L, V] logits
            # would not fit at 100k-token eval batches.
            nll_sum, token_count, raw_kl, _, _ = module.apply(
                {"params": params}, batch["token_ids"], rngs=rngs,
                method=type(module).forward_chunked_nll)
        else:
            logits, raw_kl, posterior, z = module.apply(
                {"params": params}, batch["token_ids"], rngs=rngs)
            nll, mask = token_nll(logits[:, :-1], batch["token_ids"][:, 1:],
                                  reduce=False)
            nll_sum, token_count = jnp.sum(nll), jnp.sum(mask)
        kl, _ = normalized_kl(raw_kl, batch["num_tokens"])
        real_rows = jnp.sum(batch["num_tokens"] > 0)
        return {
            "nll_sum": nll_sum,
            "token_count": token_count,
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


def _scale_gradient(x, s):
    """Forward: x. Backward: cotangent scaled elementwise by s."""
    return x * s - jax.lax.stop_gradient(x * s - x)


def _log_px(out, labels, batch_shape):
    """Normalize a reconstruct fn's output to per-document log p(x|z).

    The estimators accept either contract:
    - logits [..., B, L, V]: teacher-forced over the full token_ids; the
      next-token shift (logits[:-1] vs labels=token_ids[1:]) happens here;
    - log-likelihood [..., B]: the model already reduced (the chunked
      long-document path, e.g. TransformerVAE.reconstruct_ll — full logits
      never materialize).
    """
    if out.ndim == len(batch_shape):
        return out
    return sequence_log_likelihood(
        out[..., :-1, :], jnp.broadcast_to(labels, (*batch_shape,
                                                    labels.shape[-1])))


def iwae_dreg_loss(reconstruct_logits, posterior: DiagonalGaussian,
                   token_ids, num_tokens, rng, num_samples: int):
    """K-sample IWAE training bound with the DReG gradient estimator
    (Tucker et al. 2018, "Doubly Reparameterized Gradient Estimators") —
    the working realization of the reference's removed dreg_backward_pass
    (lstm_vae.py:106, SURVEY §2.9).

    Estimator structure:
    - log q(z|x) uses stop-gradient posterior parameters, killing the
      high-variance score term (the "sticking the landing" part);
    - decoder parameters receive the standard IWAE weights w̃;
    - the reparameterized z path is rescaled so encoder gradients receive
      weight w̃² (the doubly-reparameterized part), via a gradient-scaling
      identity on z.

    Returns (loss, bound): `loss` is per-token (mean over real rows) and is
    minimized; its VALUE equals -bound-per-token while its GRADIENT is the
    DReG surrogate's. `bound` is the raw per-document IWAE log p(x) [B].
    """
    loc = posterior.loc
    scale = posterior.scale
    eps = jax.random.normal(rng, (num_samples, *loc.shape), loc.dtype)
    z = loc[None] + scale[None] * eps                    # [K, B, ...]
    labels = token_ids[..., 1:]

    q_detached = DiagonalGaussian(jax.lax.stop_gradient(loc),
                                  jax.lax.stop_gradient(scale))

    def log_w(z_k):
        flat = z_k.reshape(*z_k.shape[:2], -1)
        log_p_z = standard_normal_log_prob(flat)         # [K, B]
        log_q_z = q_detached.log_prob(z_k).reshape(
            *z_k.shape[:2], -1).sum(axis=-1)
        out = jax.vmap(reconstruct_logits)(z_k)  # [K,B,L,V] or [K,B] (_log_px)
        log_p_x = _log_px(out, labels, z_k.shape[:2])
        return log_p_x + log_p_z - log_q_z               # [K, B]

    # Pass 1 (no gradients): importance weights.
    lw_val = jax.lax.stop_gradient(log_w(jax.lax.stop_gradient(z)))
    w_tilde = jax.nn.softmax(lw_val, axis=0)             # [K, B]

    # Pass 2 (gradients): z's cotangent scaled by w̃ => encoder weight w̃².
    z_scaled = _scale_gradient(
        z, w_tilde.reshape(*w_tilde.shape,
                           *([1] * (z.ndim - w_tilde.ndim))))
    lw = log_w(z_scaled)
    surrogate = jnp.sum(w_tilde * lw, axis=0)            # [B]
    bound = jax.nn.logsumexp(lw_val, axis=0) - math.log(num_samples)

    # Per-token loss over real rows; value from the bound, grads from the
    # DReG surrogate.
    per_doc = bound + (surrogate - jax.lax.stop_gradient(surrogate))
    real = num_tokens > 0
    denom = jnp.maximum(num_tokens, 1)
    loss = -jnp.sum(jnp.where(real, per_doc / denom, 0.0)) / jnp.maximum(
        jnp.sum(real), 1)
    return loss, bound


def iwae_dreg_sums(reconstruct_logits, posterior: DiagonalGaussian,
                   token_ids, num_tokens, rng, num_samples: int):
    """DReG numerators for the data-parallel composition: (-sum over real
    rows of the per-token surrogate bound, stop-gradient sum of per-document
    bounds, real-row count). Dividing the first by the third reproduces
    iwae_dreg_loss's loss exactly."""
    loss, bound = iwae_dreg_loss(reconstruct_logits, posterior, token_ids,
                                 num_tokens, rng, num_samples)
    real = num_tokens > 0
    rows = jnp.sum(real).astype(jnp.float32)
    bound_sum = jax.lax.stop_gradient(
        jnp.sum(jnp.where(real, bound, 0.0)))
    return loss * jnp.maximum(rows, 1), bound_sum, rows


def estimate_log_prob_iw(reconstruct_logits, posterior: DiagonalGaussian,
                         token_ids, rng, num_samples: int, num_iter: int = 1):
    """Importance-weighted log p(x) (continuous_autoencoder.py:62-80).

    reconstruct_logits: fn z [B, ...latent] -> logits [B, L, V] (teacher
    forced over token_ids; the next-token shift happens here) OR
    -> per-document log p(x|z) [B] (the chunked long-document contract,
    TransformerVAE.reconstruct_ll — see _log_px). posterior: q(z|x);
    token_ids: [B, L] (0 = pad). Computation runs in `num_iter` sequential
    chunks of num_samples/num_iter vmapped samples to bound memory.
    Returns [B] log p(x) estimates.
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
        out = jax.vmap(reconstruct_logits)(z)  # [chunk,B,L,V] or [chunk,B]
        log_p_x = _log_px(out, labels, z.shape[:2])
        return log_p_z + log_p_x - log_q_z          # [chunk, B]

    def body(_, rng_i):
        return None, one_chunk(rng_i)

    _, log_ws = jax.lax.scan(body, None, jax.random.split(rng, num_iter))
    log_ws = log_ws.reshape(num_samples, -1)        # [K, B]
    return jax.nn.logsumexp(log_ws, axis=0) - math.log(num_samples)

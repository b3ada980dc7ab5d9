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
    """Plain language-model objective (LSTM-LM / Transformer-LM).

    When the model exposes forward_hidden/project and loss_chunk_size is
    set, the projection+CE runs fused over sequence chunks so [B, L, V]
    logits never materialize (the long-document path, both train and eval).

    CONTRACT (shared by every objective the sharded train step accepts):
    `compose_loss(sums, counts, step)` must be LINEAR in `sums` at fixed
    `counts` — numerator/denominator form only. The data-parallel step
    psums sums and counts, takes d loss/d sums once at the global values,
    and applies that cotangent to the VJP of the LOCAL sums; a composition
    nonlinear in sums (log of a sum, product of two sums, ...) would make
    multi-chip gradients silently wrong while single-device stays correct.
    Nonlinear *diagnostics* are fine as stop_gradient metrics. Guard any
    new term with parallel.spmd.assert_compose_loss_linear (see
    tests/test_parallel.py).
    """

    # Statistics that are per-ROW (replicated when the LENGTH axis is
    # sharded over a 'seq' mesh axis) rather than per-token: the sharded
    # train step contributes them once, from sequence shard 0, before the
    # global psum (parallel/spmd.py). Token-level sums (nll_sum,
    # token_count) are genuinely local to each length shard.
    ROW_SUMS: tuple = ()
    ROW_COUNTS: tuple = ()
    ROW_EVAL: tuple = ("byte_count",)

    def __init__(self, hparams=None):
        self.hp = hparams

    def _chunked(self, module):
        return (getattr(self.hp, "loss_chunk_size", 0)
                and hasattr(type(module), "forward_hidden"))

    @staticmethod
    def _moe_on(module) -> bool:
        return getattr(module.hparams, "num_experts", 0) > 1

    def _chunked_stats(self, module, params, batch, rng=None):
        if rng is not None and getattr(module.hparams, "sp_size", 1) > 1:
            # Sequence shards hold different token slices: an unfolded
            # dropout rng would drop the same positions on every shard (a
            # period-L/sp correlated pattern). Only the dropout stream
            # folds — sample-type streams must stay replicated.
            rng = jax.random.fold_in(rng, jax.lax.axis_index("seq"))
        rngs = {"dropout": rng} if rng is not None else {}
        # MoE layers sow their balance statistics into the "losses"
        # collection (models/moe.py); ONE apply serves both configs — only
        # the mutable kwarg (and the matching unpack) differs.
        moe_on = self._moe_on(module)
        hidden = module.apply({"params": params}, batch["token_ids"],
                              rngs=rngs, deterministic=rng is None,
                              mutable=["losses"] if moe_on else False,
                              method=type(module).forward_hidden)
        moe_stats = None
        if moe_on:
            from ..models.moe import collect_moe_stats
            hidden, lvars = hidden
            moe_stats = collect_moe_stats(lvars.get("losses", {}))
        # Full-length hidden + end-padded shifted labels: avoids slicing
        # (= copying) the whole [B, L, D] tensor (see shifted_labels). Under
        # sequence parallelism labels_for shifts across shard boundaries.
        labels = module.labels_for(batch["token_ids"]) \
            if hasattr(module, "labels_for") \
            else type(module).shifted_labels(batch["token_ids"])
        nll_sum, count = module.apply({"params": params}, hidden, labels,
                                      method=type(module).sequence_nll)
        return nll_sum, count, moe_stats

    def loss_sums(self, module, params, batch, step, rng
                  ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """(differentiable numerator sums, count denominators); composed by
        compose_loss. The data-parallel step psums both before composing so
        the sharded loss/gradient is the exact global per-token mean even
        when shards carry unequal real-token counts."""
        moe_stats = None
        if self._chunked(module):
            nll_sum, count, moe_stats = self._chunked_stats(
                module, params, batch, rng)
        else:
            moe_on = self._moe_on(module)
            logits = module.apply({"params": params}, batch["token_ids"],
                                  rngs={"dropout": rng},
                                  mutable=["losses"] if moe_on else False)
            if moe_on:
                from ..models.moe import collect_moe_stats
                logits, lvars = logits
                moe_stats = collect_moe_stats(lvars.get("losses", {}))
            nll, mask = token_nll(logits[:, :-1], batch["token_ids"][:, 1:],
                                  reduce=False)
            nll_sum, count = jnp.sum(nll), jnp.sum(mask).astype(jnp.float32)
        sums = {"nll_sum": nll_sum}
        counts = {"token_count": count}
        if moe_stats is not None:
            from ..models.moe import moe_loss_terms
            moe_loss_terms(moe_stats, sums, counts)
        return sums, counts

    def compose_loss(self, sums, counts, step
                     ) -> Tuple[jax.Array, Dict[str, Any]]:
        nll = sums["nll_sum"] / jnp.maximum(counts["token_count"], 1.0)
        loss, metrics = nll, {"train_nll": nll}
        if "moe_imp_sum" in sums:
            from ..models.moe import compose_moe_losses
            extra, moe_metrics = compose_moe_losses(
                sums, counts,
                getattr(self.hp, "moe_aux_weight", 1e-2),
                getattr(self.hp, "moe_zloss_weight", 1e-3))
            loss = nll + extra
            metrics.update(moe_metrics)
        return loss, metrics

    def loss(self, module, params, batch, step, rng
             ) -> Tuple[jax.Array, Dict[str, Any]]:
        sums, counts = self.loss_sums(module, params, batch, step, rng)
        return self.compose_loss(sums, counts, step)

    def eval_stats(self, module, params, batch, rng) -> Dict[str, jax.Array]:
        if self._chunked(module):
            nll_sum, token_count, _ = self._chunked_stats(
                module, params, batch)
        else:
            logits = module.apply({"params": params}, batch["token_ids"])
            nll, mask = token_nll(logits[:, :-1],
                                  batch["token_ids"][:, 1:], reduce=False)
            nll_sum, token_count = jnp.sum(nll), jnp.sum(mask)
        return {
            "nll_sum": nll_sum,
            "token_count": token_count,
            "byte_count": jnp.sum(batch["num_bytes"]).astype(jnp.float32),
            "loss_sum": nll_sum,
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

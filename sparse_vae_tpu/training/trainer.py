"""The training harness.

Replaces the reference's pytorch_lightning.Trainer usage (train.py:94-95 plus
the callbacks wired in language_model.py:48-55): a host loop around jitted
gradient/apply steps with

- gradient accumulation across loader batches (Lightning
  accumulate_grad_batches semantics, train.py:19) — run as a lax.scan over
  same-shape stacked microbatches INSIDE one jitted optimizer step, so the
  host dispatches once per step and metrics average over microbatches;
- sqrt-batch lr scaling + per-step cosine decay, halting when the schedule
  reaches zero (language_model.py:68-78,135-141 — we stop cleanly instead of
  raising KeyboardInterrupt);
- validation with token-weighted val_nll / val_bpb, early stopping (min
  mode), best-metric checkpointing (Orbax), and the periodic
  text-sampling/BLEU callback (text_sampling_callback.py);
- optional data-parallel sharding over a jax Mesh via the explicit
  shard_map SPMD step (parallel/spmd.py): batch rows sharded on 'data',
  params replicated, exact token-weighted psum'd loss — the path where
  Pallas kernels run untouched per shard (GSPMD has no partitioning rules
  for their custom calls and would serialize them).

Each distinct batch shape triggers one compile; the bucketed batcher bounds
that set. Accumulation groups are shape-homogeneous (microbatches of one
optimizer step share a length bucket) so the scan has static shapes.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.text_data_module import TextDataModule
from ..utils.config import TrainerHparams, to_dict
from ..utils.math_utils import bleu_score_corpus
from ..utils.metrics import MetricsWriter
from ..utils.schedules import scaled_lr
from .checkpointing import CheckpointManager, run_dir
from .objectives import batch_arrays
from .optimizer import make_optimizer


@dataclass
class TrainOutcome:
    step: int
    best_metric: Optional[float]
    stopped_reason: str
    params: Any
    metrics_history: list


def defer_accum_groups(batch_iter, k: int, pending: Dict[tuple, list]):
    """Collect same-shape TextBatches into full k-stacks, deferring partial
    groups in `pending` (keyed by token_ids shape) for a later call —
    typically the next epoch — instead of emitting odd-shaped stacks.
    Yields (stacked arrays [k, rows, L], last TextBatch of the group)."""
    from ..parallel.spmd import stack_microbatches
    for batch in batch_iter:
        key = batch.token_ids.shape
        pending.setdefault(key, []).append(batch)
        if len(pending[key]) == k:
            group = pending.pop(key)
            yield stack_microbatches(group), group[-1]


def early_stop_start_step(thp: TrainerHparams, hp) -> int:
    """First step at which the early-stopping monitor is armed.

    Explicit `thp.early_stopping_start_step` wins. The None default derives
    it from the model: while the KL weight is still annealing
    (kl_weight_start != kl_weight_end), validation NLL transiently worsens
    as the KL term phases in — it is not comparable across steps, so
    counting patience or recording a "best" checkpoint there is wrong both
    ways (measured: the round-4 flagship retrain early-stopped at step 1131
    of a 2000-step anneal, pinning a kl_weight~0.6 checkpoint as best).
    Models without a KL schedule (plain LMs) arm at step 0 as before.
    """
    if thp.early_stopping_start_step is not None:
        return int(thp.early_stopping_start_step)
    ws = getattr(hp, "kl_weight_start", None)
    we = getattr(hp, "kl_weight_end", None)
    if ws is not None and we is not None and we != ws:
        return int(getattr(hp, "kl_annealing_steps", 0) or 0)
    return 0


class Trainer:
    def __init__(
        self,
        module,
        model_hparams,
        objective,
        data: TextDataModule,
        trainer_hparams: Optional[TrainerHparams] = None,
        experiment: str = "model",
        name: str = "default",
        log_root: Optional[Path] = None,
        sample_fn: Optional[Callable] = None,
        reconstruct_fn: Optional[Callable] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        enable_logging: bool = True,
    ):
        self.module = module
        self.hp = model_hparams
        self.objective = objective
        self.data = data
        self.thp = trainer_hparams or TrainerHparams()
        self.experiment = experiment
        self.name = name
        self.sample_fn = sample_fn
        self.reconstruct_fn = reconstruct_fn
        self.mesh = mesh
        self._pending_groups: Dict[tuple, list] = {}
        self._val_batches: Optional[list] = None

        self.run_dir = run_dir(experiment, name, log_root)
        self.writer = MetricsWriter(self.run_dir if enable_logging else None,
                                    enabled=enable_logging)
        self.ckpt = CheckpointManager(experiment, name,
                                      log_root) if enable_logging else None

        tokens_per_step = (self.data.hparams.tokens_per_batch
                           * self.thp.accumulate_grad_batches)
        lr = scaled_lr(self.hp.lr, tokens_per_step, self.hp.base_batch_size)
        self._tp_size = mesh.shape.get("model", 1) if mesh is not None else 1
        self._ep_size = mesh.shape.get("expert", 1) if mesh is not None \
            else 1
        from ..parallel.tp import shards_vocab
        self._tp_shard_vocab = shards_vocab(self.hp, self._tp_size)
        # ep_size>1 selects the EP-aware global-norm clip (expert-sharded
        # grads' norms psum'd over 'expert') and refuses LAMB, whose
        # per-leaf trust ratios would diverge across expert shards.
        self.optimizer = make_optimizer(
            lr=lr, lr_decay_steps=self.hp.lr_decay_steps,
            grad_clip_threshold=self.hp.grad_clip_threshold,
            weight_decay=self.hp.weight_decay, lamb=self.hp.lamb,
            tp_size=self._tp_size, tp_shard_vocab=self._tp_shard_vocab,
            ep_size=self._ep_size)

        from ..parallel.spmd import make_eval_step, make_train_step
        # On a multi-axis mesh the train/eval steps run the localized twin
        # module (attention heads + FFN inner dim sharded over 'model'; the
        # batch LENGTH axis sharded over 'seq' — parallel/sp.py);
        # self.module stays global for init / sampling callbacks.
        from ..parallel.sp import sp_localize
        from ..parallel.tp import tp_localize
        self._sp_size = mesh.shape.get("seq", 1) if mesh is not None else 1
        self._pad_multiple = None
        if self._sp_size > 1:
            # Every batch's length must split into per-shard slices that are
            # window-band multiples (Attention._sp_call): bucket lengths to
            # multiples of seq * window * block so L/seq is a whole number
            # of bands (>= the halo) on every shard. Passed as a per-call
            # override to epoch_batches — the shared data hparams are not
            # mutated.
            import math
            need = (self._sp_size
                    * getattr(self.hp, "attn_window_size", 1)
                    * getattr(self.hp, "attn_block_size", 1))
            cur = self.data.hparams.pad_to_multiple_of
            if cur % need:
                self._pad_multiple = math.lcm(cur, need)
                print(f"seq_parallel={self._sp_size}: padding batch lengths "
                      f"to multiples of {self._pad_multiple} (was {cur})")
        from ..parallel.ep import ep_localize
        step_module = ep_localize(
            sp_localize(tp_localize(module, self._tp_size), self._sp_size),
            self._ep_size)
        self._train_step = make_train_step(step_module, objective,
                                           self.optimizer, mesh=mesh)
        self._eval_step = make_eval_step(step_module, objective, mesh=mesh)
        # Rows shard over 'data' — and jointly over 'expert' on an EP mesh.
        self._rows_multiple = (mesh.shape["data"] * self._ep_size
                               if mesh is not None else 1)

    # -- setup --------------------------------------------------------------
    def init_state(self, rng):
        sample = jnp.zeros((1, 128), jnp.int32)
        params = self.module.init(rng, sample)["params"]
        opt_state = self.optimizer.init(params)
        if self.mesh is not None:
            # tp_shardings degenerates to full replication at model axis 1;
            # with model > 1 the TP-sharded leaves (attention/FFN kernels,
            # learned-query banks) are distributed over 'model'. On an
            # expert mesh the MoE stacks shard over 'expert' instead.
            if self._ep_size > 1:
                from ..parallel.ep import ep_shardings
                p_sh = ep_shardings(params, self.mesh)
                o_sh = ep_shardings(opt_state, self.mesh)
            else:
                from ..parallel.tp import tp_shardings
                p_sh = tp_shardings(params, self.mesh, self._tp_size,
                                    self._tp_shard_vocab)
                o_sh = tp_shardings(opt_state, self.mesh, self._tp_size,
                                    self._tp_shard_vocab)
            params = jax.tree.map(jax.device_put, params, p_sh)
            opt_state = jax.tree.map(
                lambda x, s: jax.device_put(x, s) if hasattr(x, "ndim")
                else x, opt_state, o_sh)
        return params, opt_state

    def _put(self, arrays, stacked: bool = False):
        if self.mesh is None:
            return arrays
        from ..parallel.spmd import shard_batch
        return shard_batch(arrays, self.mesh, stacked=stacked)

    def _accum_groups(self, seed: int):
        """Group the epoch's batches into shape-homogeneous stacks of
        accumulate_grad_batches microbatches. Yields (stacked arrays
        [k, rows, ...], last TextBatch of the group — for the sampling
        callback).

        Partial groups DEFER across epochs instead of flushing as smaller
        stacks: every optimizer step therefore sees the one fixed
        [k, rows, L] shape per length bucket. The previous flush-at-epoch-end
        behavior emitted a [1, rows, L] twin of (nearly) every bucket —
        measured on the flagship corpus: 16 of 33 compiled train-step shapes
        were these one-use-per-epoch remainders, each a fresh multi-minute
        XLA compile (the dominant wall cost of epoch 1 at every new model
        geometry). Deferred microbatches are real data and complete with the
        next epoch's batches of the same bucket; only training's final
        partial groups (at most k-1 microbatches per bucket, once per run)
        go unused — fit() reports that count."""
        yield from defer_accum_groups(
            self.data.epoch_batches(
                "train", seed=seed, rows_multiple_of=self._rows_multiple,
                pad_to_multiple_of=self._pad_multiple),
            self.thp.accumulate_grad_batches, self._pending_groups)

    # -- validation ---------------------------------------------------------
    def validate(self, params, rng=None, max_batches: Optional[int] = None,
                 step: int = 0) -> Dict[str, float]:
        """Validation metrics as a pure function of (params, data, step).

        The eval rng is derived from (seed, step) — NOT from the fit loop's
        ambient rng chain — so two validate() calls on restored params give
        bit-identical metrics, and resume-then-validate matches
        train-through-then-validate (an explicit rng can still be passed)."""
        if rng is None:
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.thp.seed), step)
        totals: Dict[str, float] = {}
        limit = max_batches or self.thp.limit_val_batches
        # The validation batch stream is deterministic (seed=0), but
        # re-planning + re-packing it on the host every validation is real
        # wall time at a 0.1 val_check_interval (hundreds of validations per
        # run); pack once and reuse (a few MB — the test split's tokens).
        if self._val_batches is None:
            self._val_batches = list(self.data.epoch_batches(
                "test", seed=0, rows_multiple_of=self._rows_multiple,
                pad_to_multiple_of=self._pad_multiple))
        for i, batch in enumerate(self._val_batches):
            if limit is not None and i >= limit:
                break
            stats = self._eval_step(params, self._put(batch_arrays(batch)),
                                    jax.random.fold_in(rng, i))
            for k, v in stats.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        return {k: float(v) for k, v in
                self.objective.reduce_eval(totals).items()}

    # -- sampling callback --------------------------------------------------
    def _sampling_callback(self, params, step, rng, last_batch):
        """TextSamplingCallback parity (text_sampling_callback.py:13-60):
        periodic unconditional sample + posterior-mean reconstruction of the
        current batch's first document with BLEU-2 logged as train_bleu."""
        if not self.hp.log_samples:
            return
        tokenizer = self.data.tokenizer

        def decode(rows):
            return [tokenizer.decode([int(t) for t in row if t != 0])
                    for row in np.asarray(rows)]

        if self.sample_fn is not None:
            try:
                tokens = self.sample_fn(self.module, params, rng, step=step)
            except Exception as e:  # sampling must never kill training
                self.writer.text("sampling_error", repr(e), step)
                tokens = None
            if tokens is not None:
                for text in decode(tokens)[:2]:
                    self.writer.text("unconditional_sample", text, step)

        if self.reconstruct_fn is not None and last_batch is not None:
            try:
                recon = self.reconstruct_fn(self.module, params, rng,
                                            last_batch, step=step)
            except Exception as e:
                self.writer.text("sampling_error", repr(e), step)
                recon = None
            if recon is not None:
                from ..utils.math_utils import bleu_score_corpus
                original = last_batch.token_ids[0][
                    :int(last_batch.num_tokens[0])]
                original_str = tokenizer.decode(
                    [int(t) for t in original if t != 0])
                recon_strs = decode(recon)
                bleu = bleu_score_corpus(
                    [s.split(" ") for s in recon_strs],
                    [[original_str.split(" ")]] * len(recon_strs), max_n=2)
                self.writer.scalar("train_bleu", bleu, step)
                msg = "**Original**:  \n" + original_str
                for i, s in enumerate(recon_strs, start=1):
                    msg += f"  \n**Reconstruction {i}**:  \n" + s
                self.writer.text("reconstruction", msg, step)

    # -- the loop -----------------------------------------------------------
    def fit(self, rng=None, max_epochs: int = 10 ** 9,
            resume: bool = False) -> TrainOutcome:
        rng = rng if rng is not None else jax.random.PRNGKey(self.thp.seed)
        init_rng, rng = jax.random.split(rng)
        params, opt_state = self.init_state(init_rng)
        step = 0
        self._pending_groups: Dict[tuple, list] = {}

        if resume and self.ckpt is not None:
            template = {"params": params, "opt_state": opt_state,
                        "step": step, "rng": rng}
            restored = self.ckpt.restore(template)
            params, opt_state = restored["params"], restored["opt_state"]
            step, rng = int(restored["step"]), restored["rng"]
            # Orbax restores the rng key COMMITTED to device 0; params on a
            # param-sharded mesh (ep/tp) are committed to all mesh devices,
            # and jit refuses mixed committed device sets. Re-place the key
            # as uncommitted host data (mesh runs replicate it via in_specs).
            rng = jnp.asarray(np.asarray(rng))

        k_accum = self.thp.accumulate_grad_batches
        num_train_batches = max(1, self.data.num_batches("train"))
        val_every = max(1, int(num_train_batches * self.thp.val_check_interval
                               / k_accum))

        best_metric, patience_left = None, self.thp.early_stopping_patience
        history, stopped = [], "max_epochs"
        metric_name = self.hp.early_stopping_metric
        # Early stopping is disarmed while the KL weight is still annealing:
        # the monitored metric is not comparable across steps until the
        # objective stops moving (see TrainerHparams.early_stopping_start_step).
        es_start = early_stop_start_step(self.thp, self.hp)
        t0, tokens_seen = time.time(), 0

        # jax.profiler trace of a few steady-state steps (skips the compile
        # step); view in TensorBoard's profile plugin under the run dir.
        profile_n = self.thp.profile_steps
        profile_start, profiling = (3 if step < 3 else step + 2), False

        for epoch in range(max_epochs):
            for stacked, batch in self._accum_groups(self.thp.seed + epoch):
                rng, step_rng = jax.random.split(rng)
                arrays = self._put(
                    {k: jnp.asarray(v) for k, v in stacked.items()},
                    stacked=True)
                tokens_seen += int(stacked["num_tokens"].sum())
                params, opt_state, metrics = self._train_step(
                    params, opt_state, arrays, jnp.asarray(step), step_rng)
                step += 1

                if profile_n and not profiling and step == profile_start:
                    from ..utils.profiling import trace as profiler_trace
                    self._profile_ctx = profiler_trace(self.run_dir)
                    self._profile_ctx.__enter__()
                    profiling = True
                elif profiling and step >= profile_start + profile_n:
                    jax.block_until_ready(params)
                    self._profile_ctx.__exit__(None, None, None)
                    profiling, profile_n = False, 0

                if step % self.thp.log_every_n_steps == 0:
                    logged = {k: float(v) for k, v in metrics.items()}
                    elapsed = max(time.time() - t0, 1e-6)
                    logged["tokens_per_sec"] = tokens_seen / elapsed
                    self.writer.scalars(logged, step)

                if step % self.thp.sample_every_n_steps == 0:
                    rng, s_rng = jax.random.split(rng)
                    self._sampling_callback(params, step, s_rng, batch)

                if (self.ckpt is not None
                        and step % self.thp.checkpoint_every_n_steps == 0):
                    self._save(params, opt_state, step, rng)

                if step % val_every == 0:
                    val_metrics = self.validate(params, step=step)
                    self.writer.scalars(val_metrics, step)
                    history.append({"step": step, **val_metrics})
                    monitored = val_metrics.get(metric_name)
                    if monitored is not None and step >= es_start:
                        if best_metric is None or monitored < best_metric:
                            best_metric = monitored
                            patience_left = self.thp.early_stopping_patience
                            if self.ckpt is not None:
                                self._save(params, opt_state, step, rng,
                                           best=True)
                        else:
                            patience_left -= 1
                            if patience_left <= 0:
                                stopped = "early_stopping"
                                break

                if (self.hp.lr_decay_steps
                        and step >= self.hp.lr_decay_steps):
                    stopped = "lr_schedule_complete"
                    break
                if self.thp.max_steps and step >= self.thp.max_steps:
                    stopped = "max_steps"
                    break
            else:
                continue
            break

        leftover = sum(len(g) for g in self._pending_groups.values())
        if leftover:
            print(f"fit: {leftover} deferred microbatch(es) left unused at "
                  "training end (partial accumulation groups; see "
                  "_accum_groups)")
        if self.ckpt is not None:
            self._save(params, opt_state, step, rng)
            self.ckpt.close()
        self.writer.close()
        return TrainOutcome(step=step, best_metric=best_metric,
                            stopped_reason=stopped, params=params,
                            metrics_history=history)

    def _save(self, params, opt_state, step, rng, best: bool = False):
        meta = {
            "experiment": self.experiment,
            "name": self.name,
            "model_hparams": to_dict(self.hp),
            "data_hparams": to_dict(self.data.hparams),
            "trainer_hparams": to_dict(self.thp),
        }
        self.ckpt.save(step, {"params": params, "opt_state": opt_state,
                              "step": step, "rng": rng},
                       meta=meta, best=best)

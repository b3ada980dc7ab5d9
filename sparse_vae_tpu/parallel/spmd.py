"""Explicit-SPMD training/eval steps: shard_map + psum'd loss sums.

The production multi-device path. GSPMD (replicated params + sharded batch
under plain jit) is correct for pure-XLA graphs, but custom calls (the
Pallas attention / CE kernels) have no GSPMD partitioning rules — the
partitioner gathers their operands and silently serializes the hot path on
real multi-chip hardware. `make_train_step(mesh=...)` instead maps the
per-device computation explicitly with `jax.shard_map`: every device runs
the full step on its local batch shard (Pallas kernels included, untouched)
and the collectives are explicit psums over the 'data' axis (SURVEY §2.10).

Exactness: objectives expose `loss_sums` (differentiable numerators) and
`compose_loss` (normalization by token/row counts). The sharded step psums
numerators AND counts before composing, so the loss — and therefore the
gradient — is exactly the global token-weighted mean, even when shards
carry unequal real-token counts (the batcher's all-[PAD] filler rows).
A pmean of per-shard means would weight sparse shards' tokens more; this
formulation has no such bias, which tests/test_parallel.py checks to
float-exactness against a single-device simulation.

Gradient accumulation runs INSIDE the jitted step as a lax.scan over
stacked same-shape microbatches (one device dispatch per optimizer step;
SURVEY §2.10's plan), with metrics averaged over microbatches. The psum
happens once, on the accumulated gradient.

RNG semantics (pinned): the step rng is folded with the device's data-axis
index, then split per microbatch — every (shard, microbatch) gets an
independent stream, reproducible on any mesh shape.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
EXPERT_AXIS = "expert"


def seq_size(mesh: Optional[Mesh]) -> int:
    return mesh.shape.get(SEQ_AXIS, 1) if mesh is not None else 1


def ep_size(mesh: Optional[Mesh]) -> int:
    return mesh.shape.get(EXPERT_AXIS, 1) if mesh is not None else 1


def batch_specs(mesh: Mesh, stacked: bool = False) -> dict:
    """PartitionSpecs for a batch dict: rows sharded over 'data'; when the
    mesh has a 'seq' axis, token_ids' LENGTH axis is additionally sharded
    over it (sequence parallelism, parallel/sp.py) while the per-row
    num_tokens/num_bytes stay replicated across 'seq'. On an expert mesh
    the rows are sharded over ('data', 'expert') jointly — the non-MoE
    compute is pure DP over all devices (parallel/ep.py)."""
    lead = (None,) if stacked else ()
    row = P(*lead, (DATA_AXIS, EXPERT_AXIS)) if ep_size(mesh) > 1 \
        else P(*lead, DATA_AXIS)
    tok = P(*lead, DATA_AXIS, SEQ_AXIS) if seq_size(mesh) > 1 else row
    return {"token_ids": tok, "num_tokens": row, "num_bytes": row}


def shard_batch(batch: dict, mesh: Mesh, stacked: bool = False) -> dict:
    """Place a host batch dict on the mesh (rows on 'data', token length on
    'seq' when the mesh has one)."""
    specs = batch_specs(mesh, stacked)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in batch.items()}


class _SeqOnceObjective:
    """Objective adapter for a 'seq'-sharded length axis: per-ROW statistics
    (declared by the objective's ROW_SUMS / ROW_COUNTS / ROW_EVAL) are
    replicated across sequence shards, so they are zeroed on every shard but
    sequence shard 0 BEFORE the global psum — each document's KL, row count,
    and byte count enter the composition exactly once. Token-level sums are
    genuinely local to each length shard and pass through.

    Gradient note: zeroing shard>0's kl_sum routes the entire KL cotangent
    through shard 0's encoder trace; the attention collectives
    (parallel/sp.py) carry the pieces belonging to other shards' activations
    back to them, and the train step's gradient psum over 'seq' reassembles
    the exact global gradient (tested to float tolerance in test_sp.py)."""

    def __init__(self, inner):
        self.inner = inner
        hp = getattr(inner, "hp", None)
        # The multi-sample IWAE/DReG bound is nonlinear in the per-document
        # log-likelihood, so it cannot ride the linear sums composition
        # across shards — instead the model's reconstruct_ll psums its
        # per-shard row sums INTO the global per-doc value before the bound
        # (TransformerVAE.reconstruct_ll), and the resulting bound sums are
        # per-ROW statistics masked to sequence shard 0 here.
        if not getattr(hp, "loss_chunk_size", 0):
            raise ValueError(
                "sequence parallelism requires the chunked loss path "
                "(loss_chunk_size > 0): the full-logits branch shifts "
                "labels locally and would mislabel shard boundaries")

    def __getattr__(self, name):
        return getattr(self.inner, name)

    @staticmethod
    def _once(stats: dict, keys) -> dict:
        idx = jax.lax.axis_index(SEQ_AXIS)
        return {k: (jnp.where(idx == 0, v, jnp.zeros_like(v))
                    if k in keys else v)
                for k, v in stats.items()}

    def loss_sums(self, *args, **kwargs):
        sums, counts = self.inner.loss_sums(*args, **kwargs)
        return (self._once(sums, set(getattr(self.inner, "ROW_SUMS", ()))),
                self._once(counts,
                           set(getattr(self.inner, "ROW_COUNTS", ()))))

    def eval_stats(self, *args, **kwargs):
        stats = self.inner.eval_stats(*args, **kwargs)
        return self._once(stats, set(getattr(self.inner, "ROW_EVAL", ())))


def stack_microbatches(batches: list) -> dict:
    """Stack k same-shape TextBatches into [k, rows, ...] arrays."""
    import numpy as np
    return {
        "token_ids": np.stack([b.token_ids for b in batches]),
        "num_tokens": np.stack([b.num_tokens for b in batches]),
        "num_bytes": np.stack([b.num_bytes for b in batches]),
    }


def assert_compose_loss_linear(objective, sums, counts, step, atol=1e-5):
    """Verify the sharded-gradient contract: compose_loss must be LINEAR in
    `sums` (at fixed counts).

    The sharded step evaluates d loss/d sums once at the psum'd global sums
    and feeds that cotangent to the VJP of the *local* sums. That is exact
    iff the cotangent is independent of where it is evaluated — i.e. the
    composition is linear in sums (numerator/denominator form). A nonlinear
    composition (log-of-ratio, product of sums, ...) would silently produce
    wrong gradients on multi-chip while staying correct single-device.

    Checks that grad_sums compose_loss is identical at `sums` and at a
    rescaled point. Call it from a test (or a debug run) whenever a new
    objective or a new term in loss_sums lands. Raises AssertionError.
    """
    import numpy as np

    def value(s):
        return objective.compose_loss(s, counts, step)[0]

    g1 = jax.grad(value)(sums)
    g2 = jax.grad(value)(jax.tree.map(lambda x: 1.0 + 2.0 * x, sums))
    flat1, _ = jax.tree_util.tree_flatten(g1)
    flat2, _ = jax.tree_util.tree_flatten(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                                   err_msg="compose_loss is NOT linear in "
                                   "sums — the sharded gradient would be "
                                   "wrong (see assert_compose_loss_linear)")


def _seq_setup(module, objective, mesh: Optional[Mesh]):
    """Shared 'seq'-axis wiring for the train and eval steps: validates the
    sp-localized module, wraps the objective so per-ROW statistics are
    contributed once, and returns the reduction axes."""
    sp = seq_size(mesh)
    if sp > 1:
        if getattr(module.hparams, "sp_size", 1) != sp:
            raise ValueError(
                f"mesh has seq={sp} but the module's sp_size is "
                f"{getattr(module.hparams, 'sp_size', 1)} — pass the "
                "sp_localize'd twin (parallel/sp.py)")
        objective = _SeqOnceObjective(objective)
    red_axes = (DATA_AXIS, SEQ_AXIS) if sp > 1 else (DATA_AXIS,)
    return objective, red_axes


def _ep_setup(module, mesh: Optional[Mesh]) -> int:
    """'expert'-axis wiring shared by the train and eval steps: validates
    the ep-localized module and the axis combination (EP composes with
    'data' only for now), and extends the sum/stat reduction axes — batch
    rows are sharded over ('data', 'expert') jointly (batch_specs)."""
    ep = ep_size(mesh)
    if ep <= 1:
        return 1
    if mesh.shape.get("model", 1) > 1 or seq_size(mesh) > 1:
        raise NotImplementedError(
            "expert parallelism composes with the 'data' axis only")
    if getattr(module.hparams, "ep_size", 1) != ep:
        raise ValueError(
            f"mesh has expert={ep} but the module's ep_size is "
            f"{getattr(module.hparams, 'ep_size', 1)} — pass the "
            "ep_localize'd twin (parallel/ep.py)")
    return ep


def make_train_step(module, objective, optimizer,
                    mesh: Optional[Mesh] = None):
    """Build the jitted optimizer step.

    step_fn(params, opt_state, stacked_batch, step, rng)
        -> (params, opt_state, metrics)

    stacked_batch arrays carry a leading microbatch axis [k, rows, ...]
    (k = gradient-accumulation factor, static per compiled shape; use
    stack_microbatches). Loss per microbatch is the exact global
    token/row-weighted composition of psum'd loss_sums; accumulated
    gradients follow Lightning semantics (mean of per-microbatch global
    gradients, train.py:19). metrics are means over microbatches plus
    grad_norm (of the clipped-input gradient, language_model.py:120-122).
    params/opt_state buffers are donated.

    On a 2-D mesh (model axis > 1), `module` must be the TP-localized twin
    (when its config qualifies — parallel.tp.shards_vocab — the tied
    embedding/head is additionally sharded over the vocab dim with
    vocab-parallel CE)
    (parallel.tp.tp_localize): params enter with the tp_param_specs
    shardings (attention heads / FFN inner dim / learned-query banks sliced
    over 'model'), activations stay replicated over 'model', and the f/g
    collectives inside the module close the partial matmuls. Gradients of
    model-sharded params are local to their shard (psum over 'data' only —
    exactly the global gradient of that slice); replicated params' grads
    are identical across model shards. The optimizer must be built with
    make_optimizer(tp_size=...) so the global-norm clip psums sharded
    leaves' norms over 'model' (tp_global_norm) — a local norm would let
    shards clip differently and silently diverge.
    """
    tp_size = mesh.shape.get("model", 1) if mesh is not None else 1
    if tp_size > 1:
        from .tp import shards_vocab
        tp_sv = shards_vocab(module.hparams, tp_size)
    else:
        tp_sv = False
    # The loss-sum / gradient reduction axes: 'data' always; 'seq' too when
    # the length axis is sharded (each shard's sums/grads cover its tokens);
    # 'expert' too when batch rows are sharded over it (parallel/ep.py) —
    # except expert-sharded param grads, which are already 'expert'-complete
    # after the in-layer all_to_all and psum over 'data' alone.
    objective, red_axes = _seq_setup(module, objective, mesh)
    n_experts = _ep_setup(module, mesh)
    if n_experts > 1:
        red_axes = (DATA_AXIS, EXPERT_AXIS)

    def micro_grads(params, mb, step, rng):
        if mesh is None:
            def local(p):
                sums, counts = objective.loss_sums(module, p, mb, step, rng)
                return objective.compose_loss(sums, counts, step)

            (loss, metrics), grads = jax.value_and_grad(
                local, has_aux=True)(params)
            metrics["loss"] = loss
            return grads, metrics

        # Sharded: differentiate the LOCAL sums only and weight their
        # cotangent by the GLOBAL composition. compose_loss is linear in
        # `sums` (numerator/denominator form), so d loss/d local_sums ==
        # d loss/d global_sums — evaluated once at the psum'd values. This
        # avoids differentiating *through* psum, whose transpose under
        # check_vma=False is psum again and double-counts the gradient by
        # the axis size.
        def local_sums(p):
            return objective.loss_sums(module, p, mb, step, rng)

        (sums, counts), vjp = jax.vjp(local_sums, params)
        g_sums = jax.lax.psum(sums, red_axes)
        g_counts = jax.lax.psum(counts, red_axes)
        loss, metrics = objective.compose_loss(g_sums, g_counts, step)
        ct_sums = jax.grad(
            lambda s: objective.compose_loss(s, g_counts, step)[0])(g_sums)
        (grads,) = vjp((ct_sums, jax.tree.map(jnp.zeros_like, counts)))
        metrics["loss"] = loss
        return grads, metrics

    def core(params, opt_state, batch, step, rng):
        if mesh is not None:
            shard = jax.lax.axis_index(DATA_AXIS)
            if n_experts > 1:
                # Rows shard over ('data', 'expert') jointly: every device
                # holds distinct rows and needs a distinct stream.
                shard = shard * n_experts + jax.lax.axis_index(EXPERT_AXIS)
            rng = jax.random.fold_in(rng, shard)
        k = batch["token_ids"].shape[0]
        rngs = jax.random.split(rng, k)
        if k == 1:
            mb = {name: arr[0] for name, arr in batch.items()}
            grads, metrics = micro_grads(params, mb, step, rngs[0])
        else:
            def body(acc, xs):
                mb, r = xs
                g, m = micro_grads(params, mb, step, r)
                return jax.tree.map(jnp.add, acc, g), m

            zeros = jax.tree.map(jnp.zeros_like, params)
            grads, metrics_stack = jax.lax.scan(body, zeros, (batch, rngs))
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0),
                                   metrics_stack)
        if mesh is not None:
            # One collective per optimizer step: the grads of the psum'd
            # losses are partial (each device holds its shard's terms —
            # batch rows over 'data', token positions over 'seq').
            if n_experts > 1:
                # Expert-sharded stacks are 'expert'-complete already (the
                # all_to_all routed every peer's tokens through this
                # shard's experts); psum them over 'data' only. Grouped
                # into TWO collectives (one per reduction-axis set), not
                # one per leaf.
                from .ep import ep_sharded_mask
                leaves, treedef = jax.tree_util.tree_flatten(grads)
                is_ep = jax.tree.leaves(ep_sharded_mask(grads))
                ep_red = jax.lax.psum(
                    tuple(g for g, m in zip(leaves, is_ep) if m),
                    (DATA_AXIS,))
                all_red = jax.lax.psum(
                    tuple(g for g, m in zip(leaves, is_ep) if not m),
                    red_axes)
                it_ep, it_all = iter(ep_red), iter(all_red)
                grads = jax.tree_util.tree_unflatten(
                    treedef,
                    [next(it_ep) if m else next(it_all) for m in is_ep])
            else:
                grads = jax.lax.psum(grads, red_axes)
        grads = jax.tree.map(lambda g: g / k, grads)
        if tp_size > 1:
            from .tp import tp_global_norm, tp_sharded_mask
            metrics["grad_norm"] = tp_global_norm(
                grads, tp_sharded_mask(grads, tp_size, tp_sv))
        elif n_experts > 1:
            from .ep import ep_global_norm
            metrics["grad_norm"] = ep_global_norm(grads)
        else:
            metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(core, donate_argnums=(0, 1))

    rep = P()
    b_specs = batch_specs(mesh, stacked=True)
    if tp_size == 1 and n_experts == 1:
        mapped = jax.shard_map(
            core, mesh=mesh,
            in_specs=(rep, rep, b_specs, rep, rep),
            out_specs=(rep, rep, rep),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=(0, 1))

    # Param-sharded mesh (tensor- or expert-parallel): the param/opt-state
    # specs depend on the pytree structure, which is only known at the
    # first call — build the shard_map lazily.
    if tp_size > 1:
        from .tp import tp_param_specs
        spec_fn = lambda tree: tp_param_specs(tree, tp_size, tp_sv)
    else:
        from .ep import ep_param_specs
        spec_fn = ep_param_specs
    cache = {}

    def step_fn(params, opt_state, batch, step, rng):
        if "fn" not in cache:
            p_specs = spec_fn(params)
            o_specs = spec_fn(opt_state)
            mapped = jax.shard_map(
                core, mesh=mesh,
                in_specs=(p_specs, o_specs, b_specs, rep, rep),
                out_specs=(p_specs, o_specs, rep),
                check_vma=False,
            )
            cache["fn"] = jax.jit(mapped, donate_argnums=(0, 1))
        return cache["fn"](params, opt_state, batch, step, rng)

    return step_fn


def make_eval_step(module, objective, mesh: Optional[Mesh] = None):
    """Jitted eval step returning the objective's summed eval statistics
    (psum'd over 'data' when sharded — exact, since eval_stats are sums).
    On a 2-D mesh pass the TP-localized module; params enter sharded per
    tp_param_specs and every model shard computes identical stats."""
    tp_size = mesh.shape.get("model", 1) if mesh is not None else 1
    if tp_size > 1:
        from .tp import shards_vocab
        tp_sv = shards_vocab(module.hparams, tp_size)
    else:
        tp_sv = False
    objective, red_axes = _seq_setup(module, objective, mesh)
    n_experts = _ep_setup(module, mesh)
    if n_experts > 1:
        red_axes = (DATA_AXIS, EXPERT_AXIS)

    def core(params, batch, rng):
        stats = objective.eval_stats(module, params, batch, rng)
        if mesh is not None:
            stats = jax.lax.psum(stats, red_axes)
        return stats

    if mesh is None:
        return jax.jit(core)

    rep = P()
    b_specs = batch_specs(mesh, stacked=False)
    if tp_size == 1 and n_experts == 1:
        mapped = jax.shard_map(
            core, mesh=mesh,
            in_specs=(rep, b_specs, rep),
            out_specs=rep,
            check_vma=False,
        )
        return jax.jit(mapped)

    if tp_size > 1:
        from .tp import tp_param_specs
        spec_fn = lambda tree: tp_param_specs(tree, tp_size, tp_sv)
    else:
        from .ep import ep_param_specs
        spec_fn = ep_param_specs
    cache = {}

    def eval_fn(params, batch, rng):
        if "fn" not in cache:
            p_specs = spec_fn(params)
            mapped = jax.shard_map(
                core, mesh=mesh,
                in_specs=(p_specs, b_specs, rep),
                out_specs=rep,
                check_vma=False,
            )
            cache["fn"] = jax.jit(mapped)
        return cache["fn"](params, batch, rng)

    return eval_fn

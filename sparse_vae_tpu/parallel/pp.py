"""Pipeline parallelism: the decoder layer stack sharded over a 'pipe' axis.

Beyond-reference scaling work (SURVEY §2.10 lists PP as "not planned" at
reference scale — 6 layers, d512 — so this is the framework-completeness
axis, not a parity requirement): the homogeneous decoder stack of the
transformer language-model family is split into `pipe` stages, each device
holding `num_layers / pipe` layers as ONE stacked param tree (leading axis =
local layer index, sharded over 'pipe'), and microbatches stream through the
stages GPipe-style inside a single jitted `jax.shard_map` step.

Design (TPU/XLA-native, not a port of any torch pipeline engine):

- The schedule is a `lax.scan` over T = M + P - 1 ticks (M microbatches, P
  stages). Every tick, each stage runs its layer slice on its current
  activation and hands the result to the next stage with ONE
  `lax.ppermute` (stage i -> i+1; adjacent 'pipe' coordinates are adjacent
  devices, so the hand-off rides nearest-neighbor ICI). Differentiating
  through the scan + ppermute yields the reversed backward schedule
  automatically — there is no hand-written backward pipeline.
- SPMD means every stage executes the same program: the embedding runs on
  every stage but only stage 0's result is consumed (`where` on the pipe
  index), and the head+CE runs on every stage but only the LAST stage's
  contribution enters the loss sums. The redundant compute is the standard
  cost of masked-SPMD pipelining; at reference scale (embed+head ≈ a layer)
  it bounds pipeline efficiency, at depth it amortizes to nothing.
- Exactness follows parallel/spmd.py's contract: per-microbatch (nll_sum,
  token_count) vectors are psum'd over ('data', 'pipe') and composed by the
  objective per microbatch (Lightning semantics: mean of per-microbatch
  global token-weighted losses); the cotangent of the linear composition is
  evaluated once at the global sums and fed to the VJP of the local sums.
- The gradient-accumulation microbatches ARE the pipeline microbatches: one
  optimizer step consumes the whole [M, rows, L] stacked batch, backward
  included, in a single device dispatch.

Param layout: `pp_split_params` converts a canonical checkpoint tree into
{"shared": embed/head params (replicated), "layers": per-layer trees stacked
on a leading axis (sharded over 'pipe')}; `pp_merge_params` inverts it, so
checkpoints stay in the canonical single-tree format.

Scope: the AR objective on the TransformerLanguageModel family, mesh axes
('data', 'pipe'). The VAE family additionally needs its (replicated)
Perceiver encoder and per-layer z-injection threaded through the stage
function — a mechanical extension left until a config exists that is deep
enough to want it.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from .spmd import DATA_AXIS, batch_specs

PIPE_AXIS = "pipe"


def pipe_size(mesh: Optional[Mesh]) -> int:
    return mesh.shape.get(PIPE_AXIS, 1) if mesh is not None else 1


# -- param layout -------------------------------------------------------------
def pp_split_params(params: dict, num_layers: int) -> dict:
    """Canonical params tree -> {"shared": ..., "layers": stacked} where
    `layers` leaves carry a leading [num_layers] axis (to be sharded over
    'pipe')."""
    shared = {k: v for k, v in params.items() if not k.startswith("layer_")}
    layer_trees = [params[f"layer_{i}"] for i in range(num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_trees)
    return {"shared": shared, "layers": stacked}


def pp_merge_params(pp_params: dict) -> dict:
    """Inverse of pp_split_params (for checkpointing / eval outside pp)."""
    num_layers = jax.tree.leaves(pp_params["layers"])[0].shape[0]
    out = dict(pp_params["shared"])
    for i in range(num_layers):
        out[f"layer_{i}"] = jax.tree.map(lambda x: x[i],
                                         pp_params["layers"])
    return out


def pp_param_specs(tree):
    """PartitionSpec pytree: leaves under a "layers" dict key are sharded on
    their leading (layer) axis over 'pipe'; everything else is replicated.
    Works on optimizer states too — optax embeds the params tree whole, so
    the "layers" key survives in every moment tree."""
    def spec(path, _v):
        for k in path:
            if isinstance(k, jax.tree_util.DictKey) and k.key == "layers":
                return P(PIPE_AXIS)
        return P()
    return jax.tree_util.tree_map_with_path(spec, tree)


# -- optimizer ----------------------------------------------------------------
def pp_global_norm(grads: dict) -> jax.Array:
    """Exact global L2 norm of a pp gradient tree: 'layers' leaves hold only
    this stage's slice, so their squared norms are psum'd over 'pipe';
    'shared' grads are already the (replicated) global values."""
    sq = lambda t: sum(
        (jnp.sum(jnp.square(g.astype(jnp.float32)))
         for g in jax.tree.leaves(t)), jnp.asarray(0.0, jnp.float32))
    return jnp.sqrt(sq(grads["shared"])
                    + jax.lax.psum(sq(grads["layers"]), PIPE_AXIS))


def clip_by_pp_global_norm(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm semantics with the pp-correct norm (a local
    norm would let stages clip by different values and silently diverge —
    the same failure mode clip_by_tp_global_norm guards under TP)."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = pp_global_norm(updates)
        trigger = g_norm < max_norm
        updates = jax.tree.map(
            lambda t: jnp.where(trigger, t,
                                (t / g_norm.astype(t.dtype)) * max_norm),
            updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_pp_optimizer(lr: float, lr_decay_steps, grad_clip_threshold: float,
                      weight_decay: float = 0.01, warmup_steps: int = 0
                      ) -> optax.GradientTransformation:
    """training.optimizer.make_optimizer with the pp-aware global-norm clip
    (RAdam itself is elementwise, so stacked-vs-named layer params update
    identically; LAMB's per-tensor trust ratios would not — unsupported)."""
    from ..training.optimizer import make_optimizer
    return make_optimizer(lr, lr_decay_steps, grad_clip_threshold,
                          weight_decay=weight_decay,
                          warmup_steps=warmup_steps,
                          clip=clip_by_pp_global_norm(grad_clip_threshold))


# -- the pipelined step -------------------------------------------------------
def _layer_module(hp, dtype):
    """A standalone TransformerLayer configured exactly as the model's
    setup() builds its decoder layers (transformer_lm.py) — applied with one
    slice of the stacked layer params."""
    from ..models.transformer_layer import TransformerLayer
    return TransformerLayer(
        d_model=hp.d_model, num_heads=hp.num_heads, causal=True,
        sparse_self_attention=hp.sparse_self_attention,
        window_size=hp.attn_window_size, block_size=hp.attn_block_size,
        use_cross_attention=hp.cross_attention,
        use_pallas_kernel=hp.use_pallas_kernel, dtype=dtype)


def make_pp_train_step(module, objective, optimizer, mesh: Mesh,
                       deterministic: bool = False):
    """Build the jitted pipeline-parallel optimizer step.

    step_fn(pp_params, opt_state, stacked_batch, step, rng)
        -> (pp_params, opt_state, metrics)

    pp_params is the pp_split_params layout; opt_state must come from an
    optimizer built by make_pp_optimizer (the clip norm crosses stages);
    stacked_batch is the usual [M, rows, L] microbatch stack — M doubles as
    the pipeline depth (M >= pipe size keeps every stage busy; smaller M is
    correct but leaves bubbles). Loss/grad semantics match
    parallel.spmd.make_train_step bit-for-bit in expectation: mean over
    microbatches of the global token-weighted NLL (tests/test_pp.py checks
    exact equivalence against the single-device step).

    deterministic=True disables dropout (the objective's rng=None mode);
    otherwise dropout streams are folded per (data shard, microbatch,
    global layer), independent — but not positionally identical — to the
    single-device flax fold pattern.
    """
    from ..training.objectives import ARObjective
    if not isinstance(objective, ARObjective):
        raise NotImplementedError(
            "pipeline parallelism currently supports the AR objective / "
            "transformer-LM family; the VAE objective needs its encoder "
            "and z-injection staged (see module docstring)")
    hp = module.hparams
    if getattr(hp, "tp_size", 1) > 1 or getattr(hp, "sp_size", 1) > 1:
        raise NotImplementedError("pp composes with 'data' only for now — "
                                  "pass the plain (non-tp/sp) module")
    pp = mesh.shape.get(PIPE_AXIS, 1)
    if pp <= 1:
        raise ValueError("mesh has no 'pipe' axis > 1 — use "
                         "parallel.spmd.make_train_step")
    if hp.num_layers % pp:
        raise ValueError(f"num_layers {hp.num_layers} not divisible by "
                         f"pipe={pp}")
    n_local = hp.num_layers // pp
    layer_mod = _layer_module(hp, module.dtype)
    cls = type(module)

    def run_layer(lp, x, mask, drop_rng):
        return layer_mod.apply(
            {"params": lp}, x, None, mask, None, deterministic,
            rngs=None if deterministic else {"dropout": drop_rng})

    if hp.grad_checkpointing:
        run_layer = jax.checkpoint(run_layer)

    def stage(x, mask, layers_local, mb_rng, stage_idx):
        """This device's layer slice: scan over the local stacked params."""
        def body(xc, xs):
            lp, li = xs
            r = jax.random.fold_in(mb_rng, stage_idx * n_local + li)
            return run_layer(lp, xc, mask, r), None
        x, _ = jax.lax.scan(body, x, (layers_local, jnp.arange(n_local)))
        return x

    def core(pp_params, opt_state, batch, step, rng):
        s = jax.lax.axis_index(PIPE_AXIS)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        tokens = batch["token_ids"]                  # [M, b, L]
        M = tokens.shape[0]
        T = M + pp - 1

        def local_sums(ps):
            shared, layers_local = ps["shared"], ps["layers"]

            def embed(tok, m_rng):
                return module.apply(
                    {"params": shared}, tok, deterministic,
                    method=cls.embed,
                    rngs=None if deterministic
                    else {"dropout": jax.random.fold_in(m_rng,
                                                        hp.num_layers)})

            def seq_nll(hidden, labels):
                return module.apply({"params": shared}, hidden, labels,
                                    method=cls.sequence_nll)

            b, L = tokens.shape[1], tokens.shape[2]
            x0 = jnp.zeros((b, L, hp.d_model), module.dtype)

            def tick(carry, t):
                x_recv, nll_vec, cnt_vec = carry
                m = jnp.clip(t - s, 0, M - 1)        # this stage's microbatch
                tok = jax.lax.dynamic_index_in_dim(tokens, m, 0,
                                                   keepdims=False)
                mask = tok != 0
                m_rng = jax.random.fold_in(rng, m)
                x_in = jnp.where(s == 0, embed(tok, m_rng), x_recv)
                x_out = stage(x_in, mask, layers_local, m_rng, s)
                x_next = jax.lax.ppermute(
                    x_out, PIPE_AXIS, [(i, i + 1) for i in range(pp - 1)])
                # Loss contribution: the LAST stage, on ticks where its
                # microbatch index t - (pp-1) is real.
                nll_c, cnt_c = seq_nll(x_out, cls.shifted_labels(tok))
                valid = (s == pp - 1) & (t - s >= 0) & (t - s < M)
                zero = jnp.asarray(0.0, jnp.float32)
                nll_vec = nll_vec.at[m].add(
                    jnp.where(valid, nll_c.astype(jnp.float32), zero))
                cnt_vec = cnt_vec.at[m].add(
                    jnp.where(valid, cnt_c.astype(jnp.float32), zero))
                return (x_next, nll_vec, cnt_vec), None

            init = (x0, jnp.zeros((M,), jnp.float32),
                    jnp.zeros((M,), jnp.float32))
            (_, nll_vec, cnt_vec), _ = jax.lax.scan(tick, init,
                                                    jnp.arange(T))
            return {"nll_sum": nll_vec}, {"token_count": cnt_vec}

        # spmd.py's linear-composition gradient assembly, vectorized over
        # microbatches: psum the per-microbatch sums, compose each
        # microbatch at the global values, average — the cotangent of that
        # (linear) composition feeds the VJP of the local sums.
        (sums, counts), vjp = jax.vjp(local_sums, pp_params)
        g_sums = jax.lax.psum(sums, (DATA_AXIS, PIPE_AXIS))
        g_counts = jax.lax.psum(counts, (DATA_AXIS, PIPE_AXIS))

        def per_mb(ns, tc):
            return objective.compose_loss({"nll_sum": ns},
                                          {"token_count": tc}, step)
        losses, metric_stack = jax.vmap(per_mb)(g_sums["nll_sum"],
                                                g_counts["token_count"])
        metrics = jax.tree.map(jnp.mean, metric_stack)
        metrics["loss"] = jnp.mean(losses)

        ct = jax.grad(lambda sv: jnp.mean(jax.vmap(per_mb)(
            sv["nll_sum"], g_counts["token_count"])[0]))(g_sums)
        (grads,) = vjp((ct, jax.tree.map(jnp.zeros_like, counts)))
        grads = {
            "shared": jax.lax.psum(grads["shared"], (DATA_AXIS, PIPE_AXIS)),
            "layers": jax.lax.psum(grads["layers"], DATA_AXIS),
        }
        metrics["grad_norm"] = pp_global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, pp_params)
        pp_params = optax.apply_updates(pp_params, updates)
        return pp_params, opt_state, metrics

    b_specs = batch_specs(mesh, stacked=True)
    rep = P()
    cache = {}

    def step_fn(pp_params, opt_state, batch, step, rng):
        if "fn" not in cache:
            p_specs = pp_param_specs(pp_params)
            o_specs = pp_param_specs(opt_state)
            mapped = jax.shard_map(
                core, mesh=mesh,
                in_specs=(p_specs, o_specs, b_specs, rep, rep),
                out_specs=(p_specs, o_specs, rep),
                check_vma=False,
            )
            cache["fn"] = jax.jit(mapped, donate_argnums=(0, 1))
        return cache["fn"](pp_params, opt_state, batch, step, rng)

    return step_fn

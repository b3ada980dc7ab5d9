"""Pipeline parallelism: the decoder layer stack sharded over a 'pipe' axis.

Beyond-reference scaling work (SURVEY §2.10 lists PP as "not planned" at
reference scale — 6 layers, d512 — so this is the framework-completeness
axis, not a parity requirement): the homogeneous decoder stack of the
transformer families is split into `pipe` stages, each device holding
`num_layers / pipe` layers as ONE stacked param tree (leading axis = local
layer index, sharded over 'pipe'), and microbatches stream through the
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
- The VAE family pipelines the same way with one twist: the (replicated)
  Perceiver encoder + posterior run per TICK on every stage for the
  microbatch that stage is processing, with the SAME per-microbatch
  "sample" rng — so every stage derives a bitwise-identical z for its
  per-layer injection with zero communication, and each stage's partial
  encoder cotangent (through its own z uses) is reassembled by the shared-
  param psum over 'pipe'. KL statistics are counted once (last stage).
- Exactness follows parallel/spmd.py's contract: per-microbatch loss sums
  are psum'd over ('data', 'pipe') and composed by the objective per
  microbatch (Lightning semantics: mean of per-microbatch global
  token-weighted losses); the cotangent of the linear composition is
  evaluated once at the global sums and fed to the VJP of the local sums.
- The gradient-accumulation microbatches ARE the pipeline microbatches: one
  optimizer step consumes the whole [M, rows, L] stacked batch, backward
  included, in a single device dispatch.

Param layout: `pp_split_params` converts a canonical checkpoint tree into
{"shared": embed/head/encoder params (replicated), "layers": per-layer trees
stacked on a leading axis, "z_projections": the VAE's per-layer injection
Denses stacked likewise (absent for plain LMs)}; `pp_merge_params` inverts
it, so checkpoints stay in the canonical single-tree format.

Scope: the AR objective (TransformerLanguageModel) and the single-sample
ELBO VAE objective (TransformerVAE) on a ('data', 'pipe') mesh. The
multi-sample IWAE/DReG bound would pipeline K reconstruct passes per
microbatch — unimplemented until a config wants it.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from .spmd import DATA_AXIS, batch_specs

PIPE_AXIS = "pipe"
_STAGED_PREFIXES = ("layer_", "z_projection_")
_STACKED_KEYS = ("layers", "z_projections")


def pipe_size(mesh: Optional[Mesh]) -> int:
    return mesh.shape.get(PIPE_AXIS, 1) if mesh is not None else 1


# -- param layout -------------------------------------------------------------
def pp_split_params(params: dict, num_layers: int) -> dict:
    """Canonical params tree -> {"shared": ..., "layers": stacked[,
    "z_projections": stacked]} where stacked leaves carry a leading
    [num_layers] axis (to be sharded over 'pipe')."""
    shared = {k: v for k, v in params.items()
              if not k.startswith(_STAGED_PREFIXES)}
    out = {"shared": shared,
           "layers": jax.tree.map(
               lambda *xs: jnp.stack(xs),
               *[params[f"layer_{i}"] for i in range(num_layers)])}
    if "z_projection_0" in params:
        out["z_projections"] = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[params[f"z_projection_{i}"] for i in range(num_layers)])
    return out


def pp_merge_params(pp_params: dict) -> dict:
    """Inverse of pp_split_params (for checkpointing / eval outside pp)."""
    num_layers = jax.tree.leaves(pp_params["layers"])[0].shape[0]
    out = dict(pp_params["shared"])
    for i in range(num_layers):
        out[f"layer_{i}"] = jax.tree.map(lambda x: x[i],
                                         pp_params["layers"])
        if "z_projections" in pp_params:
            out[f"z_projection_{i}"] = jax.tree.map(
                lambda x: x[i], pp_params["z_projections"])
    return out


def pp_param_specs(tree):
    """PartitionSpec pytree: leaves under a "layers"/"z_projections" dict
    key are sharded on their leading (layer) axis over 'pipe'; everything
    else is replicated. Works on optimizer states too — optax embeds the
    params tree whole, so the keys survive in every moment tree."""
    def spec(path, _v):
        for k in path:
            if (isinstance(k, jax.tree_util.DictKey)
                    and k.key in _STACKED_KEYS):
                return P(PIPE_AXIS)
        return P()
    return jax.tree_util.tree_map_with_path(spec, tree)


# -- optimizer ----------------------------------------------------------------
def pp_global_norm(grads: dict) -> jax.Array:
    """Exact global L2 norm of a pp gradient tree: stage-sharded stacks hold
    only this stage's slice, so their squared norms are psum'd over 'pipe';
    'shared' grads are already the (replicated) global values."""
    sq = lambda t: sum(
        (jnp.sum(jnp.square(g.astype(jnp.float32)))
         for g in jax.tree.leaves(t)), jnp.asarray(0.0, jnp.float32))
    staged = sum((sq(grads[k]) for k in _STACKED_KEYS if k in grads),
                 jnp.asarray(0.0, jnp.float32))
    return jnp.sqrt(sq(grads["shared"]) + jax.lax.psum(staged, PIPE_AXIS))


def clip_by_pp_global_norm(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm semantics with the pp-correct norm (a local
    norm would let stages clip by different values and silently diverge —
    the same failure mode clip_by_tp_global_norm guards under TP)."""
    from ..training.optimizer import clip_by_norm_fn
    return clip_by_norm_fn(max_norm, pp_global_norm)


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
    parallel.spmd.make_train_step exactly — the per-microbatch rng is
    jax.random.split(fold_in(rng, data_index), M)[m], the production step's
    derivation, so VAE posterior samples agree bitwise (tests/test_pp.py
    checks exact equivalence against the single-device step).

    AR objective: deterministic=True disables dropout (the objective's
    rng=None mode); otherwise dropout streams are folded per (data shard,
    microbatch, global layer) — independent, but not positionally identical,
    to the single-device flax fold pattern. The VAE objective always runs
    its forwards deterministic (VAEObjective's own convention; see
    models/vae.py loss_sums NOTE) — and must: per-stage dropout would
    de-replicate the per-tick encoder recompute that keeps z identical on
    every stage.
    """
    from ..training.objectives import ARObjective
    try:
        from ..models.vae import VAEObjective
        is_vae = isinstance(objective, VAEObjective)
    except ImportError:  # pragma: no cover
        is_vae = False
    if not (isinstance(objective, ARObjective) or is_vae):
        raise NotImplementedError(
            "pipeline parallelism supports the AR objective and the "
            "single-sample VAE objective; got "
            f"{type(objective).__name__}")
    hp = module.hparams
    if is_vae:
        from ..models.transformer_vae import TransformerVAE
        if not isinstance(module, TransformerVAE):
            raise NotImplementedError(
                "the pipelined VAE path needs the transformer decoder "
                "stack (per-layer z injection); this module has no "
                "stageable layers")
        # The OBJECTIVE's hparams decide which estimator the production
        # path would run (VAEObjective.loss_sums reads self.hp), so the
        # guard must read the same source — a module/objective hparams
        # mismatch must not silently train the wrong bound.
        if getattr(objective.hp, "train_mc_samples", 1) > 1:
            raise NotImplementedError(
                "multi-sample IWAE/DReG training is not pipelined (K "
                "reconstruct passes per microbatch); use "
                "train_mc_samples=1 or the data-parallel step")
    if getattr(hp, "tp_size", 1) > 1 or getattr(hp, "sp_size", 1) > 1:
        raise NotImplementedError("pp composes with 'data' only for now — "
                                  "pass the plain (non-tp/sp) module")
    if getattr(hp, "num_experts", 0) > 1:
        # The staged scan applies layers directly, so the MoE balance
        # statistics (sown through module.apply in the production
        # objectives) would be silently DROPPED — the model would train
        # without its load-balance loss. Refuse rather than drift.
        raise NotImplementedError(
            "MoE decoders are not pipelined (the staged scan does not "
            "collect the sown balance losses); use the data- or "
            "expert-parallel step (parallel/ep.py)")
    pp = pipe_size(mesh)
    if pp <= 1:
        raise ValueError("mesh has no 'pipe' axis > 1 — use "
                         "parallel.spmd.make_train_step")
    if hp.num_layers % pp:
        raise ValueError(f"num_layers {hp.num_layers} not divisible by "
                         f"pipe={pp}")
    n_local = hp.num_layers // pp
    from ..models.transformer_lm import decoder_layer_module
    layer_mod = decoder_layer_module(hp, module.dtype)
    if is_vae:
        from ..models.transformer_vae import z_projection_module
        zproj_mod = z_projection_module(hp, module.dtype)
    else:
        zproj_mod = None
    cls = type(module)
    det = True if is_vae else deterministic

    def run_layer(lp, x, mask, drop_rng):
        return layer_mod.apply(
            {"params": lp}, x, None, mask, None, det,
            rngs=None if det else {"dropout": drop_rng})

    if hp.grad_checkpointing:
        from ..models.transformer_lm import checkpoint_policy
        run_layer = jax.checkpoint(
            run_layer, policy=checkpoint_policy(hp.remat_policy))

    def stage(x, mask, stacked, z, mb_rng, stage_idx):
        """This device's layer slice: scan over the local stacked params,
        with the VAE's per-layer z-injection (replace position 0 with
        z_projection_i(z); transformer_vae.reconstruct_hidden) when z is
        given."""
        layers_local = stacked["layers"]
        zp_local = stacked.get("z_projections")
        xs = (layers_local, zp_local, jnp.arange(n_local)) if is_vae \
            else (layers_local, jnp.arange(n_local))

        def body(xc, args):
            if is_vae:
                lp, zp, li = args
                z_hidden = jnp.broadcast_to(
                    zproj_mod.apply({"params": zp},
                                    z.astype(module.dtype)),
                    (xc.shape[0], 1, xc.shape[-1]))
                xc = jnp.concatenate([z_hidden, xc[..., 1:, :]], axis=-2)
            else:
                lp, li = args
            r = jax.random.fold_in(mb_rng, stage_idx * n_local + li)
            return run_layer(lp, xc, mask, r), None

        x, _ = jax.lax.scan(body, x, xs)
        return x

    def core(pp_params, opt_state, batch, step, rng):
        s = jax.lax.axis_index(PIPE_AXIS)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        tokens = batch["token_ids"]                  # [M, b, L]
        num_tokens = batch["num_tokens"]             # [M, b]
        M = tokens.shape[0]
        T = M + pp - 1
        mb_rngs = jax.random.split(rng, M)           # production derivation

        def local_sums(ps):
            shared = ps["shared"]
            staged = {k: ps[k] for k in _STACKED_KEYS if k in ps}

            def embed(tok, drop_rng):
                return module.apply(
                    {"params": shared}, tok, det, method=cls.embed,
                    rngs=None if det else {"dropout": drop_rng})

            def seq_nll(hidden, labels):
                return module.apply({"params": shared}, hidden, labels,
                                    method=cls.sequence_nll)

            b, L = tokens.shape[1], tokens.shape[2]
            x0 = jnp.zeros((b, L, hp.d_model), module.dtype)
            sum_keys = ["nll_sum"]
            count_keys = ["token_count"]
            if is_vae:
                sum_keys += ["kl_sum", "raw_kl_sum"]
                if b > 1:
                    sum_keys += ["marginal_kl_rows"]
                count_keys += ["row_count"]

            def tick_stats(tok, ntok, mb_rng):
                """Per-tick objective-specific pieces: returns
                (embedded input, z-or-None, stage dropout rng, extra
                stats) — the extra stats are the non-CE loss sums of this
                microbatch (KL terms for the VAE; empty for AR), consumed
                only on the last stage."""
                if not is_vae:
                    drop_rng = jax.random.fold_in(mb_rng, hp.num_layers)
                    return embed(tok, drop_rng), None, mb_rng, {}
                # VAE: replicated encoder + posterior per tick; the SAME
                # sample rng on every stage makes z identical everywhere
                # without communication.
                from ..models.vae import kl_sums
                from ..utils.distributions import DiagonalGaussian
                from ..utils.math_utils import marginal_kl
                drop_rng, sample_rng, mi_rng = jax.random.split(mb_rng, 3)
                q, raw_kl, z = module.apply(
                    {"params": shared}, tok, rngs={"sample": sample_rng},
                    method=cls.posterior_and_z)
                fb = getattr(objective.hp, "free_bits", 0.0)
                kl_for_loss = jnp.maximum(raw_kl, fb) if fb > 0.0 \
                    else raw_kl
                kl_sum, _, rows = kl_sums(kl_for_loss, ntok)
                _, raw_kl_sum, _ = kl_sums(raw_kl, ntok)
                stats = {"kl_sum": kl_sum, "raw_kl_sum": raw_kl_sum,
                         "row_count": rows}
                if b > 1:
                    detached = DiagonalGaussian(
                        jax.lax.stop_gradient(q.loc),
                        jax.lax.stop_gradient(q.scale))
                    stats["marginal_kl_rows"] = jax.lax.stop_gradient(
                        marginal_kl(detached, mi_rng,
                                    objective.mi_samples)) * rows
                return embed(tok, drop_rng), z, drop_rng, stats

            def tick(carry, t):
                x_recv, sums_vec, counts_vec = carry
                m = jnp.clip(t - s, 0, M - 1)    # this stage's microbatch
                tok = jax.lax.dynamic_index_in_dim(tokens, m, 0,
                                                   keepdims=False)
                ntok = jax.lax.dynamic_index_in_dim(num_tokens, m, 0,
                                                    keepdims=False)
                mask = tok != 0
                mb_rng = mb_rngs[m]
                emb, z, drop_rng, extra = tick_stats(tok, ntok, mb_rng)
                x_in = jnp.where(s == 0, emb, x_recv)
                x_out = stage(x_in, mask, staged, z, drop_rng, s)
                x_next = jax.lax.ppermute(
                    x_out, PIPE_AXIS, [(i, i + 1) for i in range(pp - 1)])
                # Loss contribution: the LAST stage, on ticks where its
                # microbatch index t - (pp-1) is real.
                nll_c, cnt_c = seq_nll(x_out, cls.shifted_labels(tok))
                stats = dict(extra)
                stats["nll_sum"] = nll_c
                stats["token_count"] = cnt_c
                valid = (s == pp - 1) & (t - s >= 0) & (t - s < M)
                zero = jnp.asarray(0.0, jnp.float32)
                upd = lambda vec, v: vec.at[m].add(
                    jnp.where(valid, v.astype(jnp.float32), zero))
                sums_vec = {k: upd(sums_vec[k], stats[k])
                            for k in sum_keys}
                counts_vec = {k: upd(counts_vec[k], stats[k])
                              for k in count_keys}
                return (x_next, sums_vec, counts_vec), None

            zeros = lambda keys: {k: jnp.zeros((M,), jnp.float32)
                                  for k in keys}
            init = (x0, zeros(sum_keys), zeros(count_keys))
            (_, sums_vec, counts_vec), _ = jax.lax.scan(tick, init,
                                                        jnp.arange(T))
            return sums_vec, counts_vec

        # spmd.py's linear-composition gradient assembly, vectorized over
        # microbatches: psum the per-microbatch sums, compose each
        # microbatch at the global values, average — the cotangent of that
        # (linear) composition feeds the VJP of the local sums.
        (sums, counts), vjp = jax.vjp(local_sums, pp_params)
        g_sums = jax.lax.psum(sums, (DATA_AXIS, PIPE_AXIS))
        g_counts = jax.lax.psum(counts, (DATA_AXIS, PIPE_AXIS))

        per_mb = lambda sv, cv: objective.compose_loss(sv, cv, step)
        losses, metric_stack = jax.vmap(per_mb)(g_sums, g_counts)
        metrics = jax.tree.map(jnp.mean, metric_stack)
        metrics["loss"] = jnp.mean(losses)

        ct = jax.grad(
            lambda sv: jnp.mean(jax.vmap(per_mb)(sv, g_counts)[0]))(g_sums)
        (grads,) = vjp((ct, jax.tree.map(jnp.zeros_like, counts)))
        grads = {
            k: jax.lax.psum(
                g, (DATA_AXIS, PIPE_AXIS) if k == "shared" else DATA_AXIS)
            for k, g in grads.items()
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

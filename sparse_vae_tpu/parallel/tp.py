"""Tensor parallelism for the shard_map production step (SURVEY §2.10).

Megatron-style manual TP composed with the explicit-SPMD data-parallel step
(parallel/spmd.py) on a 2-D (data, model) mesh: attention heads and the FFN
inner dimension are sharded over 'model', activations stay replicated over
'model' (sharded over 'data'), and exactly one all-reduce per attention
block / per FFN closes the partial sums. The Pallas kernels run untouched on
per-shard shapes (num_heads/tp_size heads per device) — the whole point of
the shard_map path is that GSPMD never sees their custom calls.

Collective pair (the classic f/g): because this runs under
shard_map(check_vma=False), differentiating *through* lax.psum would
transpose psum to psum and double-count gradients by the axis size (the trap
parallel/spmd.py documents). The two custom-VJP wrappers below pin the
correct transfer instead:

- reduce_activations  (f): psum forward, identity backward — closes
  row-parallel matmuls whose output cotangent is replicated.
- replicate_gradient  (g): identity forward, psum backward — marks
  replicated activations consumed by column-parallel layers, whose
  per-shard weight slices each contribute a partial input cotangent.

Weight layout (matching tp_param_specs):
- q/k/v projections, ffn_in, learned query banks: column-parallel — kernel
  P(None, 'model'), bias P('model').
- attention output projection, ffn_out: row-parallel — kernel
  P('model', None); biases stay replicated, added once (Attention corrects
  the m-fold bias after its psum; ffn_out is bias-free).
- MoE expert stacks (models/moe.py): the per-expert hidden dim is sharded —
  w_in P(None, None, 'model') / b_in P(None, 'model') column-parallel,
  w_out P(None, 'model', None) row-parallel; the router is replicated (its
  decisions must be identical on every shard).
- everything else (embeddings, LayerNorms, head, VAE-specific params):
  replicated.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# Dense submodule names whose kernels are column-parallel (sharded on the
# OUTPUT feature axis) / row-parallel (sharded on the INPUT feature axis).
_COLUMN_PARALLEL = ("q_linear", "k_linear", "v_linear", "ffn_in")
_ROW_PARALLEL = ("output_linear", "ffn_out")


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def reduce_activations(x, axis_name: str):
    """f: all-reduce partial activations forward; identity backward."""
    return jax.lax.psum(x, axis_name)


def _f_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _f_bwd(axis_name, _, ct):
    return (ct,)


reduce_activations.defvjp(_f_fwd, _f_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def replicate_gradient(x, axis_name: str):
    """g: identity forward; all-reduce the cotangent backward."""
    return x


def _g_fwd(x, axis_name):
    return x, None


def _g_bwd(axis_name, _, ct):
    return (jax.lax.psum(ct, axis_name),)


replicate_gradient.defvjp(_g_fwd, _g_bwd)


def shards_vocab(hparams, tp_size: int) -> bool:
    """Whether the TP twin also shards the tied embedding/head over the
    vocab dimension. Requires the production long-document configuration:
    tied weights (logits = h @ E^T) and the chunked-CE path (full [.., V]
    logits are never materialized, so per-shard partial-LSE statistics can
    replace them — vocab_parallel CE below). Untied or full-logit configs
    keep the embedding replicated (still correct, just not sharded)."""
    if tp_size <= 1 or not hasattr(hparams, "tie_embedding_weights"):
        return False
    d_emb = getattr(hparams, "d_embedding", None) or hparams.d_model
    return (hparams.tie_embedding_weights
            and d_emb == hparams.d_model
            and getattr(hparams, "loss_chunk_size", 0) > 0
            and hparams.vocab_size % tp_size == 0)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def vocab_parallel_embed(table, ids, axis_name: str):
    """Embedding lookup with the table sharded over the vocab dim: each
    shard contributes its rows (others zero), one psum assembles the full
    [..., D] activations. Backward: each shard accumulates gradients only
    for its own rows — no collective (the cotangent is replicated)."""
    return _vpe_fwd(table, ids, axis_name)[0]


def _vpe_fwd(table, ids, axis_name):
    vs = table.shape[0]
    off = jax.lax.axis_index(axis_name) * vs
    local = (ids >= off) & (ids < off + vs)
    rows = jnp.take(table, jnp.clip(ids - off, 0, vs - 1), axis=0)
    x = jnp.where(local[..., None], rows, 0)
    return jax.lax.psum(x, axis_name), (table, ids)


def _vpe_bwd(axis_name, res, dx):
    table, ids = res
    vs = table.shape[0]
    off = jax.lax.axis_index(axis_name) * vs
    local = (ids >= off) & (ids < off + vs)
    upd = jnp.where(local[..., None], dx, 0).reshape(-1, dx.shape[-1])
    idx = jnp.clip(ids - off, 0, vs - 1).reshape(-1)
    dtable = jnp.zeros_like(table).at[idx].add(upd.astype(table.dtype))
    return dtable, None


vocab_parallel_embed.defvjp(_vpe_fwd, _vpe_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def tied_vocab_parallel_nll(g, table, bias, labels, axis_name: str):
    """Per-token NLL of logits = g @ table^T + bias with table/bias sharded
    over the vocab dim (Megatron vocab-parallel cross-entropy).

    Each shard computes its [N, V/m] logits slice and only the softmax
    STATISTICS cross shards: a pmax for the running max, a psum for the
    sum-of-exps, and a psum for the label logit (owned by exactly one
    shard). Backward recomputes the slice, forms
    dlogits = (softmax - onehot) * dnll locally, and psums only dg (the
    activations' cotangent — partial per shard); the table/bias gradients
    stay shard-local. g: [N, D]; table: [V/m, D]; bias: [V/m]; labels [N].
    """
    return _tvp_fwd(g, table, bias, labels, axis_name)[0]


def _tvp_logits(g, table, bias):
    s = jax.lax.dot_general(g, table, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s + bias[None, :].astype(jnp.float32)


def _tvp_fwd(g, table, bias, labels, axis_name):
    vs = table.shape[0]
    off = jax.lax.axis_index(axis_name) * vs
    s = _tvp_logits(g, table, bias)                        # [N, V/m] fp32
    m = jax.lax.pmax(jnp.max(s, axis=-1), axis_name)       # [N]
    sumexp = jax.lax.psum(
        jnp.sum(jnp.exp(s - m[:, None]), axis=-1), axis_name)
    lse = m + jnp.log(sumexp)
    local = (labels >= off) & (labels < off + vs)
    lab_col = jnp.clip(labels - off, 0, vs - 1)
    lab_logit = jax.lax.psum(
        jnp.where(local,
                  jnp.take_along_axis(s, lab_col[:, None], 1)[:, 0], 0.0),
        axis_name)
    nll = lse - lab_logit
    return nll, (g, table, bias, labels, lse)


def _tvp_bwd(axis_name, res, dnll):
    g, table, bias, labels, lse = res
    vs = table.shape[0]
    off = jax.lax.axis_index(axis_name) * vs
    s = _tvp_logits(g, table, bias)
    p = jnp.exp(s - lse[:, None])
    hit = ((jnp.arange(vs)[None, :] + off) == labels[:, None])
    dl = (p - hit.astype(jnp.float32)) * dnll[:, None]     # [N, V/m]
    dg = jax.lax.psum(
        jax.lax.dot_general(dl.astype(table.dtype), table,
                            (((1,), (0,)), ((), ()))), axis_name)
    dtable = jax.lax.dot_general(dl.astype(g.dtype), g,
                                 (((0,), (0,)), ((), ())))
    dbias = jnp.sum(dl, axis=0)
    return (dg.astype(g.dtype), dtable.astype(table.dtype),
            dbias.astype(bias.dtype), None)


tied_vocab_parallel_nll.defvjp(_tvp_fwd, _tvp_bwd)


def _spec_for_path(path, value, tp_size: int, shard_vocab: bool):
    names = [p.key for p in path if hasattr(p, "key")]
    if tp_size > 1 and names:
        leaf = names[-1]
        parent = names[-2] if len(names) >= 2 else ""
        if leaf == "learned_queries":
            return P(None, None, MODEL_AXIS)
        if parent in _COLUMN_PARALLEL:
            return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
        if parent in _ROW_PARALLEL and leaf == "kernel":
            return P(MODEL_AXIS, None)
        if parent == "moe":
            # Expert stacks (models/moe.py): the hidden dim is sharded over
            # 'model' — w_in [E, D, H/m] column-parallel, w_out [E, H/m, D]
            # row-parallel, per expert. The router stays replicated.
            if leaf == "w_in":
                return P(None, None, MODEL_AXIS)
            if leaf == "b_in":
                return P(None, MODEL_AXIS)
            if leaf == "w_out":
                return P(None, MODEL_AXIS, None)
        if shard_vocab:
            # The tied embedding/head: vocab-dim sharding (Megatron
            # vocab-parallel). The cross-attention context_embedding is a
            # different, untied table and stays replicated.
            if parent == "input_embedding" and leaf == "embedding":
                return P(MODEL_AXIS, None)
            if leaf == "output_bias":
                return P(MODEL_AXIS)
    return P()


def tp_param_specs(tree, tp_size: int, shard_vocab: bool = False):
    """PartitionSpec pytree for a params (or optimizer-state) tree.

    Works on optimizer states too because optax embeds the params tree
    whole, so leaf paths end with the same (submodule, leaf) names. With
    tp_size == 1 everything is replicated (pure DP — the existing behavior).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, v: _spec_for_path(path, v, tp_size, shard_vocab), tree)


def tp_shardings(tree, mesh: Mesh, tp_size: int, shard_vocab: bool = False):
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        tp_param_specs(tree, tp_size, shard_vocab))


def tp_sharded_mask(tree, tp_size: int, shard_vocab: bool = False):
    """Bool pytree: True where the leaf is sharded over 'model'. Drives the
    TP-aware global-norm (sharded leaves' squared norms must be psum'd over
    'model'; replicated leaves are identical on every shard and must not)."""
    return jax.tree.map(lambda spec: spec != P(),
                        tp_param_specs(tree, tp_size, shard_vocab))


def tp_global_norm(tree, sharded_mask, axis_name: str = MODEL_AXIS):
    """Global L2 norm of a gradient tree whose leaves are partly sharded
    over `axis_name` (exact: equals optax.global_norm of the full tree)."""
    sq = jax.tree.map(lambda g: jnp.sum(jnp.square(g.astype(jnp.float32))),
                      tree)
    leaves = jax.tree.leaves(sq)
    masks = jax.tree.leaves(sharded_mask)
    local = sum((s for s, m in zip(leaves, masks) if not m),
                jnp.asarray(0.0, jnp.float32))
    sharded = sum((s for s, m in zip(leaves, masks) if m),
                  jnp.asarray(0.0, jnp.float32))
    return jnp.sqrt(local + jax.lax.psum(sharded, axis_name))


def tp_localize(module, tp_size: int):
    """The per-shard twin of a transformer module: same class, hparams with
    tp_size set, so every Dense/param declares its LOCAL (sliced) shape and
    the f/g collectives activate. The global module keeps tp_size=1 for
    init / eval-outside-shard_map / sampling."""
    if tp_size <= 1:
        return module
    hp = module.hparams
    if not hasattr(hp, "tp_size"):
        raise ValueError(
            f"{type(module).__name__} does not support tensor parallelism "
            "(model axis > 1); LSTM families are data-parallel only")
    return type(module)(dataclasses.replace(hp, tp_size=tp_size))

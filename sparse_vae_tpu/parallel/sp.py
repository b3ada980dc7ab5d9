"""Sequence (context) parallelism for the sparse long-document models.

The pg19 configuration trains on ONE ~102,400-token document per microbatch
(/root/reference/hparam_presets.py:150-178) — at batch 1 the data axis cannot
scale, so the TPU-native scaling axis for this regime is the LENGTH axis:
shard every [B, L] batch over a 'seq' mesh axis and exchange only what the
math requires. The sliding-window + CLS attention pattern makes that cheap:

- decoder self-attention: each shard needs its left neighbor's trailing
  `window_size` blocks of K/V (one `ppermute` halo per layer — a fixed-size
  boundary, independent of L) plus the global [CLS] block 0 (one psum
  broadcast from sequence shard 0);
- the Perceiver encoder's cross/learned-query attention over the full
  sequence: a distributed flash-style softmax — local [Q, S/n] partials,
  combined with one pmax + two psums over 'seq';
- the next-token labels: each shard's last column is the right neighbor's
  first token (one ppermute of a single column);
- per-ROW loss statistics (KL, row counts, document bounds) are replicated
  across sequence shards and contributed once, by shard 0 (parallel/spmd.py
  masks them before the global psum).

Adjoint convention (differs from parallel/tp.py — read this): the train step
psums GRADIENTS over 'seq' (each shard's backward carries the partial
gradient of ITS loss terms). Under that convention the correct VJP for a
value that physically crosses shards is the TRUE adjoint of the transfer:
psum transposes to psum (a replicated output consumed by per-shard losses —
`sum_over_shards`), and ppermute transposes to the inverse permutation
(`halo_from_left`). TP's identity-backward `reduce_activations` is for the
OTHER convention (loss replicated over 'model', grads not summed over it);
the two compose on a (data, seq, model) mesh because they act on different
axes. Both are custom_vjp-pinned because shard_map(check_vma=False) would
otherwise transpose psum to psum even where that double-counts.

Exactness: tests/test_sp.py checks the sharded loss, metrics, and one full
optimizer step against single-device execution to float tolerance.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

SEQ_AXIS = "seq"
NEG_INF = -1e9


# -- collectives with pinned adjoints ----------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1,))
def sum_over_shards(x, axis_name: str):
    """All-reduce whose output is consumed by DIFFERENT per-shard loss terms
    (the seq-parallel setting, where grads are later psum'd over the axis).
    True adjoint: the cotangents are summed — psum forward, psum backward."""
    return jax.lax.psum(x, axis_name)


def _sos_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _sos_bwd(axis_name, _, ct):
    return (jax.lax.psum(ct, axis_name),)


sum_over_shards.defvjp(_sos_fwd, _sos_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_over_shards(x, axis_name: str):
    """pmax with a pinned ZERO adjoint — used only for the softmax
    stabilization shift, which is gradient-free by shift invariance (pmax
    has no JAX differentiation rule, so even a stop_gradient around it fails
    to trace)."""
    return jax.lax.pmax(x, axis_name)


def _max_fwd(x, axis_name):
    return jax.lax.pmax(x, axis_name), x


def _max_bwd(axis_name, x, ct):
    return (jnp.zeros_like(x),)


max_over_shards.defvjp(_max_fwd, _max_bwd)


def _right_perm(n: int):
    return [(i, i + 1) for i in range(n - 1)]


def _left_perm(n: int):
    return [(i + 1, i) for i in range(n - 1)]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def halo_from_left(x, sp_size: int, axis_name: str):
    """Each shard receives its LEFT neighbor's `x` (zeros on shard 0) — the
    window-band halo. Adjoint: cotangents travel back right-to-left."""
    return jax.lax.ppermute(x, axis_name, _right_perm(sp_size))


def _halo_fwd(x, sp_size, axis_name):
    return jax.lax.ppermute(x, axis_name, _right_perm(sp_size)), None


def _halo_bwd(sp_size, axis_name, _, ct):
    return (jax.lax.ppermute(ct, axis_name, _left_perm(sp_size)),)


halo_from_left.defvjp(_halo_fwd, _halo_bwd)


def sp_shifted_labels(token_ids, sp_size: int, axis_name: str = SEQ_AXIS):
    """Next-token labels when the length axis is sharded over `axis_name`:
    each shard's last column is the RIGHT neighbor's first token; the last
    shard's is [PAD]=0 (ppermute's missing source), matching the unsharded
    shifted_labels end-pad exactly. token_ids: [rows, S_local] int."""
    nxt = jax.lax.ppermute(token_ids[:, :1], axis_name, _left_perm(sp_size))
    return jnp.concatenate([token_ids[:, 1:], nxt], axis=1)


# -- attention compute --------------------------------------------------------
def halo_blocks(window_size: int) -> int:
    """Blocks of left-neighbor K/V a shard needs: the band of a shard's
    FIRST query block covers global blocks qb-window+1..qb, i.e. the
    window_size-1 blocks before the shard (the oldest would-be halo block
    is never attended by any local query)."""
    return window_size - 1


def windowed_attention_ctx(q, k_ext, v_ext, cls_k, cls_v, start,
                           kv_mask_ext=None, cls_mask=None, *,
                           window_size: int, block_size: int):
    """Blocked causal sliding-window + CLS attention for one length shard.

    q: [B, H, S, D] queries at absolute positions start..start+S-1 (start is
    a block multiple; traced int is fine). k_ext/v_ext: [B, H, ctx+S, D] keys
    at absolute positions start-ctx..start+S-1 where ctx =
    halo_blocks(window_size)*block_size (the leading ctx rows are the
    left-neighbor halo; entries at absolute positions < 0 are garbage and
    masked by block validity). cls_k/cls_v: [B, H, block_size, D] = the
    global block 0. kv_mask_ext: [B, ctx+S] bool key-padding for k_ext;
    cls_mask: [B, block_size] for the CLS block.

    Semantics equal ops.attention.sliding_window_token_mask on the global
    sequence, restricted to this shard's query rows (tested): query block qb
    attends key blocks qb-window_size+1..qb plus block 0, causal inside the
    diagonal block; the CLS slot is consulted only when block 0 has left the
    band (qb >= window_size), so block 0 is never double-counted.
    """
    b, h, S, d = q.shape
    ws, bs = window_size, block_size
    hb = halo_blocks(ws)
    assert S % bs == 0, (S, bs)
    nb = S // bs
    assert k_ext.shape[2] == hb * bs + S, (k_ext.shape, ws, bs, S)

    kb = k_ext.reshape(b, h, nb + hb, bs, d)
    vb = v_ext.reshape(b, h, nb + hb, bs, d)
    # Local query block i sits at ext block i+hb; its band is ext blocks
    # i..i+ws-1 (global key blocks qb-ws+1..qb) — every halo block is used.
    band_idx = jnp.arange(nb)[:, None] + jnp.arange(ws)[None, :]
    k_band = jnp.take(kb, band_idx.reshape(-1), axis=2).reshape(
        b, h, nb, ws, bs, d)
    v_band = jnp.take(vb, band_idx.reshape(-1), axis=2).reshape(
        b, h, nb, ws, bs, d)
    k_all = jnp.concatenate(
        [jnp.broadcast_to(cls_k[:, :, None, None], (b, h, nb, 1, bs, d)),
         k_band], axis=3)                                   # [b,h,nb,s,bs,d]
    v_all = jnp.concatenate(
        [jnp.broadcast_to(cls_v[:, :, None, None], (b, h, nb, 1, bs, d)),
         v_band], axis=3)
    s = ws + 1

    qb4 = q.reshape(b, h, nb, bs, d)
    scores = jnp.einsum("bhnqd,bhnskd->bhnqsk", qb4, k_all,
                        preferred_element_type=jnp.float32) * (d ** -0.5)

    start_b = start // bs
    qb_global = start_b + jnp.arange(nb)                    # [nb]
    g = qb_global[:, None] + jnp.arange(ws)[None, :] - hb   # [nb, ws]
    slot_ok = jnp.concatenate(
        [(qb_global >= ws)[:, None], g >= 0], axis=1)       # [nb, s]
    mask = jnp.broadcast_to(slot_ok[:, None, :, None], (nb, bs, s, bs))
    # Causal triangle inside the diagonal slot (the last band slot, g == qb).
    tri = jnp.arange(bs)[None, :] <= jnp.arange(bs)[:, None]   # [q, k]
    diag = jnp.zeros((s,), bool).at[s - 1].set(True)
    mask = mask & jnp.where(diag[None, None, :, None],
                            tri[None, :, None, :], True)
    full = mask[None, None]                                 # [1,1,nb,bs,s,bs]
    if kv_mask_ext is not None:
        pm = kv_mask_ext.reshape(b, nb + hb, bs)
        pm_band = jnp.take(pm, band_idx.reshape(-1), axis=1).reshape(
            b, nb, ws, bs)
        pm_all = jnp.concatenate(
            [jnp.broadcast_to(cls_mask[:, None, None], (b, nb, 1, bs)),
             pm_band], axis=2)                              # [b, nb, s, bs]
        full = full & pm_all[:, None, :, None, :, :]

    scores = jnp.where(full, scores, NEG_INF)
    flat = scores.reshape(b, h, nb, bs, s * bs)
    weights = jax.nn.softmax(flat, axis=-1).astype(v_ext.dtype)
    weights = weights.reshape(b, h, nb, bs, s, bs)
    out = jnp.einsum("bhnqsk,bhnskd->bhnqd", weights, v_all)
    return out.reshape(b, h, S, d)


def seq_parallel_cross_attention(q, k, v, kv_mask, axis_name: str):
    """Attention of replicated queries over a 'seq'-sharded key axis (the
    Perceiver's learned-query / cross-attention over the full document):
    distributed flash-style softmax — local partials combined with one pmax
    (stop-gradient: softmax is shift-invariant, so the max carries no
    gradient) and two psums over `axis_name`.

    q: [B, H, Q, D] (replicated over 'seq'); k/v: [B, H, S_local, D];
    kv_mask: [B, S_local] bool or None. Returns [B, H, Q, D] (replicated).
    """
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, NEG_INF)
    m = max_over_shards(jnp.max(scores, axis=-1), axis_name)  # [B, H, Q]
    e = jnp.exp(scores - m[..., None])                      # fp32, <= 1
    den = sum_over_shards(jnp.sum(e, axis=-1), axis_name)   # [B, H, Q]
    num = sum_over_shards(
        jnp.einsum("bhqk,bhkd->bhqd", e.astype(v.dtype), v), axis_name)
    return (num / jnp.maximum(den, 1e-30)[..., None].astype(num.dtype)
            ).astype(v.dtype)


# -- module localization ------------------------------------------------------
def sp_localize(module, sp_size: int):
    """The per-shard twin of a transformer module for a 'seq' mesh axis:
    same class, hparams with sp_size set, so the attention layers activate
    the halo/combine paths and labels shift across shards. The global module
    keeps sp_size=1 for init / sampling / eval outside shard_map (params are
    replicated over 'seq', so they are interchangeable)."""
    if sp_size <= 1:
        return module
    hp = module.hparams
    if not hasattr(hp, "sp_size"):
        raise ValueError(
            f"{type(module).__name__} does not support sequence parallelism "
            "(seq axis > 1); only the transformer families shard the length "
            "axis")
    if not getattr(hp, "sparse_self_attention", False):
        raise ValueError(
            "sequence parallelism requires the sparse sliding-window "
            "decoder (dense causal self-attention has no bounded halo); "
            "set sparse_self_attention=true")
    return type(module)(dataclasses.replace(hp, sp_size=sp_size))

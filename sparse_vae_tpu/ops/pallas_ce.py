"""Fused Pallas softmax cross-entropy over the tied output head.

The framework's other big-V hot loop besides attention: the reference
chunked its >2^30-element logits to dodge int32 CUDA limits
(/root/reference/sparse_vae/core/language_model.py:161-170); the XLA path
here (ops/cross_entropy.py) already fuses projection+CE per sequence chunk,
but the [tokens, 32768] logits still round-trip HBM between the matmul and
the reduce/convert/select passes — profiled at ~35% of the train step.

These kernels keep each logits tile in VMEM for its whole lifetime:

    forward  grid = (token_tiles, vocab_tiles)  — online max/sum-exp; emits
             per-token lse, logits never leave VMEM. The label logit is a
             rowwise g . E[label] gather OUTSIDE the kernel (nll = lse -
             label_logit): in-kernel it costs two extra serial VPU sweeps
             (iota-compare + masked sum) per tile that cannot overlap the
             MXU within a Mosaic body.
    dg       grid = (token_tiles, vocab_tiles)  — recomputes the tile,
             p = exp(s - lse), accumulates dg = (p * dnll) @ E; the
             -dnll * E[label] one-hot term is applied outside (same gather).
    dE/db    grid = (vocab_tiles, token_tiles)  — same recompute, opposite
             nesting, accumulates dE = ((p - onehot(label)) * dnll)^T g and
             dbias (this kernel keeps the one-hot: dbias needs it and the
             scatter-add alternative serializes on TPU).

Everything is tied-head shaped: logits = g @ table^T + bias with
table = the input embedding [V, D] (transformer_lm.py project()).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile(g_ref, e_ref, bias_ref):
    """One (Tt, Vt) logits tile in fp32, never leaving VMEM."""
    s = jax.lax.dot_general(
        g_ref[...], e_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return s + bias_ref[0][None, :]


def _label_hit(labels, v, vt: int, shape):
    """One-hot [Tt, Vt] mask of each row's label within this vocab tile
    (gather along lanes is a masked sum on TPU, not a dynamic gather)."""
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + v * vt
    return col == labels[:, None]


def _fwd_kernel(g_ref, e_ref, bias_ref,
                lse_ref,
                m_scr, l_scr, *, vt: int):
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)

    s = _tile(g_ref, e_ref, bias_ref)                     # [Tt, Vt]

    m_prev, l_prev = m_scr[0], l_scr[0]
    m_curr = jnp.max(s, axis=1)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    l_next = alpha * l_prev + jnp.sum(jnp.exp(s - m_next[:, None]), axis=1)
    m_scr[0], l_scr[0] = m_next, l_next

    @pl.when(v == pl.num_programs(1) - 1)
    def _store():
        lse_ref[0, 0] = m_scr[0] + jnp.log(l_scr[0])


def _dg_kernel(g_ref, e_ref, bias_ref, lse_ref, dnll_ref,
               dg_ref, acc_scr, *, vt: int):
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    s = _tile(g_ref, e_ref, bias_ref)
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    dl = p * dnll_ref[0, 0][:, None]
    acc_scr[...] += jax.lax.dot_general(
        dl.astype(e_ref.dtype), e_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [Tt, D]

    @pl.when(v == pl.num_programs(1) - 1)
    def _store():
        dg_ref[...] = acc_scr[...].astype(dg_ref.dtype)


def _de_kernel(g_ref, e_ref, bias_ref, labels_ref, lse_ref, dnll_ref,
               de_ref, db_ref, de_scr, db_scr, *, vt: int):
    v = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        de_scr[...] = jnp.zeros_like(de_scr)
        db_scr[...] = jnp.zeros_like(db_scr)

    s = _tile(g_ref, e_ref, bias_ref)
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    hit = _label_hit(labels_ref[0, 0], v, vt, s.shape)
    dl = (p - hit.astype(jnp.float32)) * dnll_ref[0, 0][:, None]
    de_scr[...] += jax.lax.dot_general(
        dl.astype(g_ref.dtype), g_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [Vt, D]
    db_scr[0] += jnp.sum(dl, axis=0)

    @pl.when(t == pl.num_programs(1) - 1)
    def _store():
        de_ref[...] = de_scr[...].astype(de_ref.dtype)
        db_ref[0] = db_scr[0].astype(db_ref.dtype)


def _pad_tokens(g, labels, tt: int):
    n = g.shape[0]
    pad = (-n) % tt
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad))
    return g, labels, n


def _label_logit(g, rows, bias, labels):
    """Rowwise logits[i, labels[i]] from pre-gathered label rows
    (rows = table[labels], the embedding-lookup pattern XLA lowers
    natively on TPU — far cheaper than an in-kernel one-hot masked sum
    over every [Tt, Vt] tile)."""
    return (jnp.sum(g.astype(jnp.float32) * rows.astype(jnp.float32),
                    axis=-1)
            + bias.astype(jnp.float32)[labels])


@functools.partial(jax.jit, static_argnames=("tt", "vt", "interpret"))
def _fwd(g, table, bias, labels, tt: int, vt: int, interpret: bool):
    g, labels, n = _pad_tokens(g, labels, tt)
    npad, d = g.shape
    V = table.shape[0]
    assert V % vt == 0, (V, vt)
    grid = (npad // tt, V // vt)

    lse = pl.pallas_call(
        functools.partial(_fwd_kernel, vt=vt),
        out_shape=jax.ShapeDtypeStruct((npad // tt, 1, tt), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tt, d), lambda t, v: (t, 0)),
            pl.BlockSpec((vt, d), lambda t, v: (v, 0)),
            pl.BlockSpec((1, vt), lambda t, v: (0, v)),
        ],
        out_specs=pl.BlockSpec((1, 1, tt), lambda t, v: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((1, tt), jnp.float32),
                        pltpu.VMEM((1, tt), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(g, table, bias.reshape(1, -1).astype(jnp.float32))
    lse = lse.reshape(-1)
    # Gather the label rows ONCE: the nll here and the backward's -onehot
    # dg correction both need table[labels] — carrying the [npad, D] rows
    # (table dtype) through the residuals saves the backward a second
    # ~200 MB scattered-row gather.
    rows = table[labels]                                  # [npad, D]
    nll = lse[:n] - _label_logit(g[:n], rows[:n], bias, labels[:n])
    return nll, lse, g, labels, rows


@functools.partial(jax.jit, static_argnames=("tt", "vt", "interpret"))
def _bwd(g_padded, table, bias, labels_padded, lse, dnll, label_rows,
         tt: int, vt: int, interpret: bool):
    npad, d = g_padded.shape
    V = table.shape[0]
    grid_t, grid_v = npad // tt, V // vt
    pad = npad - dnll.shape[0]
    if pad:
        dnll = jnp.pad(dnll, (0, pad))
    dnll2 = dnll.reshape(-1, 1, tt).astype(jnp.float32)
    lse2 = lse.reshape(-1, 1, tt)
    labels2 = labels_padded.reshape(-1, 1, tt)
    bias2 = bias.reshape(1, -1).astype(jnp.float32)

    common = [
        pl.BlockSpec((tt, d), lambda t, v: (t, 0)),
        pl.BlockSpec((vt, d), lambda t, v: (v, 0)),
        pl.BlockSpec((1, vt), lambda t, v: (0, v)),
        pl.BlockSpec((1, 1, tt), lambda t, v: (t, 0, 0)),
        pl.BlockSpec((1, 1, tt), lambda t, v: (t, 0, 0)),
    ]
    dg = pl.pallas_call(
        functools.partial(_dg_kernel, vt=vt),
        # fp32 out: the -onehot correction below cancels against the
        # kernel's p@E term almost exactly for well-predicted tokens
        # (p[label] ~ 1 => dg ~ 0); subtracting two bf16 roundings would
        # leave absolute noise far above the true near-zero gradient, so
        # the cancellation must happen in fp32 and round once at the end.
        out_shape=jax.ShapeDtypeStruct((npad, d), jnp.float32),
        grid=(grid_t, grid_v),
        in_specs=common,
        out_specs=pl.BlockSpec((tt, d), lambda t, v: (t, 0)),
        scratch_shapes=[pltpu.VMEM((tt, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(g_padded, table, bias2, lse2, dnll2)
    # The -onehot(label) part of dlogits, using the label rows E[label]
    # already gathered by the forward (carried in the residuals):
    # dg_full = ((p - onehot) * dnll) @ E = kernel - dnll * E[label].
    dg = (dg - dnll2.reshape(-1, 1)
          * label_rows.astype(jnp.float32)).astype(g_padded.dtype)

    swapped = [
        pl.BlockSpec((tt, d), lambda v, t: (t, 0)),
        pl.BlockSpec((vt, d), lambda v, t: (v, 0)),
        pl.BlockSpec((1, vt), lambda v, t: (0, v)),
        pl.BlockSpec((1, 1, tt), lambda v, t: (t, 0, 0)),
        pl.BlockSpec((1, 1, tt), lambda v, t: (t, 0, 0)),
        pl.BlockSpec((1, 1, tt), lambda v, t: (t, 0, 0)),
    ]
    de, db = pl.pallas_call(
        functools.partial(_de_kernel, vt=vt),
        out_shape=(jax.ShapeDtypeStruct((V, d), table.dtype),
                   jax.ShapeDtypeStruct((1, V), jnp.float32)),
        grid=(grid_v, grid_t),
        in_specs=swapped,
        out_specs=(pl.BlockSpec((vt, d), lambda v, t: (v, 0)),
                   pl.BlockSpec((1, vt), lambda v, t: (0, v))),
        scratch_shapes=[pltpu.VMEM((vt, d), jnp.float32),
                        pltpu.VMEM((1, vt), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(g_padded, table, bias2, labels2, lse2, dnll2)

    return dg, de, db.reshape(-1).astype(bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_tied_cross_entropy(g, table, bias, labels, tt: int = 1024,
                             vt: int = 1024, interpret: bool = False):
    """Per-token NLL of logits = g @ table^T + bias, fused on TPU.

    g: [N, D] (any float dtype), table: [V, D], bias: [V], labels: [N]
    int32 (0 = PAD; the caller masks). Returns nll [N] fp32. Differentiable
    in g / table / bias via the fused backward kernels.

    Tile defaults from the on-chip sweep at the bench shape (n=102400,
    V=32768, D=512; bench.py --mode cetune, round 3): tt=1024/vt=1024
    measured 11.6% faster fwd+bwd than the previous 512/1024.
    """
    nll, _, _, _, _ = _fwd(g, table, bias, labels, tt, vt, interpret)
    return nll


def _fwd_rule(g, table, bias, labels, tt, vt, interpret):
    nll, lse, g_padded, labels_padded, rows = _fwd(g, table, bias, labels,
                                                   tt, vt, interpret)
    return nll, (g_padded, table, bias, labels_padded, lse, rows)


def _bwd_rule(tt, vt, interpret, residuals, dnll):
    g_padded, table, bias, labels_padded, lse, rows = residuals
    dg, de, db = _bwd(g_padded, table, bias, labels_padded, lse, dnll, rows,
                      tt, vt, interpret)
    return dg[:dnll.shape[0]], de, db, None


fused_tied_cross_entropy.defvjp(_fwd_rule, _bwd_rule)

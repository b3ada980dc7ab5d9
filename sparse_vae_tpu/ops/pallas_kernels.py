"""Fused Pallas (Mosaic) kernels for sliding-window block-sparse attention.

The TPU-native replacement for the reference's Triton block-sparse attention
(/root/reference/sparse_vae/core/sparse_attention.py: banded SDD matmul ->
blocked softmax -> DSD matmul, and sparse_matmul.py's vendored kernels).
Instead of three kernel launches with block lookup tables, fused flash-style
kernels walk the static band:

    forward   grid = (batch, num_q_blocks)   slots unrolled in-kernel
    dq        grid = (batch, num_q_blocks)   slots unrolled in-kernel
    dk/dv     grid = (batch, num_k_blocks)   attending q blocks unrolled
    dk/dv CLS grid = (batch, num_q_blocks - left)   sequential accumulation

Each query block's attended key blocks (the banded window plus the
always-attended [CLS] block, sparse_attention.py:55-57) arrive as separate
BlockSpec inputs — the index maps stream exactly the K/V tiles the sparsity
pattern touches, O(L * window) HBM traffic, no L x L anything. The band loop
is unrolled inside one grid step with the online softmax carried in
registers: no VMEM scratch round-trips, no @pl.when phase logic, and every
grid dimension is "parallel" so Mosaic pipelines the DMAs. All heads of a
batch row are processed together (batched MXU matmuls, one DMA per K/V block
covering every head). Padding enters as per-row valid lengths via scalar
prefetch (SMEM) — the batcher only right-pads, so a prefix length is the
whole mask.

Backward: standard flash-attention recomputation — the forward additionally
emits the per-row log-sum-exp, the backward recomputes p = exp(s - lse) per
tile and accumulates dq over a query block's key slots, and dk/dv over a
key block's attending query blocks. The [CLS] key block is attended by ALL
query blocks, which breaks the banded slot structure; its beyond-band
contributions accumulate in a separate kernel whose grid walks query blocks
sequentially into one VMEM accumulator.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _band_left(window_size: int, causal: bool) -> int:
    """Blocks the band extends behind (and including) the diagonal:
    the full window for causal layouts, the ceil-half for bidirectional
    (sparse_attention.py:46-48)."""
    return window_size if causal else (window_size + 1) // 2


def _slot_to_block(qb, slot, window_size: int, num_k_blocks: int,
                   causal: bool, include_cls: bool):
    """Map (q block, band slot) -> (k block index, validity).

    Slot 0 is the [CLS] block when include_cls (valid only when the band
    does not already reach block 0 — avoids double counting); the remaining
    slots are the band. `qb` and the returned block index live in the SAME
    (key) block coordinate system — for the sequence-parallel q_off variant
    the caller passes qb already shifted into extended-key coordinates.
    """
    band_slot = slot - 1 if include_cls else slot
    left = _band_left(window_size, causal)
    band_block = qb - (left - 1) + band_slot
    band_valid = (band_block >= 0) & (band_block < num_k_blocks)
    clipped = jnp.clip(band_block, 0, num_k_blocks - 1)
    if include_cls and slot == 0:
        first_band = qb - (left - 1)  # leftmost band block
        return jnp.zeros_like(clipped), first_band > 0
    return clipped, band_valid


def _band_q_for_k(kb, slot, window_size: int, num_q_blocks: int,
                  causal: bool, q_off: int = 0):
    """Inverse band map: the `slot`-th query block attending key block kb.
    kb is in band(qb) iff qb in [kb + left - window, kb + left - 1]. With
    q_off (sequence parallelism: queries start q_off blocks into the
    extended key axis), the returned index is LOCAL to the q tensor and
    validity additionally requires it to exist there."""
    left = _band_left(window_size, causal)
    qb = kb + left - window_size + slot - q_off
    valid = (qb >= 0) & (qb < num_q_blocks)
    return jnp.clip(qb, 0, num_q_blocks - 1), valid


def _tile_mask(qb, kb, valid, shape_qk, length, block_size: int,
               causal: bool):
    """[bq, bk] element mask for one (q block, k block) tile: slot validity,
    key-padding prefix, and the causal triangle."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape_qk, 0) + qb * block_size
    col = jax.lax.broadcasted_iota(jnp.int32, shape_qk, 1) + kb * block_size
    mask = (col < length) & valid
    if causal:
        mask = mask & (col <= row)
    return mask


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(lengths_ref, q_ref, *refs, window_size: int,
                block_size: int, num_k_blocks: int, causal: bool,
                include_cls: bool, sm_scale: float, slots: int,
                q_off: int = 0):
    bi = pl.program_id(0)
    qb = pl.program_id(1) + q_off   # key-axis block coordinates
    k_refs, v_refs = refs[:slots], refs[slots:2 * slots]
    o_ref, lse_ref = refs[2 * slots], refs[2 * slots + 1]

    q = q_ref[0]                                       # [H, bq, d]
    h, bq, d = q.shape
    length = lengths_ref[bi]

    m = jnp.full((h, bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((h, bq, 1), jnp.float32)
    acc = jnp.zeros((h, bq, d), jnp.float32)

    for slot in range(slots):
        k_block, valid = _slot_to_block(qb, slot, window_size, num_k_blocks,
                                        causal, include_cls)
        k = k_refs[slot][0]                            # [H, bk, d]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale
        mask = _tile_mask(qb, k_block, valid, s.shape[1:], length,
                          block_size, causal)
        s = jnp.where(mask[None], s, MASK_VALUE)

        m_curr = jnp.max(s, axis=2, keepdims=True)     # [H, bq, 1]
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)                        # [H, bq, bk]
        l = alpha * l + jnp.sum(p, axis=2, keepdims=True)
        v = v_refs[slot][0]
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m = m_next

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l_safe))[..., 0]


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "block_size", "causal", "include_cls",
                     "interpret", "q_off"))
def _sliding_window_attention_fwd_pallas(
        q, k, v, kv_mask, *, window_size: int, block_size: int,
        causal: bool, include_cls: bool, interpret: bool = False,
        lengths=None, q_off: int = 0):
    """q: [B, H, Lq, D], k/v: [B, H, Lk, D] with Lq + q_off*block_size == Lk
    (q_off=0: the square single-device case; q_off=window_size: the
    sequence-parallel extended-key case — query block i sits at key block
    i + q_off). `lengths` overrides the kv_mask-derived per-row valid KEY
    prefix (in key-axis positions)."""
    b, h, Lq, d = q.shape
    Lk = k.shape[2]
    assert Lq % block_size == 0 and Lk % block_size == 0
    assert Lk == Lq + q_off * block_size, (Lq, Lk, q_off)
    nq = Lq // block_size
    nk = Lk // block_size
    slots = window_size + (1 if include_cls else 0)

    if lengths is None:
        if kv_mask is None:
            lengths = jnp.full((b,), Lk, jnp.int32)
        else:
            # Right-padding only => the mask is a prefix; row sum = length.
            lengths = jnp.sum(kv_mask.astype(jnp.int32), axis=-1)

    def k_index(slot):
        def index(bi, qb, lens):
            kb, _ = _slot_to_block(qb + q_off, slot, window_size, nk,
                                   causal, include_cls)
            return (bi, 0, kb, 0)
        return index

    qspec = pl.BlockSpec((1, h, block_size, d),
                         lambda bi, qb, lens: (bi, 0, qb, 0))
    kspecs = [pl.BlockSpec((1, h, block_size, d), k_index(s))
              for s in range(slots)]

    kernel = functools.partial(
        _fwd_kernel, window_size=window_size, block_size=block_size,
        num_k_blocks=nk, causal=causal, include_cls=include_cls,
        sm_scale=d ** -0.5, slots=slots, q_off=q_off)

    out, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b, h, Lq, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, Lq), jnp.float32)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nq),
            in_specs=[qspec] + kspecs + kspecs,
            out_specs=(
                pl.BlockSpec((1, h, block_size, d),
                             lambda bi, qb, lens: (bi, 0, qb, 0)),
                pl.BlockSpec((1, h, block_size),
                             lambda bi, qb, lens: (bi, 0, qb)),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths, q, *([k] * slots), *([v] * slots))
    return out, lse, lengths


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _p_and_ds(q, k, v, do, lse, delta, mask, sm_scale):
    """Shared backward math for one (q block, k block) tile: recompute
    p = exp(s - lse) under the mask and ds = p * (dp - delta) * scale."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * sm_scale       # [H, bq, bk]
    p = jnp.where(mask[None], jnp.exp(s - lse[..., None]), 0.0)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [H, bq, bk]
    ds = p * (dp - delta[..., None]) * sm_scale
    return p, ds


def _dq_kernel(lengths_ref, q_ref, do_ref, lse_ref, delta_ref, *refs,
               window_size: int, block_size: int, num_k_blocks: int,
               causal: bool, include_cls: bool, sm_scale: float, slots: int,
               q_off: int = 0):
    bi = pl.program_id(0)
    qb = pl.program_id(1) + q_off
    k_refs, v_refs = refs[:slots], refs[slots:2 * slots]
    dq_ref = refs[2 * slots]

    q, do = q_ref[0], do_ref[0]
    lse, delta = lse_ref[0], delta_ref[0]
    h, bq, d = q.shape
    length = lengths_ref[bi]

    acc = jnp.zeros((h, bq, d), jnp.float32)
    for slot in range(slots):
        k_block, valid = _slot_to_block(qb, slot, window_size, num_k_blocks,
                                        causal, include_cls)
        k, v = k_refs[slot][0], v_refs[slot][0]
        mask = _tile_mask(qb, k_block, valid, (bq, k.shape[1]), length,
                          block_size, causal)
        _, ds = _p_and_ds(q, k, v, do, lse, delta, mask, sm_scale)
        acc += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [H, bq, d]
    dq_ref[0] = acc.astype(dq_ref.dtype)


def _dkv_band_kernel(lengths_ref, k_ref, v_ref, *refs, window_size: int,
                     block_size: int, num_q_blocks: int, causal: bool,
                     sm_scale: float, q_off: int = 0):
    bi = pl.program_id(0)
    kb = pl.program_id(1)
    w = window_size
    q_refs, do_refs = refs[:w], refs[w:2 * w]
    lse_refs, delta_refs = refs[2 * w:3 * w], refs[3 * w:4 * w]
    dk_ref, dv_ref = refs[4 * w], refs[4 * w + 1]

    k, v = k_ref[0], v_ref[0]
    h, bk, d = k.shape
    length = lengths_ref[bi]

    dk = jnp.zeros((h, bk, d), jnp.float32)
    dv = jnp.zeros((h, bk, d), jnp.float32)
    for slot in range(w):
        qb, valid = _band_q_for_k(kb, slot, window_size, num_q_blocks,
                                  causal, q_off)
        q, do = q_refs[slot][0], do_refs[slot][0]
        mask = _tile_mask(qb + q_off, kb, valid, (q.shape[1], bk), length,
                          block_size, causal)
        p, ds = _p_and_ds(q, k, v, do, lse_refs[slot][0],
                          delta_refs[slot][0], mask, sm_scale)
        # dv += p^T do ; dk += ds^T q  (contract the query dim)
        dv += jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [H, bk, d]
        dk += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _dkv_cls_kernel(
    lengths_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, block_size: int, q_start: int, causal: bool, sm_scale: float,
):
    """Beyond-band contributions of every query block to key block 0 (the
    [CLS] column). Grid walks q blocks q_start.. sequentially, accumulating
    into one [H, bs, d] pair written once at the end."""
    bi = pl.program_id(0)
    j = pl.program_id(1)
    qb = q_start + j

    @pl.when(j == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    mask = _tile_mask(qb, 0, True, (q.shape[1], k.shape[1]),
                      lengths_ref[bi], block_size, causal)
    p, ds = _p_and_ds(q, k, v, do, lse_ref[0], delta_ref[0], mask, sm_scale)
    dv_scratch[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dk_scratch[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _store():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "block_size", "causal", "include_cls",
                     "interpret", "q_off"))
def _bwd_pallas(q, k, v, lengths, lse, o, do, *, window_size: int,
                block_size: int, causal: bool, include_cls: bool,
                interpret: bool = False, q_off: int = 0):
    b, h, Lq, d = q.shape
    Lk = k.shape[2]
    nq = Lq // block_size
    nk = Lk // block_size
    assert Lk == Lq + q_off * block_size, (Lq, Lk, q_off)
    slots = window_size + (1 if include_cls else 0)
    sm_scale = d ** -0.5

    # delta_i = rowsum(do_i * o_i): tiny elementwise reduce, XLA fuses it.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                                   # [B, H, Lq]

    qspec = pl.BlockSpec((1, h, block_size, d),
                         lambda bi, qb, lens: (bi, 0, qb, 0))
    rowspec = pl.BlockSpec((1, h, block_size),
                           lambda bi, qb, lens: (bi, 0, qb))

    def k_index(slot):
        def index(bi, qb, lens):
            kb, _ = _slot_to_block(qb + q_off, slot, window_size, nk,
                                   causal, include_cls)
            return (bi, 0, kb, 0)
        return index

    kspecs = [pl.BlockSpec((1, h, block_size, d), k_index(s))
              for s in range(slots)]

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, window_size=window_size, block_size=block_size,
            num_k_blocks=nk, causal=causal, include_cls=include_cls,
            sm_scale=sm_scale, slots=slots, q_off=q_off),
        out_shape=jax.ShapeDtypeStruct((b, h, Lq, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nq),
            in_specs=[qspec, qspec, rowspec, rowspec] + kspecs + kspecs,
            out_specs=pl.BlockSpec(
                (1, h, block_size, d),
                lambda bi, qb, lens: (bi, 0, qb, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(lengths, q, do, lse, delta, *([k] * slots), *([v] * slots))

    # Band part of dk/dv: walk each key block's attending query blocks.
    def q_index(slot):
        def index(bi, kb, lens):
            qb, _ = _band_q_for_k(kb, slot, window_size, nq, causal, q_off)
            return (bi, 0, qb, 0)
        return index

    def qrow_index(slot):
        def index(bi, kb, lens):
            qb, _ = _band_q_for_k(kb, slot, window_size, nq, causal, q_off)
            return (bi, 0, qb)
        return index

    kself = pl.BlockSpec((1, h, block_size, d),
                         lambda bi, kb, lens: (bi, 0, kb, 0))
    w = window_size
    qspecs = [pl.BlockSpec((1, h, block_size, d), q_index(s))
              for s in range(w)]
    qrows = [pl.BlockSpec((1, h, block_size), qrow_index(s))
             for s in range(w)]
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_band_kernel, window_size=window_size,
            block_size=block_size, num_q_blocks=nq, causal=causal,
            sm_scale=sm_scale, q_off=q_off),
        out_shape=(jax.ShapeDtypeStruct((b, h, Lk, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, Lk, d), v.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nk),
            in_specs=[kself, kself] + qspecs + qspecs + qrows + qrows,
            out_specs=(
                pl.BlockSpec((1, h, block_size, d),
                             lambda bi, kb, lens: (bi, 0, kb, 0)),
                pl.BlockSpec((1, h, block_size, d),
                             lambda bi, kb, lens: (bi, 0, kb, 0)),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(lengths, k, v, *([q] * w), *([do] * w), *([lse] * w), *([delta] * w))

    # CLS column: query blocks beyond band(0) also hit key block 0.
    left = _band_left(window_size, causal)
    nb = nq  # the CLS kernel below runs only in the square q_off=0 case
    assert not (include_cls and q_off), "CLS column handled by the caller"
    if include_cls and nb > left:
        cspec = pl.BlockSpec((1, h, block_size, d),
                             lambda bi, j, lens: (bi, 0, left + j, 0))
        crow = pl.BlockSpec((1, h, block_size),
                            lambda bi, j, lens: (bi, 0, left + j))
        k0 = pl.BlockSpec((1, h, block_size, d),
                          lambda bi, j, lens: (bi, 0, 0, 0))
        dk0, dv0 = pl.pallas_call(
            functools.partial(
                _dkv_cls_kernel, block_size=block_size, q_start=left,
                causal=causal, sm_scale=sm_scale),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, block_size, d), k.dtype),
                jax.ShapeDtypeStruct((b, h, block_size, d), v.dtype)),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, nb - left),
                in_specs=[cspec, k0, k0, cspec, crow, crow],
                out_specs=(
                    pl.BlockSpec((1, h, block_size, d),
                                 lambda bi, j, lens: (bi, 0, 0, 0)),
                    pl.BlockSpec((1, h, block_size, d),
                                 lambda bi, j, lens: (bi, 0, 0, 0)),
                ),
                scratch_shapes=[
                    pltpu.VMEM((h, block_size, d), jnp.float32),
                    pltpu.VMEM((h, block_size, d), jnp.float32)],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(lengths, q, k, v, do, lse, delta)
        dk = dk.at[:, :, :block_size].add(dk0)
        dv = dv.at[:, :, :block_size].add(dv0)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8))
def sliding_window_attention_pallas(q, k, v, kv_mask, window_size: int = 2,
                                    block_size: int = 128,
                                    causal: bool = True,
                                    include_cls: bool = True,
                                    interpret: bool = False):
    """Fused sliding-window + CLS attention, Pallas forward AND backward.

    q/k/v: [B, H, L, D]; kv_mask: [B, L] bool or None (right-padding
    prefix). Semantics identical to sliding_window_attention_xla (tested
    against it and the dense oracle, gradients included).
    """
    out, _, _ = _sliding_window_attention_fwd_pallas(
        q, k, v, kv_mask, window_size=window_size, block_size=block_size,
        causal=causal, include_cls=include_cls, interpret=interpret)
    return out


def _fwd(q, k, v, kv_mask, window_size, block_size, causal, include_cls,
         interpret):
    out, lse, lengths = _sliding_window_attention_fwd_pallas(
        q, k, v, kv_mask, window_size=window_size, block_size=block_size,
        causal=causal, include_cls=include_cls, interpret=interpret)
    return out, (q, k, v, lengths, lse, out)


def _bwd(window_size, block_size, causal, include_cls, interpret,
         residuals, g):
    q, k, v, lengths, lse, out = residuals
    dq, dk, dv = _bwd_pallas(
        q, k, v, lengths, lse, out, g, window_size=window_size,
        block_size=block_size, causal=causal, include_cls=include_cls,
        interpret=interpret)
    return dq, dk, dv, None


sliding_window_attention_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Packed-layout variant (Dh = 128): no head-major transposes
# ---------------------------------------------------------------------------
#
# The head-major kernels above force [B, H, L, Dh] operand layouts at the
# custom-call boundary, so XLA physically transposes every projection output
# and the kernel result each way (~49 ms/step of HBM copies at the bench
# shape — BASELINE.md "Attention-layout experiments"). When Dh is a multiple
# of the 128-lane register width, a head's slice of the PACKED [B, L, H*Dh]
# projection output is tile-aligned, so the kernels below take the packed
# tensors directly — same grid, same slot index maps, one DMA per K/V block
# covering every head — and slice heads in-kernel along lanes (free at
# Dh % 128 == 0; at Dh=64 this layout measured 2x slower per round 2, which
# is why the head-major kernels remain the Dh<128 path). The per-head
# matmuls are [bq,128]x[128,bk] MXU ops; the band/CLS mask is computed once
# per slot instead of broadcast over H. LSE/delta stay head-major [B, H, L]
# (fp32, tiny, produced and consumed at fused boundaries — no copy cost).


def _fwd_kernel_packed(lengths_ref, q_ref, *refs, num_heads: int,
                       window_size: int, block_size: int, num_k_blocks: int,
                       causal: bool, include_cls: bool, sm_scale: float,
                       slots: int, q_off: int = 0):
    bi = pl.program_id(0)
    qb = pl.program_id(1) + q_off
    k_refs, v_refs = refs[:slots], refs[slots:2 * slots]
    o_ref, lse_ref = refs[2 * slots], refs[2 * slots + 1]

    q = q_ref[0]                                       # [bq, H*d]
    bq = q.shape[0]
    d = q.shape[1] // num_heads
    length = lengths_ref[bi]

    m = [jnp.full((bq, 1), -jnp.inf, jnp.float32) for _ in range(num_heads)]
    l = [jnp.zeros((bq, 1), jnp.float32) for _ in range(num_heads)]
    acc = [jnp.zeros((bq, d), jnp.float32) for _ in range(num_heads)]

    for slot in range(slots):
        k_block, valid = _slot_to_block(qb, slot, window_size, num_k_blocks,
                                        causal, include_cls)
        k = k_refs[slot][0]                            # [bk, H*d]
        v = v_refs[slot][0]
        mask = _tile_mask(qb, k_block, valid, (bq, k.shape[0]), length,
                          block_size, causal)
        for h in range(num_heads):
            qh = q[:, h * d:(h + 1) * d]
            kh = k[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale   # [bq, bk]
            s = jnp.where(mask, s, MASK_VALUE)
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m[h], m_curr)
            alpha = jnp.exp(m[h] - m_next)
            p = jnp.exp(s - m_next)
            l[h] = alpha * l[h] + jnp.sum(p, axis=1, keepdims=True)
            vh = v[:, h * d:(h + 1) * d]
            acc[h] = acc[h] * alpha + jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m[h] = m_next

    l_safe = [jnp.where(x == 0.0, 1.0, x) for x in l]
    o_ref[0] = jnp.concatenate(
        [(acc[h] / l_safe[h]) for h in range(num_heads)],
        axis=1).astype(o_ref.dtype)
    lse_ref[0] = jnp.stack(
        [(m[h] + jnp.log(l_safe[h]))[:, 0] for h in range(num_heads)],
        axis=0)                                        # [H, bq]


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window_size", "block_size", "causal",
                     "include_cls", "interpret", "q_off"))
def _sliding_window_attention_fwd_packed(
        q, k, v, kv_mask, *, num_heads: int, window_size: int,
        block_size: int, causal: bool, include_cls: bool,
        interpret: bool = False, lengths=None, q_off: int = 0):
    """Packed twin of _sliding_window_attention_fwd_pallas: q/k/v are
    [B, L, H*Dh] (the projection layout), Dh % 128 == 0. Returns the packed
    output plus head-major lse [B, H, Lq]."""
    b, Lq, hd = q.shape
    Lk = k.shape[1]
    d = hd // num_heads
    assert hd % num_heads == 0 and d % 128 == 0, (hd, num_heads)
    assert Lq % block_size == 0 and Lk % block_size == 0
    assert Lk == Lq + q_off * block_size, (Lq, Lk, q_off)
    nq = Lq // block_size
    nk = Lk // block_size
    slots = window_size + (1 if include_cls else 0)

    if lengths is None:
        if kv_mask is None:
            lengths = jnp.full((b,), Lk, jnp.int32)
        else:
            lengths = jnp.sum(kv_mask.astype(jnp.int32), axis=-1)

    def k_index(slot):
        def index(bi, qb, lens):
            kb, _ = _slot_to_block(qb + q_off, slot, window_size, nk,
                                   causal, include_cls)
            return (bi, kb, 0)
        return index

    qspec = pl.BlockSpec((1, block_size, hd),
                         lambda bi, qb, lens: (bi, qb, 0))
    kspecs = [pl.BlockSpec((1, block_size, hd), k_index(s))
              for s in range(slots)]

    kernel = functools.partial(
        _fwd_kernel_packed, num_heads=num_heads, window_size=window_size,
        block_size=block_size, num_k_blocks=nk, causal=causal,
        include_cls=include_cls, sm_scale=d ** -0.5, slots=slots,
        q_off=q_off)

    out, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b, Lq, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, num_heads, Lq), jnp.float32)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nq),
            in_specs=[qspec] + kspecs + kspecs,
            out_specs=(
                pl.BlockSpec((1, block_size, hd),
                             lambda bi, qb, lens: (bi, qb, 0)),
                pl.BlockSpec((1, num_heads, block_size),
                             lambda bi, qb, lens: (bi, 0, qb)),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths, q, *([k] * slots), *([v] * slots))
    return out, lse, lengths


def _p_and_ds_2d(qh, kh, vh, doh, lse_row, delta_row, mask, sm_scale):
    """2-D (single-head lane slice) twin of _p_and_ds."""
    s = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale           # [bq, bk]
    p = jnp.where(mask, jnp.exp(s - lse_row[:, None]), 0.0)
    dp = jax.lax.dot_general(
        doh, vh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [bq, bk]
    ds = p * (dp - delta_row[:, None]) * sm_scale
    return p, ds


def _dq_kernel_packed(lengths_ref, q_ref, do_ref, lse_ref, delta_ref, *refs,
                      num_heads: int, window_size: int, block_size: int,
                      num_k_blocks: int, causal: bool, include_cls: bool,
                      sm_scale: float, slots: int, q_off: int = 0):
    bi = pl.program_id(0)
    qb = pl.program_id(1) + q_off
    k_refs, v_refs = refs[:slots], refs[slots:2 * slots]
    dq_ref = refs[2 * slots]

    q, do = q_ref[0], do_ref[0]                        # [bq, H*d]
    lse, delta = lse_ref[0], delta_ref[0]              # [H, bq]
    bq = q.shape[0]
    d = q.shape[1] // num_heads
    length = lengths_ref[bi]

    acc = [jnp.zeros((bq, d), jnp.float32) for _ in range(num_heads)]
    for slot in range(slots):
        k_block, valid = _slot_to_block(qb, slot, window_size, num_k_blocks,
                                        causal, include_cls)
        k, v = k_refs[slot][0], v_refs[slot][0]
        mask = _tile_mask(qb, k_block, valid, (bq, k.shape[0]), length,
                          block_size, causal)
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            _, ds = _p_and_ds_2d(q[:, sl], k[:, sl], v[:, sl], do[:, sl],
                                 lse[h], delta[h], mask, sm_scale)
            acc[h] += jax.lax.dot_general(
                ds.astype(k.dtype), k[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [bq, d]
    dq_ref[0] = jnp.concatenate(acc, axis=1).astype(dq_ref.dtype)


def _dkv_band_kernel_packed(lengths_ref, k_ref, v_ref, *refs,
                            num_heads: int, window_size: int,
                            block_size: int, num_q_blocks: int, causal: bool,
                            sm_scale: float, q_off: int = 0):
    bi = pl.program_id(0)
    kb = pl.program_id(1)
    w = window_size
    q_refs, do_refs = refs[:w], refs[w:2 * w]
    lse_refs, delta_refs = refs[2 * w:3 * w], refs[3 * w:4 * w]
    dk_ref, dv_ref = refs[4 * w], refs[4 * w + 1]

    k, v = k_ref[0], v_ref[0]                          # [bk, H*d]
    bk = k.shape[0]
    d = k.shape[1] // num_heads
    length = lengths_ref[bi]

    dk = [jnp.zeros((bk, d), jnp.float32) for _ in range(num_heads)]
    dv = [jnp.zeros((bk, d), jnp.float32) for _ in range(num_heads)]
    for slot in range(w):
        qb, valid = _band_q_for_k(kb, slot, window_size, num_q_blocks,
                                  causal, q_off)
        q, do = q_refs[slot][0], do_refs[slot][0]
        lse, delta = lse_refs[slot][0], delta_refs[slot][0]     # [H, bq]
        mask = _tile_mask(qb + q_off, kb, valid, (q.shape[0], bk), length,
                          block_size, causal)
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            p, ds = _p_and_ds_2d(q[:, sl], k[:, sl], v[:, sl], do[:, sl],
                                 lse[h], delta[h], mask, sm_scale)
            # dv += p^T do ; dk += ds^T q  (contract the query dim)
            dv[h] += jax.lax.dot_general(
                p.astype(do.dtype), do[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [bk, d]
            dk[h] += jax.lax.dot_general(
                ds.astype(q.dtype), q[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    dk_ref[0] = jnp.concatenate(dk, axis=1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dv, axis=1).astype(dv_ref.dtype)


def _dkv_cls_kernel_packed(
    lengths_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, num_heads: int, block_size: int, q_start: int, causal: bool,
    sm_scale: float,
):
    """Packed twin of _dkv_cls_kernel: beyond-band query contributions to
    the [CLS] key block, accumulated sequentially into one [bs, H*d]
    fp32 scratch pair."""
    bi = pl.program_id(0)
    j = pl.program_id(1)
    qb = q_start + j

    @pl.when(j == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    lse, delta = lse_ref[0], delta_ref[0]              # [H, bq]
    d = q.shape[1] // num_heads
    mask = _tile_mask(qb, 0, True, (q.shape[0], k.shape[0]),
                      lengths_ref[bi], block_size, causal)
    dvs, dks = [], []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        p, ds = _p_and_ds_2d(q[:, sl], k[:, sl], v[:, sl], do[:, sl],
                             lse[h], delta[h], mask, sm_scale)
        dvs.append(jax.lax.dot_general(
            p.astype(do.dtype), do[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dks.append(jax.lax.dot_general(
            ds.astype(q.dtype), q[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dv_scratch[...] += jnp.concatenate(dvs, axis=1)
    dk_scratch[...] += jnp.concatenate(dks, axis=1)

    @pl.when(j == pl.num_programs(1) - 1)
    def _store():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window_size", "block_size", "causal",
                     "include_cls", "interpret", "q_off"))
def _bwd_packed(q, k, v, lengths, lse, o, do, *, num_heads: int,
                window_size: int, block_size: int, causal: bool,
                include_cls: bool, interpret: bool = False, q_off: int = 0):
    b, Lq, hd = q.shape
    Lk = k.shape[1]
    d = hd // num_heads
    nq = Lq // block_size
    nk = Lk // block_size
    assert Lk == Lq + q_off * block_size, (Lq, Lk, q_off)
    slots = window_size + (1 if include_cls else 0)
    sm_scale = d ** -0.5

    # delta_h = rowsum over head h's lane slice of do * o — a fused
    # reduce + small [B, L, H] -> [B, H, L] fp32 transpose (not the big
    # packed tensors).
    prod = do.astype(jnp.float32) * o.astype(jnp.float32)
    delta = prod.reshape(b, Lq, num_heads, d).sum(-1).transpose(0, 2, 1)

    qspec = pl.BlockSpec((1, block_size, hd),
                         lambda bi, qb, lens: (bi, qb, 0))
    rowspec = pl.BlockSpec((1, num_heads, block_size),
                           lambda bi, qb, lens: (bi, 0, qb))

    def k_index(slot):
        def index(bi, qb, lens):
            kb, _ = _slot_to_block(qb + q_off, slot, window_size, nk,
                                   causal, include_cls)
            return (bi, kb, 0)
        return index

    kspecs = [pl.BlockSpec((1, block_size, hd), k_index(s))
              for s in range(slots)]

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel_packed, num_heads=num_heads, window_size=window_size,
            block_size=block_size, num_k_blocks=nk, causal=causal,
            include_cls=include_cls, sm_scale=sm_scale, slots=slots,
            q_off=q_off),
        out_shape=jax.ShapeDtypeStruct((b, Lq, hd), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nq),
            in_specs=[qspec, qspec, rowspec, rowspec] + kspecs + kspecs,
            out_specs=pl.BlockSpec(
                (1, block_size, hd),
                lambda bi, qb, lens: (bi, qb, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(lengths, q, do, lse, delta, *([k] * slots), *([v] * slots))

    def q_index(slot):
        def index(bi, kb, lens):
            qb, _ = _band_q_for_k(kb, slot, window_size, nq, causal, q_off)
            return (bi, qb, 0)
        return index

    def qrow_index(slot):
        def index(bi, kb, lens):
            qb, _ = _band_q_for_k(kb, slot, window_size, nq, causal, q_off)
            return (bi, 0, qb)
        return index

    kself = pl.BlockSpec((1, block_size, hd),
                         lambda bi, kb, lens: (bi, kb, 0))
    w = window_size
    qspecs = [pl.BlockSpec((1, block_size, hd), q_index(s))
              for s in range(w)]
    qrows = [pl.BlockSpec((1, num_heads, block_size), qrow_index(s))
             for s in range(w)]
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_band_kernel_packed, num_heads=num_heads,
            window_size=window_size, block_size=block_size,
            num_q_blocks=nq, causal=causal, sm_scale=sm_scale, q_off=q_off),
        out_shape=(jax.ShapeDtypeStruct((b, Lk, hd), k.dtype),
                   jax.ShapeDtypeStruct((b, Lk, hd), v.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nk),
            in_specs=[kself, kself] + qspecs + qspecs + qrows + qrows,
            out_specs=(
                pl.BlockSpec((1, block_size, hd),
                             lambda bi, kb, lens: (bi, kb, 0)),
                pl.BlockSpec((1, block_size, hd),
                             lambda bi, kb, lens: (bi, kb, 0)),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(lengths, k, v, *([q] * w), *([do] * w), *([lse] * w), *([delta] * w))

    left = _band_left(window_size, causal)
    assert not (include_cls and q_off), "CLS column handled by the caller"
    if include_cls and nq > left:
        cspec = pl.BlockSpec((1, block_size, hd),
                             lambda bi, j, lens: (bi, left + j, 0))
        crow = pl.BlockSpec((1, num_heads, block_size),
                            lambda bi, j, lens: (bi, 0, left + j))
        k0 = pl.BlockSpec((1, block_size, hd),
                          lambda bi, j, lens: (bi, 0, 0))
        dk0, dv0 = pl.pallas_call(
            functools.partial(
                _dkv_cls_kernel_packed, num_heads=num_heads,
                block_size=block_size, q_start=left, causal=causal,
                sm_scale=sm_scale),
            out_shape=(
                jax.ShapeDtypeStruct((b, block_size, hd), k.dtype),
                jax.ShapeDtypeStruct((b, block_size, hd), v.dtype)),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, nq - left),
                in_specs=[cspec, k0, k0, cspec, crow, crow],
                out_specs=(
                    pl.BlockSpec((1, block_size, hd),
                                 lambda bi, j, lens: (bi, 0, 0)),
                    pl.BlockSpec((1, block_size, hd),
                                 lambda bi, j, lens: (bi, 0, 0)),
                ),
                scratch_shapes=[
                    pltpu.VMEM((block_size, hd), jnp.float32),
                    pltpu.VMEM((block_size, hd), jnp.float32)],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(lengths, q, k, v, do, lse, delta)
        dk = dk.at[:, :block_size].add(dk0)
        dv = dv.at[:, :block_size].add(dv0)

    return dq, dk, dv


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9))
def sliding_window_attention_pallas_packed(
        q, k, v, kv_mask, num_heads: int, window_size: int = 2,
        block_size: int = 128, causal: bool = True,
        include_cls: bool = True, interpret: bool = False):
    """Fused sliding-window + CLS attention on PACKED projections.

    q/k/v: [B, L, num_heads * Dh] with Dh % 128 == 0 — the projection
    layout, so no head-major transposes enter the custom-call boundary.
    Semantics identical to sliding_window_attention_pallas on
    split_heads(q/k/v) (tested, gradients included)."""
    out, _, _ = _sliding_window_attention_fwd_packed(
        q, k, v, kv_mask, num_heads=num_heads, window_size=window_size,
        block_size=block_size, causal=causal, include_cls=include_cls,
        interpret=interpret)
    return out


def _packed_fwd(q, k, v, kv_mask, num_heads, window_size, block_size,
                causal, include_cls, interpret):
    out, lse, lengths = _sliding_window_attention_fwd_packed(
        q, k, v, kv_mask, num_heads=num_heads, window_size=window_size,
        block_size=block_size, causal=causal, include_cls=include_cls,
        interpret=interpret)
    return out, (q, k, v, lengths, lse, out)


def _packed_bwd(num_heads, window_size, block_size, causal, include_cls,
                interpret, residuals, g):
    q, k, v, lengths, lse, out = residuals
    dq, dk, dv = _bwd_packed(
        q, k, v, lengths, lse, out, g, num_heads=num_heads,
        window_size=window_size, block_size=block_size, causal=causal,
        include_cls=include_cls, interpret=interpret)
    return dq, dk, dv, None


sliding_window_attention_pallas_packed.defvjp(_packed_fwd, _packed_bwd)


# ---------------------------------------------------------------------------
# Sequence-parallel variant (parallel/sp.py): fused kernels per length shard
# ---------------------------------------------------------------------------
#
# Each 'seq' shard holds S query tokens at absolute positions start..start+S-1
# and extended keys [halo | local] covering start-ctx..start+S-1 (ctx =
# (window-1)*block — the oldest block of a window-wide halo is never inside
# any local query's band, so it is not shipped; parallel.sp.halo_blocks). The
# SAME band kernels run with q_off=window-1 (query block i sits at key block
# i+window-1), include_cls=False; the [CLS] block — a separate psum-broadcast
# tensor — is attended by every query on shards > 0
# (start >= window blocks guarantees it is beyond the band) as one small
# XLA attention merged flash-style: forward combines (out, lse) pieces by
# logaddexp; backward feeds the JOINT lse and total output into the band
# kernels (p = exp(s - lse_joint) is the exact partial probability, so the
# standard flash ds = p (dp - delta) decomposition holds per key subset).
# Sequence shard 0 (start == 0) instead runs the unchanged single-device
# square kernel on its local slice — its band already contains block 0 with
# the CLS slot's double-count guard, which the q_off trick cannot express.


def _cls_attend(q, cls_k, cls_v, cls_len):
    """Normalized attention of every query over the [CLS] key block.
    Returns (out [B,H,S,D] fp32, lse [B,H,S])."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, cls_k,
                   preferred_element_type=jnp.float32) * (d ** -0.5)
    col = jnp.arange(cls_k.shape[2])
    mask = col[None, :] < cls_len[:, None]                    # [B, bs]
    s = jnp.where(mask[:, None, None, :], s, MASK_VALUE)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(cls_v.dtype), cls_v
                   ).astype(jnp.float32) / l[..., None]
    return o, m + jnp.log(l)


def _sp_fwd_impl(q, k_ext, v_ext, cls_k, cls_v, start, ext_len, cls_len,
                 window_size, block_size, interpret):
    hb = window_size - 1         # halo blocks (parallel.sp.halo_blocks)
    ctx = hb * block_size

    def square(_):
        out, lse, _ = _sliding_window_attention_fwd_pallas(
            q, k_ext[:, :, ctx:], v_ext[:, :, ctx:], None,
            window_size=window_size, block_size=block_size, causal=True,
            include_cls=True, interpret=interpret, lengths=ext_len)
        return out, lse

    def banded(_):
        out_b, lse_b, _ = _sliding_window_attention_fwd_pallas(
            q, k_ext, v_ext, None, window_size=window_size,
            block_size=block_size, causal=True, include_cls=False,
            interpret=interpret, lengths=ext_len, q_off=hb)
        o_c, lse_c = _cls_attend(q, cls_k, cls_v, cls_len)
        lse_t = jnp.logaddexp(lse_b, lse_c)
        w_b = jnp.exp(lse_b - lse_t)[..., None]
        w_c = jnp.exp(lse_c - lse_t)[..., None]
        out = (w_b * out_b.astype(jnp.float32) + w_c * o_c).astype(q.dtype)
        return out, lse_t

    return jax.lax.cond(start == 0, square, banded, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def sp_windowed_attention_pallas(q, k_ext, v_ext, cls_k, cls_v, start,
                                 ext_len, cls_len, window_size: int,
                                 block_size: int, interpret: bool = False):
    """Fused sliding-window + CLS attention for one sequence-parallel shard.

    q: [B, H, S, D] at absolute positions start..start+S-1 (start traced,
    block-multiple, >= S on every shard but 0); k_ext/v_ext:
    [B, H, ctx+S, D] at positions start-ctx.. where ctx =
    (window_size-1)*block_size (leading ctx rows = the left halo);
    cls_k/cls_v: [B, H, block, D] global block 0. ext_len: [B] valid
    EXTENDED-key prefix per row (on shard 0 this is the LOCAL prefix — its
    halo rows are all invalid); cls_len: [B] valid CLS prefix. Semantics ==
    parallel.sp.windowed_attention_ctx (the blocked-XLA oracle, tested)."""
    out, _ = _sp_fwd_impl(q, k_ext, v_ext, cls_k, cls_v, start, ext_len,
                          cls_len, window_size, block_size, interpret)
    return out


def _sp_fwd(q, k_ext, v_ext, cls_k, cls_v, start, ext_len, cls_len,
            window_size, block_size, interpret):
    out, lse = _sp_fwd_impl(q, k_ext, v_ext, cls_k, cls_v, start, ext_len,
                            cls_len, window_size, block_size, interpret)
    return out, (q, k_ext, v_ext, cls_k, cls_v, start, ext_len, cls_len,
                 out, lse)


def _sp_bwd(window_size, block_size, interpret, res, g):
    (q, k_ext, v_ext, cls_k, cls_v, start, ext_len, cls_len, out, lse) = res
    hb = window_size - 1
    ctx = hb * block_size

    def square(_):
        dq, dk, dv = _bwd_pallas(
            q, k_ext[:, :, ctx:], v_ext[:, :, ctx:], ext_len, lse, out, g,
            window_size=window_size, block_size=block_size, causal=True,
            include_cls=True, interpret=interpret)
        dk_ext = jnp.concatenate(
            [jnp.zeros_like(k_ext[:, :, :ctx]), dk], axis=2)
        dv_ext = jnp.concatenate(
            [jnp.zeros_like(v_ext[:, :, :ctx]), dv], axis=2)
        return (dq, dk_ext, dv_ext, jnp.zeros_like(cls_k),
                jnp.zeros_like(cls_v))

    def banded(_):
        dq, dk_ext, dv_ext = _bwd_pallas(
            q, k_ext, v_ext, ext_len, lse, out, g,
            window_size=window_size, block_size=block_size, causal=True,
            include_cls=False, interpret=interpret, q_off=hb)
        # CLS term with JOINT normalization (lse is the merged logsumexp).
        d = q.shape[-1]
        scale = d ** -0.5
        s = jnp.einsum("bhqd,bhkd->bhqk", q, cls_k,
                       preferred_element_type=jnp.float32) * scale
        col = jnp.arange(cls_k.shape[2])
        mask = (col[None, :] < cls_len[:, None])[:, None, None, :]
        p = jnp.where(mask, jnp.exp(s - lse[..., None]), 0.0)
        gf = g.astype(jnp.float32)
        delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1)  # [B,H,S]
        dp = jnp.einsum("bhqd,bhkd->bhqk", g, cls_v,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - delta[..., None]) * scale
        dq = dq + jnp.einsum(
            "bhqk,bhkd->bhqd", ds.astype(cls_k.dtype), cls_k).astype(dq.dtype)
        dcls_k = jnp.einsum("bhqk,bhqd->bhkd", ds.astype(q.dtype), q)
        dcls_v = jnp.einsum("bhqk,bhqd->bhkd", p.astype(g.dtype), g)
        return (dq, dk_ext, dv_ext, dcls_k.astype(cls_k.dtype),
                dcls_v.astype(cls_v.dtype))

    dq, dk_ext, dv_ext, dcls_k, dcls_v = jax.lax.cond(
        start == 0, square, banded, None)
    return dq, dk_ext, dv_ext, dcls_k, dcls_v, None, None, None


sp_windowed_attention_pallas.defvjp(_sp_fwd, _sp_bwd)

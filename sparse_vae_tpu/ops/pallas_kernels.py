"""Fused Pallas (Mosaic) kernels for sliding-window block-sparse attention.

The TPU-native replacement for the reference's Triton block-sparse attention
(/root/reference/sparse_vae/core/sparse_attention.py: banded SDD matmul ->
blocked softmax -> DSD matmul, and sparse_matmul.py's vendored kernels).
Instead of three kernel launches with block lookup tables, one fused
flash-style kernel walks the static band:

    grid = (batch, num_q_blocks, window + 1)

The innermost grid dimension enumerates the attended key blocks of each
query block — slot 0 is the always-attended [CLS] block
(sparse_attention.py:55-57), the remaining slots are the banded window — so
the BlockSpec index maps stream exactly the K/V tiles the sparsity pattern
touches: O(L * window) HBM traffic, no L x L anything. All heads of a batch
row are processed in one grid step (batched MXU matmuls, one DMA per K/V
block covering every head), with online softmax in fp32 VMEM scratch.
Padding enters as per-row valid lengths via scalar prefetch (SMEM) — the
batcher only right-pads, so a prefix length is the whole mask.

Backward: jax.custom_vjp with the blocked-XLA implementation's VJP
(sliding_window_attention.py), which is already O(L * window) memory. A
fused Pallas backward is a further optimization, not a semantics change.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128


def _slot_to_block(qb, slot, window_size: int, num_k_blocks: int,
                   causal: bool, include_cls: bool):
    """Map (q block, band slot) -> (k block index, validity).

    Slot 0 is the [CLS] block when include_cls (valid only when the band
    does not already reach block 0 — avoids double counting); the remaining
    slots are the band. Causal band: blocks qb-w+1..qb. Bidirectional: the
    ceil-left/floor-right split (sparse_attention.py:46-48).
    """
    band_slot = slot - 1 if include_cls else slot
    if causal:
        band_block = qb - window_size + 1 + band_slot
    else:
        left = (window_size + 1) // 2
        band_block = qb - (left - 1) + band_slot
    band_valid = (band_block >= 0) & (band_block < num_k_blocks)
    clipped = jnp.clip(band_block, 0, num_k_blocks - 1)
    if include_cls:
        first_band = band_block - band_slot  # leftmost band block
        k_block = jnp.where(slot == 0, 0, clipped)
        valid = jnp.where(slot == 0, first_band > 0, band_valid)
        return k_block, valid
    return clipped, band_valid


def _kernel(
    lengths_ref,                       # scalar-prefetch: [B] valid lengths
    q_ref, k_ref, v_ref,               # inputs, blocks [1, H, bs, d]
    o_ref,                             # output block [1, H, bs, d]
    m_scratch, l_scratch, acc_scratch, # VMEM scratch (fp32)
    *, window_size: int, block_size: int, num_k_blocks: int, causal: bool,
    include_cls: bool, sm_scale: float,
):
    bi = pl.program_id(0)
    qb = pl.program_id(1)
    slot = pl.program_id(2)

    @pl.when(slot == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    k_block, valid = _slot_to_block(qb, slot, window_size, num_k_blocks,
                                    causal, include_cls)

    @pl.when(valid)
    def _update():
        q = q_ref[0]                                   # [H, bq, d]
        k = k_ref[0]                                   # [H, bk, d]
        # Batched-over-heads QK^T on the MXU: [H, bq, bk]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale

        # Element masks: within-diagonal causal + key-padding prefix length.
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + qb * block_size
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) \
            + k_block * block_size
        mask = col < lengths_ref[bi]
        if causal:
            mask = mask & (col <= row)
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scratch[...]                        # [H, bq, LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=2)[..., None]         # [H, bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[..., :1])               # [H, bq, bk]
        l_next = alpha * l_prev + jnp.sum(p, axis=2)[..., None]
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        acc_scratch[...] *= alpha[..., :1]
        v = v_ref[0]                                   # [H, bk, d]
        acc_scratch[...] += jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    @pl.when(slot == pl.num_programs(2) - 1)
    def _store():
        l = l_scratch[...][..., :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "block_size", "causal", "include_cls",
                     "interpret"))
def _sliding_window_attention_fwd_pallas(
        q, k, v, kv_mask, *, window_size: int, block_size: int,
        causal: bool, include_cls: bool, interpret: bool = False):
    b, h, L, d = q.shape
    assert L % block_size == 0
    nb = L // block_size
    slots = window_size + (1 if include_cls else 0)

    if kv_mask is None:
        lengths = jnp.full((b,), L, jnp.int32)
    else:
        # Right-padding only => the mask is a prefix; row sum = valid length.
        lengths = jnp.sum(kv_mask.astype(jnp.int32), axis=-1)

    def k_index(bi, qb, slot, lens):
        kb, _ = _slot_to_block(qb, slot, window_size, nb, causal,
                               include_cls)
        return (bi, 0, kb, 0)

    kernel = functools.partial(
        _kernel, window_size=window_size, block_size=block_size,
        num_k_blocks=nb, causal=causal, include_cls=include_cls,
        sm_scale=d ** -0.5)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, L, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nb, slots),
            in_specs=[
                pl.BlockSpec((1, h, block_size, d),
                             lambda bi, qb, slot, lens: (bi, 0, qb, 0)),
                pl.BlockSpec((1, h, block_size, d), k_index),
                pl.BlockSpec((1, h, block_size, d), k_index),
            ],
            out_specs=pl.BlockSpec((1, h, block_size, d),
                                   lambda bi, qb, slot, lens: (bi, 0, qb, 0)),
            scratch_shapes=[
                pltpu.VMEM((h, block_size, NUM_LANES), jnp.float32),
                pltpu.VMEM((h, block_size, NUM_LANES), jnp.float32),
                pltpu.VMEM((h, block_size, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, q, k, v)
    return out


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8))
def sliding_window_attention_pallas(q, k, v, kv_mask, window_size: int = 2,
                                    block_size: int = 128,
                                    causal: bool = True,
                                    include_cls: bool = True,
                                    interpret: bool = False):
    """Fused sliding-window + CLS attention, Pallas forward.

    q/k/v: [B, H, L, D]; kv_mask: [B, L] bool or None (right-padding
    prefix). Semantics identical to sliding_window_attention_xla (tested
    against it and the dense oracle). Backward runs the blocked-XLA VJP.
    """
    return _sliding_window_attention_fwd_pallas(
        q, k, v, kv_mask, window_size=window_size, block_size=block_size,
        causal=causal, include_cls=include_cls, interpret=interpret)


def _fwd(q, k, v, kv_mask, window_size, block_size, causal, include_cls,
         interpret):
    out = _sliding_window_attention_fwd_pallas(
        q, k, v, kv_mask, window_size=window_size, block_size=block_size,
        causal=causal, include_cls=include_cls, interpret=interpret)
    return out, (q, k, v, kv_mask)


def _bwd(window_size, block_size, causal, include_cls, interpret,
         residuals, g):
    from .sliding_window_attention import sliding_window_attention_xla
    q, k, v, kv_mask = residuals

    def f(q, k, v):
        return sliding_window_attention_xla(
            q, k, v, kv_mask, window_size=window_size,
            block_size=block_size, causal=causal, include_cls=include_cls)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


sliding_window_attention_pallas.defvjp(_fwd, _bwd)

"""Sliding-window + CLS block-sparse attention.

The TPU-native replacement for the reference's Triton block-sparse stack
(/root/reference/sparse_vae/core/sparse_attention.py: SDD matmul -> blocked
softmax -> DSD matmul over a banded layout with an always-attend first block,
and /root/reference/sparse_vae/core/sparse_matmul.py's vendored kernels).

Two implementations with identical semantics (tested against the masked
dense oracle in ops/attention.py):

- `sliding_window_attention_xla`: pure-XLA blocked computation. Each query
  block gathers only its (window+1) key/value blocks (static band + block 0
  for [CLS]), so memory is O(L * (window+1) * block) instead of O(L^2).
  XLA fuses the mask/softmax into the matmuls; this is also the
  reference-semantics baseline for the Pallas kernel.
- `sliding_window_attention_pallas` (pallas_kernels.py): fused flash-style
  Pallas kernel with custom VJP for the TPU MXU.

Block size defaults to 128 (MXU/lane width) instead of the reference's
Triton block 32 (sparse_attention.py:13).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _band_indices(num_blocks: int, window_size: int, include_cls: bool,
                  causal: bool = True):
    """For each query block, the indices of attended key blocks
    [num_blocks, window_size (+1 cls)], clamped to valid range; a parallel
    boolean marks real (non-clamped, non-duplicate) entries.

    Causal band: key block delta in [q-window+1 .. q]; bidirectional splits
    the window ceil-left/floor-right around the diagonal
    (sparse_attention.py:46-48); plus block 0 for [CLS].
    """
    q = jnp.arange(num_blocks)[:, None]
    if causal:
        offsets = jnp.arange(window_size)[None, :] - (window_size - 1)
    else:
        left = (window_size + 1) // 2
        offsets = jnp.arange(window_size)[None, :] - (left - 1)
    k_idx = q + offsets                                  # [nQ, W]
    valid = (k_idx >= 0) & (k_idx < num_blocks)
    k_idx = jnp.clip(k_idx, 0, num_blocks - 1)
    if include_cls:
        cls_idx = jnp.zeros((num_blocks, 1), k_idx.dtype)
        # CLS column is redundant when the band already covers block 0
        cls_valid = (k_idx[:, :1] > 0)
        k_idx = jnp.concatenate([cls_idx, k_idx], axis=1)
        valid = jnp.concatenate([cls_valid, valid], axis=1)
    return k_idx, valid


@functools.partial(jax.jit, static_argnames=("window_size", "block_size",
                                             "causal", "include_cls"))
def sliding_window_attention_xla(q, k, v, kv_mask=None, *,
                                 window_size: int = 2, block_size: int = 128,
                                 causal: bool = True,
                                 include_cls: bool = True):
    """Blocked sliding-window attention.

    q/k/v: [B, H, L, D] with L % block_size == 0; kv_mask: [B, L] bool
    (True = valid). Returns [B, H, L, D]. Semantics = dense attention under
    ops.attention.sliding_window_token_mask.
    """
    b, h, L, d = q.shape
    assert L % block_size == 0, (L, block_size)
    nb = L // block_size
    w = window_size

    k_idx, band_valid = _band_indices(nb, w, include_cls, causal)  # [nQ, S]
    s = k_idx.shape[1]                                      # band slots

    # Gather banded K/V: [B, H, nQ, S, bs, D]
    kb = k.reshape(b, h, nb, block_size, d)
    vb = v.reshape(b, h, nb, block_size, d)
    k_band = jnp.take(kb, k_idx.reshape(-1), axis=2).reshape(
        b, h, nb, s, block_size, d)
    v_band = jnp.take(vb, k_idx.reshape(-1), axis=2).reshape(
        b, h, nb, s, block_size, d)

    qb = q.reshape(b, h, nb, block_size, d)
    scale = d ** -0.5
    scores = jnp.einsum("bhnqd,bhnskd->bhnqsk", qb, k_band,
                        preferred_element_type=jnp.float32) * scale

    # Masks: band validity, causal within-diagonal, key padding.
    q_pos = (jnp.arange(nb)[:, None] * block_size
             + jnp.arange(block_size)[None, :])             # [nQ, bs]
    k_pos = (k_idx[:, :, None] * block_size
             + jnp.arange(block_size)[None, None, :])       # [nQ, S, bs]
    mask = band_valid[:, :, None] & jnp.ones((nb, s, block_size), bool)
    if causal:
        mask = mask[:, None, :, :] & (
            k_pos[:, None, :, :] <= q_pos[:, :, None, None])  # [nQ,bs,S,bs]
    else:
        mask = jnp.broadcast_to(mask[:, None],
                                (nb, block_size, s, block_size))
    mask = mask[None, None]                                  # [1,1,nQ,bs,S,bs]
    if kv_mask is not None:
        pad = jnp.take(kv_mask.reshape(b, nb, block_size),
                       k_idx.reshape(-1), axis=1).reshape(
            b, nb, s, block_size)
        mask = mask & pad[:, None, :, None, :, :]

    scores = jnp.where(mask, scores, NEG_INF)
    flat = scores.reshape(b, h, nb, block_size, s * block_size)
    weights = jax.nn.softmax(flat, axis=-1).astype(v.dtype)
    weights = weights.reshape(b, h, nb, block_size, s, block_size)
    out = jnp.einsum("bhnqsk,bhnskd->bhnqd", weights, v_band)
    return out.reshape(b, h, L, d)


def sliding_window_attention(q, k, v, kv_mask=None, *, window_size: int = 2,
                             block_size: int = 128, causal: bool = True,
                             include_cls: bool = True,
                             force_xla: bool = False):
    """Dispatcher: fused Pallas kernel on TPU, blocked XLA elsewhere.

    The Pallas path needs a TPU backend and MXU-aligned blocks; anything
    else (CPU tests, odd shapes) takes the blocked-XLA path with identical
    semantics.
    """
    on_tpu = jax.default_backend() == "tpu"
    if (not force_xla and on_tpu and block_size % 128 == 0
            and q.shape[-1] % 8 == 0):
        from .pallas_kernels import sliding_window_attention_pallas
        return sliding_window_attention_pallas(
            q, k, v, kv_mask, window_size, block_size, causal, include_cls)
    return sliding_window_attention_xla(
        q, k, v, kv_mask, window_size=window_size, block_size=block_size,
        causal=causal, include_cls=include_cls)

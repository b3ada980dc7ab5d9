"""Multi-head attention: dense path, sliding-window mask semantics, KV-cache
decode — the flax counterpart of /root/reference/sparse_vae/core/attention.py.

The block-sparse sliding-window pattern (sparse_attention.py:38-59: banded
blocks around the diagonal plus an always-attend first block for [CLS]) is
defined here once as `sliding_window_block_mask`; the dense path applies it
as a mask (exact semantics, the Pallas kernel's oracle) and
ops/sliding_window_attention.py computes the same thing without materializing
the masked score matrix.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.base import dense_kernel_init
from .rotary import apply_rotary

NEG_INF = -1e9  # bf16-safe large negative (the reference used -1e7 fp16)

# Row-wise decode cache-write strategy. 'select' (default) writes each row's
# new K/V by a one-hot compare+where over the cache's position axis — a fully
# parallel VPU rewrite of the (small, O(window)) cache that XLA fuses; on TPU
# this beats 'scatter' (`.at[rows, :, idx].set`), which lowers to a real XLA
# scatter with batch-varying indices and serializes (the measured 4.3x
# per-row step-cost gap vs lockstep decode, BASELINE.md "Continuous batching
# loses the offline mass-sampling workload"). 'scatter' is kept for the
# on-chip A/B (SVT_ROW_WRITE=scatter).
import os as _os
_ROW_WRITE = _os.environ.get("SVT_ROW_WRITE", "select")


def row_cache_write(buf, idx, val):
    """Write val [B, H, Dh] into buf [B, H, L, Dh] at per-row position
    idx [B] along L. Out-of-range idx rows are dropped (the CLS store
    routes non-CLS positions to idx == L)."""
    if _ROW_WRITE == "scatter":
        rows = jnp.arange(buf.shape[0])
        return buf.at[rows, :, idx].set(val.astype(buf.dtype), mode="drop")
    hit = jnp.arange(buf.shape[2])[None, :] == idx[:, None]       # [B, L]
    return jnp.where(hit[:, None, :, None], val.astype(buf.dtype)[:, :, None],
                     buf)

# Test hook: force the sequence-parallel Pallas dispatch (in interpret mode)
# off-TPU, so the kernel path can run inside the full sharded train step on
# the virtual CPU mesh (tests/test_sp.py).
_SP_KERNEL_INTERPRET = False

# Test hook: force the packed-layout Pallas dispatch (in interpret mode)
# off-TPU (tests/test_pallas_packed.py).
_PACKED_KERNEL_INTERPRET = False


def sliding_window_block_mask(num_q: int, num_k: int, block_size: int,
                              window_size: int, causal: bool = True,
                              include_cls: bool = True,
                              q_offset: int = 0):
    """[num_q, num_k] bool mask (True = may attend) with block granularity.

    Mirrors SparseAttention.get_master_layout (sparse_attention.py:38-59):
    for causal layouts the band is `window_size` blocks ending at the
    diagonal; bidirectional splits the window around it (left = ceil,
    right = floor per the divmod rounding :46-48). include_cls opens the
    first block column. q_offset shifts the query block row (decode).
    """
    qb = jnp.arange(num_q) + q_offset
    kb = jnp.arange(num_k)
    delta = qb[:, None] - kb[None, :]

    num_sides = 1 if causal else 2
    left = (window_size + num_sides - 1) // num_sides  # round up (:46)
    right = window_size - left
    # Allowed block deltas: 0..left-1 behind the diagonal, 1..right ahead
    # (ahead only when bidirectional; right == 0 for causal).
    mask = (delta >= -right) & (delta < left)
    if include_cls:
        mask = mask | (kb[None, :] == 0)
    if causal:
        mask = mask & (delta >= 0)
    return mask


def sliding_window_token_mask(q_len: int, k_len: int, block_size: int,
                              window_size: int, causal: bool = True,
                              include_cls: bool = True):
    """Token-level [q_len, k_len] expansion of the block mask, intersected
    with the causal triangle inside diagonal blocks."""
    nq, nk = -(-q_len // block_size), -(-k_len // block_size)
    blocks = sliding_window_block_mask(nq, nk, block_size, window_size,
                                       causal, include_cls)
    mask = jnp.repeat(jnp.repeat(blocks, block_size, 0), block_size, 1)
    mask = mask[:q_len, :k_len]
    if causal:
        qi = jnp.arange(q_len)[:, None]
        ki = jnp.arange(k_len)[None, :]
        mask = mask & (ki <= qi)
    return mask


def dense_attention(q, k, v, mask=None):
    """Masked scaled-dot-product attention.

    q: [B, H, Lq, D], k/v: [B, H, Lk, D]; mask broadcastable to
    [B, H, Lq, Lk], True = attend. Softmax in fp32 regardless of input dtype
    (bf16-safe), matmuls on the MXU.
    """
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def split_heads(x, num_heads: int):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


class Attention(nn.Module):
    """Rotary multi-head attention with learned-query and sparse options
    (attention.py:11-105).

    - learned_queries: fixed-size learned query bank replacing x_q
      (Perceiver-style, attention.py:30-34,55-56); rotary is skipped for
      learned queries, matching the reference.
    - sparse window_size (in `block_size` blocks): sliding-window + CLS
      block-sparse self-attention. use_pallas_kernel selects the fused Pallas
      kernel when shapes allow; otherwise the masked-dense oracle runs.
    - rotary base: dense path 10_000 (attention.py:25 default max_length);
      sparse path 2 * window_size * block_size (attention.py:52).
    """
    d_model: int
    num_heads: int
    causal: bool = False
    sparse: bool = False
    window_size: int = 2
    block_size: int = 128
    learned_queries: Optional[int] = None
    max_length: int = 10_000
    use_pallas_kernel: bool = True
    dtype: Any = jnp.float32
    # Tensor parallelism (parallel/tp.py): tp_size > 1 means this instance
    # runs INSIDE shard_map on a mesh with a 'model' axis — q/k/v and the
    # learned-query bank hold 1/tp_size of the heads (column-parallel), the
    # output projection is row-parallel, and __call__ inserts the f/g
    # collectives. tp_size=1 (the default, and the global/init module) is
    # exactly the old behavior.
    tp_size: int = 1
    tp_axis: str = "model"
    # Sequence parallelism (parallel/sp.py): sp_size > 1 means the LENGTH
    # axis of the inputs is sharded over the 'seq' mesh axis. Sparse causal
    # self-attention exchanges a fixed-size K/V halo with the left neighbor
    # plus the psum-broadcast [CLS] block; learned-query / cross attention
    # combines local softmax partials over the axis. sp_size=1 (the default,
    # and the global/init module) is exactly the old behavior.
    sp_size: int = 1
    sp_axis: str = "seq"
    # The distributed-softmax combine is only valid when the QUERIES are
    # replicated over 'seq' (learned query banks imply it; a cross-attention
    # whose x_q is the replicated latent set declares it here). Sharded-q
    # cases must take the halo path (sparse causal) or keep sp_size=1.
    sp_replicated_q: bool = False

    @property
    def local_heads(self) -> int:
        return self.num_heads // self.tp_size

    def setup(self):
        init = dense_kernel_init(0.02)
        assert self.d_model % self.num_heads == 0
        assert self.num_heads % self.tp_size == 0, (
            f"num_heads {self.num_heads} not divisible by tp_size "
            f"{self.tp_size}")
        d = self.d_model // self.tp_size
        if self.learned_queries:
            self.learned_query_bank = self.param(
                "learned_queries", nn.initializers.normal(1.0),
                (1, self.learned_queries, d))
        else:
            self.q_linear = nn.Dense(d, kernel_init=init, dtype=self.dtype)
        self.k_linear = nn.Dense(d, kernel_init=init, dtype=self.dtype)
        self.v_linear = nn.Dense(d, kernel_init=init, dtype=self.dtype)
        self.output_linear = nn.Dense(self.d_model, kernel_init=init,
                                      dtype=self.dtype)

    def _packed_ok(self, lq: int, lk: int) -> bool:
        """Dispatch gate for the packed-layout sparse kernel: full-sequence
        sparse self-attention with tile-aligned head slices (Dh % 128 == 0,
        where the lane-sliced layout wins — at Dh=64 it measured 2x slower,
        BASELINE.md attention-layout experiments). SVT_PACKED_ATTN=0
        disables it for A/B benches; semantics are identical either way
        (tested). TP keeps the head-major path: its cache_seed/row-decode
        surfaces are head-major and per-shard Dh is what matters anyway."""
        import os
        if os.environ.get("SVT_PACKED_ATTN", "auto") == "0":
            return False
        d_head = self.d_model // self.num_heads
        return (self.use_pallas_kernel and self.sparse
                and self.learned_queries is None and self.tp_size == 1
                and lq == lk and lq % self.block_size == 0
                and self.block_size % 128 == 0 and d_head % 128 == 0
                and (_PACKED_KERNEL_INTERPRET
                     or jax.default_backend() == "tpu"))

    @property
    def rotary_base(self) -> float:
        if self.sparse:
            return float(2 * self.window_size * self.block_size)
        return float(self.max_length)

    def _project(self, x_q, x_kv, pos_offset=0, k_pos_offset=0):
        if self.learned_queries:
            q = jnp.broadcast_to(
                self.learned_query_bank.astype(self.dtype),
                (x_kv.shape[0], self.learned_queries,
                 self.d_model // self.tp_size))
        else:
            q = self.q_linear(x_q)
            q = split_heads(q, self.local_heads)
            q = apply_rotary(q, self.rotary_base, offset=pos_offset)
            q = merge_heads(q)
        k = self.k_linear(x_kv)
        k = merge_heads(apply_rotary(split_heads(k, self.local_heads),
                                     self.rotary_base, offset=k_pos_offset))
        v = self.v_linear(x_kv)
        return q, k, v

    def _finalize(self, out_heads):
        """Merge heads and close the output projection."""
        return self._close(merge_heads(out_heads))

    def _close(self, merged):
        """Output projection on merged [B, L, H*Dh] (row-parallel under
        TP: each shard's matmul is partial, one psum over 'model' completes
        it; the replicated bias — added by every shard — is evaluated once
        via a zero input and kept out of the reduction)."""
        y = self.output_linear(merged)
        if self.tp_size > 1:
            from ..parallel.tp import reduce_activations
            bias = self.output_linear(
                jnp.zeros((1, 1, merged.shape[-1]), merged.dtype))
            y = reduce_activations(y - bias, self.tp_axis) + bias
        return y

    def _sp_call(self, x_q, x_kv, kv_mask):
        """Sequence-parallel attention (parallel/sp.py): x_kv holds this
        shard's slice of the length axis at absolute positions
        idx*S..idx*S+S-1 (idx = this device's 'seq' coordinate).

        - learned-query / non-causal cross attention: replicated queries
          over the sharded keys, distributed-softmax combine;
        - sparse causal self-attention: one ppermute halo (the left
          neighbor's trailing window band) + one psum [CLS]-block broadcast,
          then the blocked windowed compute — per-shard cost O(S * window),
          boundary traffic independent of the document length.
        """
        from jax.ad_checkpoint import checkpoint_name

        from ..parallel.sp import (halo_from_left, seq_parallel_cross_attention,
                                   sum_over_shards, windowed_attention_ctx)
        if self.tp_size > 1:
            from ..parallel.tp import replicate_gradient
            same = x_q is x_kv
            x_kv = replicate_gradient(x_kv, self.tp_axis)
            x_q = x_kv if same else replicate_gradient(x_q, self.tp_axis)
        idx = jax.lax.axis_index(self.sp_axis)
        S = x_kv.shape[1]
        start = idx * S

        if self.learned_queries or self.sp_replicated_q:
            # Replicated queries over the sharded key axis.
            q, k, v = self._project(x_q, x_kv, k_pos_offset=start)
            q, k, v = (split_heads(t, self.local_heads) for t in (q, k, v))
            out = seq_parallel_cross_attention(q, k, v, kv_mask, self.sp_axis)
            return self._finalize(out)

        if not (self.sparse and self.causal):
            raise ValueError(
                "sequence parallelism supports the sparse causal "
                "sliding-window decoder (window-band halo) and "
                "replicated-query cross/learned-query attention "
                "(sp_replicated_q); this configuration "
                f"(sparse={self.sparse}, causal={self.causal}) would psum "
                "partials of SHARDED queries — keep sp_size=1 for it")
        bs, ws = self.block_size, self.window_size
        from ..parallel.sp import halo_blocks
        ctx = halo_blocks(ws) * bs   # the oldest window block of a halo is
        #                              never attended — ship window-1 blocks
        if S % bs != 0:
            raise ValueError(f"shard length {S} not a multiple of the "
                             f"attention block size {bs}")
        if S < ws * bs:
            raise ValueError(
                f"shard length {S} must cover the window span "
                f"({ws} x {bs} tokens): one left-neighbor halo must "
                "suffice, and the fused kernel path assumes block 0 is "
                "behind every non-first shard's band — use fewer 'seq' "
                "shards or a smaller window")
        q, k, v = self._project(x_q, x_kv, pos_offset=start,
                                k_pos_offset=start)
        q, k, v = (split_heads(t, self.local_heads) for t in (q, k, v))
        q = checkpoint_name(q, "attn_qkv")
        if ctx:
            halo_k = halo_from_left(k[:, :, -ctx:], self.sp_size,
                                    self.sp_axis)
            halo_v = halo_from_left(v[:, :, -ctx:], self.sp_size,
                                    self.sp_axis)
        else:  # window_size == 1: diagonal-only band, no halo at all
            halo_k = k[:, :, :0]
            halo_v = v[:, :, :0]
        zeros = jnp.zeros_like(k[:, :, :bs])
        cls_k = sum_over_shards(
            jnp.where(idx == 0, k[:, :, :bs], zeros), self.sp_axis)
        cls_v = sum_over_shards(
            jnp.where(idx == 0, v[:, :, :bs], zeros), self.sp_axis)
        # Remat save points AFTER the collectives: 'dots_attn_qkv' then
        # re-pays neither the projections nor the halo/CLS communication
        # in the backward pass.
        k_ext = checkpoint_name(jnp.concatenate([halo_k, k], axis=2),
                                "attn_qkv")
        v_ext = checkpoint_name(jnp.concatenate([halo_v, v], axis=2),
                                "attn_qkv")
        cls_k = checkpoint_name(cls_k, "attn_qkv")
        cls_v = checkpoint_name(cls_v, "attn_qkv")
        kv_mask_ext = cls_mask = None
        if kv_mask is not None:
            # Same pinned collectives as the K/V tensors (ints are never
            # differentiated, so the custom VJPs are inert here) — the mask
            # halo can never drift from the K/V halo convention.
            m = kv_mask.astype(jnp.int32)
            halo_m = (halo_from_left(m[:, -ctx:], self.sp_size, self.sp_axis)
                      if ctx else m[:, :0])
            kv_mask_ext = jnp.concatenate([halo_m, m], axis=1) > 0
            cls_mask = sum_over_shards(
                jnp.where(idx == 0, m[:, :bs], 0), self.sp_axis) > 0
        if self.use_pallas_kernel and (
                _SP_KERNEL_INTERPRET
                or (jax.default_backend() == "tpu"
                    and bs % 128 == 0 and q.shape[-1] % 8 == 0)):
            # Fused Pallas path: the band kernels run per shard with
            # q_off=window-1 over the extended keys; the CLS block merges
            # flash-style (ops/pallas_kernels.py sp_windowed_attention_*).
            from .pallas_kernels import sp_windowed_attention_pallas
            nrows = q.shape[0]
            if kv_mask_ext is None:
                ext_len = jnp.broadcast_to(
                    jnp.where(idx == 0, S, ctx + S).astype(jnp.int32),
                    (nrows,))
                cls_len = jnp.full((nrows,), bs, jnp.int32)
            else:
                ext_len = jnp.sum(kv_mask_ext.astype(jnp.int32), axis=1)
                cls_len = jnp.sum(cls_mask.astype(jnp.int32), axis=1)
            out = sp_windowed_attention_pallas(
                q, k_ext, v_ext, cls_k, cls_v, start, ext_len, cls_len,
                ws, bs, _SP_KERNEL_INTERPRET)
        else:
            out = windowed_attention_ctx(
                q, k_ext, v_ext, cls_k, cls_v, start, kv_mask_ext, cls_mask,
                window_size=ws, block_size=bs)
        return self._finalize(checkpoint_name(out, "attn_out"))

    def __call__(self, x_q, x_kv, kv_mask=None):
        """Full-sequence attention. x_q: [B, Lq, D] (ignored when
        learned_queries), x_kv: [B, Lk, D], kv_mask: [B, Lk] bool
        (True = valid key position)."""
        if self.sp_size > 1:
            return self._sp_call(x_q, x_kv, kv_mask)
        if self.tp_size > 1:
            # Column-parallel entry: activations are replicated over
            # 'model' but each shard's q/k/v slices produce only a partial
            # input cotangent — mark for a backward psum (g collective).
            from ..parallel.tp import replicate_gradient
            same = x_q is x_kv
            x_kv = replicate_gradient(x_kv, self.tp_axis)
            x_q = x_kv if same else replicate_gradient(x_q, self.tp_axis)
        q, k, v = self._project(x_q, x_kv)
        if self._packed_ok(q.shape[1], k.shape[1]):
            # Packed-layout kernel (Dh % 128 == 0): the [B, L, H*Dh]
            # projections feed the custom call directly — no head-major
            # transposes at the boundary (the ~49 ms/step copy bucket at
            # the bench shape; pallas_kernels.py packed section). Serving's
            # bulk-prefill seed still wants head-major K/V, but only when
            # the collection is actually mutable (never in training).
            from jax.ad_checkpoint import checkpoint_name

            from .pallas_kernels import sliding_window_attention_pallas_packed
            if self.is_mutable_collection("cache_seed"):
                self.sow("cache_seed", "k", split_heads(k, self.local_heads))
                self.sow("cache_seed", "v", split_heads(v, self.local_heads))
            q = checkpoint_name(q, "attn_qkv")
            k = checkpoint_name(k, "attn_qkv")
            v = checkpoint_name(v, "attn_qkv")
            out = sliding_window_attention_pallas_packed(
                q, k, v, kv_mask, self.local_heads, self.window_size,
                self.block_size, self.causal, True,
                _PACKED_KERNEL_INTERPRET)
            return self._close(checkpoint_name(out, "attn_out"))
        q, k, v = (split_heads(t, self.local_heads) for t in (q, k, v))
        # Bulk-prefill seed (server.py): the head-major rotary K/V are
        # exactly what the decode caches store per position — sown only
        # when a "cache_seed" collection is mutable (a no-op otherwise),
        # so one teacher-forced forward can fill a row's cache in place of
        # prompt-length sequential decode steps (fill_cache_row below).
        self.sow("cache_seed", "k", k)
        self.sow("cache_seed", "v", v)
        # Remat save points (transformer_lm.py policies 'dots_attn' /
        # 'dots_attn_qkv'): the head-major operands and the kernel output
        # sit behind custom-call layout pins, so recomputing them in the
        # backward pass re-pays both the Pallas forward kernel and its
        # boundary transpose copies (~20 ms/step at the bench shape).
        from jax.ad_checkpoint import checkpoint_name
        q = checkpoint_name(q, "attn_qkv")
        k = checkpoint_name(k, "attn_qkv")
        v = checkpoint_name(v, "attn_qkv")
        lq, lk = q.shape[-2], k.shape[-2]

        if self.sparse and self.learned_queries is None:
            if lq == lk and lq % self.block_size == 0:
                # Blocked sparse path: Pallas kernel on TPU (unless
                # disabled), O(L*window) blocked-XLA otherwise. The dense
                # masked fallback below is only for unaligned shapes.
                from .sliding_window_attention import sliding_window_attention
                out = sliding_window_attention(
                    q, k, v, kv_mask, window_size=self.window_size,
                    block_size=self.block_size, causal=self.causal,
                    force_xla=not self.use_pallas_kernel)
                return self._finalize(checkpoint_name(out, "attn_out"))
            mask = sliding_window_token_mask(
                lq, lk, self.block_size, self.window_size, self.causal)
            mask = mask[None, None]
        elif self.causal and self.learned_queries is None:
            if (self.use_pallas_kernel and jax.default_backend() == "tpu"
                    and lq == lk and lq % 512 == 0):
                # Dense causal path on TPU: the in-tree Pallas flash
                # attention — the [B, H, L, L] score tensor never
                # materializes (5.3 GB fp32 per layer at the
                # dense-benchmark preset's 3.5k-token batches, which also
                # forced remat_policy=full). Padding enters as segment ids
                # (pads get segment 0, real tokens 1; matches the masked
                # oracle at REAL positions, tested). CAVEAT: at PAD query
                # positions the two paths diverge — segment ids make pad
                # queries attend only pad keys, while the masked dense
                # fallback lets them attend valid keys. Harmless for every
                # masked loss in this codebase, but don't consume unmasked
                # pad-position hidden states (pooling, diagnostics) and
                # expect backend-identical values.
                from jax.experimental.pallas.ops.tpu.flash_attention import (
                    BlockSizes, SegmentIds, flash_attention)
                seg = None
                if kv_mask is not None:
                    s = kv_mask.astype(jnp.int32)
                    seg = SegmentIds(q=s, kv=s)
                # The library default (128-everywhere) tiles a d512 model
                # into tiny matmuls — measured 750 ms of a 890 ms step at
                # (13, 3584). 512-wide blocks amortize the grid overhead.
                bs_ = min(512, lq)
                blocks = BlockSizes(
                    block_q=bs_, block_k_major=bs_, block_k=bs_, block_b=1,
                    block_q_major_dkv=bs_, block_k_major_dkv=bs_,
                    block_k_dkv=bs_, block_q_dkv=bs_,
                    block_k_major_dq=bs_, block_k_dq=bs_, block_q_dq=bs_)
                out = flash_attention(q, k, v, segment_ids=seg, causal=True,
                                      sm_scale=q.shape[-1] ** -0.5,
                                      block_sizes=blocks)
                return self._finalize(checkpoint_name(out, "attn_out"))
            mask = (jnp.arange(lk)[None, :] <= jnp.arange(lq)[:, None]
                    )[None, None]
        else:
            mask = None

        if kv_mask is not None:
            pad = kv_mask[:, None, None, :]
            mask = pad if mask is None else (mask & pad)

        out = dense_attention(q, k, v, mask)
        return self._finalize(out)

    # -- frontier-window decoding (parallel_decode.frontier_jacobi) ---------
    def init_window_cache(self, batch_size: int):
        """K/V stores for frontier-windowed parallel decoding (sparse
        models): the CLS block plus the `window_size`-block band of frozen
        context immediately left of the frontier. Validity of entries is
        derived from the frontier position (see window_attend), so zeros
        suffice here."""
        assert self.sparse, "frontier windowing needs the sparse band"
        head_dim = self.d_model // self.num_heads
        cls = (batch_size, self.local_heads, self.block_size, head_dim)
        ctx = (batch_size, self.local_heads,
               self.window_size * self.block_size, head_dim)
        return {"cls_k": jnp.zeros(cls, self.dtype),
                "cls_v": jnp.zeros(cls, self.dtype),
                "ctx_k": jnp.zeros(ctx, self.dtype),
                "ctx_v": jnp.zeros(ctx, self.dtype)}

    def _window_mask(self, start, num_q: int):
        """[num_q, bs + ctx + num_q] validity mask for window_attend.

        Query i sits at absolute position start + i (start is a traced
        int32, always a block multiple). Keys are [CLS block | ctx band |
        window]; training semantics (sliding_window_block_mask): block qb
        attends blocks qb-window_size+1..qb plus block 0, causal inside the
        diagonal block."""
        bs, ws = self.block_size, self.window_size
        ctx_len = ws * bs
        q_abs = start + jnp.arange(num_q)                    # [Q]
        qb = q_abs // bs

        # CLS store: holds block 0 once it is frozen (start >= bs). Not
        # consulted while block 0 is still inside the window.
        cls_abs = jnp.arange(bs)
        cls_ok = jnp.broadcast_to(start >= bs, (num_q, bs))

        # Context band: slot j holds absolute position start - ctx_len + j.
        # Valid iff it exists (>= 0), is not block 0 (served by the CLS
        # store), and lies in the query's band.
        ctx_abs = start - ctx_len + jnp.arange(ctx_len)
        ctx_b = ctx_abs // bs
        ctx_ok = ((ctx_abs[None, :] >= 0)
                  & (ctx_b[None, :] >= 1)
                  & (ctx_b[None, :] > qb[:, None] - ws))

        # Window keys: causal, in-band, or block 0 (when the window still
        # contains it).
        k_abs = start + jnp.arange(num_q)
        kb = k_abs // bs
        win_ok = ((k_abs[None, :] <= q_abs[:, None])
                  & ((kb[None, :] > qb[:, None] - ws) | (kb[None, :] == 0)))

        return jnp.concatenate([cls_ok, ctx_ok, win_ok], axis=1)

    def window_attend(self, x, cache, start):
        """Multi-token attention for the active Jacobi window.

        x: [B, W, D] window inputs at absolute positions start..start+W-1;
        cache: init_window_cache dict for the frozen prefix. Returns
        (attention output [B, W, D], (k, v) of the window — the caller
        pushes the leading block into the cache when it freezes). Matches
        the training-time sparse mask exactly for frozen prefixes."""
        q = apply_rotary(split_heads(self.q_linear(x), self.local_heads),
                         self.rotary_base, offset=start)
        k_w = apply_rotary(split_heads(self.k_linear(x), self.local_heads),
                           self.rotary_base, offset=start)
        v_w = split_heads(self.v_linear(x), self.local_heads)

        dt = cache["ctx_k"].dtype
        k_all = jnp.concatenate(
            [cache["cls_k"], cache["ctx_k"], k_w.astype(dt)], axis=2)
        v_all = jnp.concatenate(
            [cache["cls_v"], cache["ctx_v"], v_w.astype(dt)], axis=2)
        mask = self._window_mask(start, x.shape[1])
        out = dense_attention(q, k_all, v_all, mask[None, None])
        return self._finalize(out), (k_w, v_w)

    @staticmethod
    def push_window_block(cache, kv, start, block_size: int):
        """Freeze the window's leading block: its k/v enter the CLS store
        when it is block 0, else the context band (rolled left one block).
        start = absolute position of the block being frozen."""
        k_w, v_w = kv
        k_b = k_w[:, :, :block_size].astype(cache["ctx_k"].dtype)
        v_b = v_w[:, :, :block_size].astype(cache["ctx_v"].dtype)

        def to_cls(c):
            return {**c, "cls_k": k_b, "cls_v": v_b}

        def to_ctx(c):
            ctx_k = jnp.roll(c["ctx_k"], -block_size, axis=2)
            ctx_v = jnp.roll(c["ctx_v"], -block_size, axis=2)
            ctx_k = ctx_k.at[:, :, -block_size:].set(k_b)
            ctx_v = ctx_v.at[:, :, -block_size:].set(v_b)
            return {**c, "ctx_k": ctx_k, "ctx_v": ctx_v}

        return jax.lax.cond(start < block_size, to_cls, to_ctx, cache)

    # -- incremental decoding ----------------------------------------------
    def init_cache(self, batch_size: int, max_length: int):
        """Decode-time KV cache.

        Dense attention allocates the full [B, H, max_length, Dh] buffer.
        Sparse attention allocates a BLOCK-RING cache instead — the
        TPU-static realization of the reference's block-unit windowed
        eviction (attention.py:113-134): `window_size` blocks of keys/values
        in a ring (block b lives in slot b % window_size) plus a separate
        copy of the [CLS] block. Memory and per-step attention cost are
        O(window_size * block_size) regardless of document length, which is
        what makes AR sampling of 100k-token pg19 documents feasible.
        """
        head_dim = self.d_model // self.num_heads
        if self.sparse:
            ring = (batch_size, self.local_heads,
                    self.window_size * self.block_size, head_dim)
            cls = (batch_size, self.local_heads, self.block_size, head_dim)
            return {"k_ring": jnp.zeros(ring, self.dtype),
                    "v_ring": jnp.zeros(ring, self.dtype),
                    "k_cls": jnp.zeros(cls, self.dtype),
                    "v_cls": jnp.zeros(cls, self.dtype)}
        shape = (batch_size, self.local_heads, max_length, head_dim)
        return {"k": jnp.zeros(shape, self.dtype),
                "v": jnp.zeros(shape, self.dtype)}

    def _decode_ring(self, q, k_t, v_t, cache, index):
        """Sliding-window decode against the block-ring cache.

        Write: position `index` goes to ring offset index % (window*bs)
        (block b occupies slot b % window); positions < block_size are also
        copied into the CLS store via a one-sided cond. Read: ring slot s
        currently holds block b_s = qb - ((qb % w - s) % w); a ring entry is
        attendable iff its absolute position b_s*bs + i is <= index and
        b_s >= 0 — which masks both unwritten slots and the current block's
        stale tail. The CLS store is attended only once block 0 has left the
        ring band (qb >= window), so block 0 is never double-counted.
        Equals the full-cache masked attention exactly (tested)."""
        bs, w = self.block_size, self.window_size
        ring_len = w * bs
        dt = cache["k_ring"].dtype
        ring_idx = jnp.asarray(index) % ring_len
        k_ring = jax.lax.dynamic_update_slice_in_dim(
            cache["k_ring"], k_t.astype(dt), ring_idx, axis=2)
        v_ring = jax.lax.dynamic_update_slice_in_dim(
            cache["v_ring"], v_t.astype(dt), ring_idx, axis=2)
        k_cls, v_cls = jax.lax.cond(
            index < bs,
            lambda kv: (jax.lax.dynamic_update_slice_in_dim(
                            kv[0], k_t.astype(dt), index, axis=2),
                        jax.lax.dynamic_update_slice_in_dim(
                            kv[1], v_t.astype(dt), index, axis=2)),
            lambda kv: kv,
            (cache["k_cls"], cache["v_cls"]))

        qb = index // bs
        j = jnp.arange(ring_len)
        slot, offs = j // bs, j % bs
        b_s = qb - ((qb % w - slot) % w)   # block currently in each slot
        pos = b_s * bs + offs
        ring_valid = (pos <= index) & (b_s >= 0)
        cls_valid = jnp.broadcast_to(qb >= w, (bs,))
        valid = jnp.concatenate([cls_valid, ring_valid])

        k_all = jnp.concatenate([k_cls, k_ring], axis=2)
        v_all = jnp.concatenate([v_cls, v_ring], axis=2)
        out = dense_attention(q, k_all, v_all, valid[None, None, None, :])
        cache = {"k_ring": k_ring, "v_ring": v_ring,
                 "k_cls": k_cls, "v_cls": v_cls}
        return self._finalize(out), cache

    def decode_rowwise(self, x_t, cache, index):
        """One-token attention with PER-ROW positions: index [B] int32 is
        the absolute position each row is writing (continuous batching —
        rows decode different documents at different offsets; see
        generation.RowDecodeState / serving.py). Semantics per row equal
        `decode` at that row's index (tested); cache writes are one-hot
        compare+where rewrites of the O(window) cache (row_cache_write) —
        parallel VPU work XLA fuses, instead of the serializing XLA
        scatter a batch-varying `.at[rows, :, idx]` lowers to."""
        q = apply_rotary(split_heads(self.q_linear(x_t), self.local_heads),
                         self.rotary_base, offset=index)
        k_t = apply_rotary(split_heads(self.k_linear(x_t), self.local_heads),
                           self.rotary_base, offset=index)
        v_t = split_heads(self.v_linear(x_t), self.local_heads)

        if "k_ring" in cache:
            bs, w = self.block_size, self.window_size
            ring_len = w * bs
            ring_idx = index % ring_len
            k_ring = row_cache_write(cache["k_ring"], ring_idx, k_t[:, :, 0])
            v_ring = row_cache_write(cache["v_ring"], ring_idx, v_t[:, :, 0])
            # Positions < block_size also enter the CLS store; others are
            # routed out of bounds and dropped.
            cls_pos = jnp.where(index < bs, index, bs)
            k_cls = row_cache_write(cache["k_cls"], cls_pos, k_t[:, :, 0])
            v_cls = row_cache_write(cache["v_cls"], cls_pos, v_t[:, :, 0])

            # Per-row ring validity: same slot->block math as _decode_ring,
            # vectorized over rows. Correct across a row RESET (refill):
            # the new document rewrites positions 0.. sequentially, so every
            # slot the mask admits has been overwritten by the current doc.
            qb = index // bs                                       # [B]
            j = jnp.arange(ring_len)
            slot, offs = j // bs, j % bs
            b_s = qb[:, None] - ((qb[:, None] % w - slot[None, :]) % w)
            pos = b_s * bs + offs[None, :]
            ring_valid = (pos <= index[:, None]) & (b_s >= 0)
            cls_valid = jnp.broadcast_to((qb >= w)[:, None],
                                         (x_t.shape[0], bs))
            valid = jnp.concatenate([cls_valid, ring_valid], axis=1)

            k_all = jnp.concatenate([k_cls, k_ring], axis=2)
            v_all = jnp.concatenate([v_cls, v_ring], axis=2)
            out = dense_attention(q, k_all, v_all, valid[:, None, None, :])
            cache = {"k_ring": k_ring, "v_ring": v_ring,
                     "k_cls": k_cls, "v_cls": v_cls}
            return self._finalize(out), cache

        k = row_cache_write(cache["k"], index, k_t[:, :, 0])
        v = row_cache_write(cache["v"], index, v_t[:, :, 0])
        positions = jnp.arange(k.shape[2])
        valid = positions[None, :] <= index[:, None]               # [B, K]
        if self.sparse:
            qb = index // self.block_size
            kb = positions // self.block_size
            valid = valid & ((kb[None, :] > (qb[:, None] - self.window_size))
                             | (kb[None, :] == 0))
        out = dense_attention(q, k, v, valid[:, None, None, :])
        return self._finalize(out), {"k": k, "v": v}

    def decode(self, x_t, cache, index):
        """One-token attention (x_t: [B, 1, D]) against a KV cache.

        Functional equivalent of the reference's class-level cache protocol
        (attention.py:107-168): the new k/v are written at `index`, the query
        attends over positions <= index (no causal mask needed at decode,
        attention.py:96-97). Dense models keep the full max_length cache;
        sparse models use the O(window) block-ring cache (init_cache).
        """
        q = self.q_linear(x_t)
        q = apply_rotary(split_heads(q, self.local_heads), self.rotary_base,
                         offset=index)
        k_t = apply_rotary(split_heads(self.k_linear(x_t), self.local_heads),
                           self.rotary_base, offset=index)
        v_t = split_heads(self.v_linear(x_t), self.local_heads)

        if "k_ring" in cache:
            return self._decode_ring(q, k_t, v_t, cache, index)

        cache = {
            "k": jax.lax.dynamic_update_slice_in_dim(
                cache["k"], k_t.astype(cache["k"].dtype), index, axis=2),
            "v": jax.lax.dynamic_update_slice_in_dim(
                cache["v"], v_t.astype(cache["v"].dtype), index, axis=2),
        }
        positions = jnp.arange(cache["k"].shape[2])
        valid = positions <= index
        if self.sparse:
            # Block-aligned window (+ [CLS] block), matching the training
            # mask: the query's block attends blocks
            # [qb - window + 1 .. qb] plus block 0.
            qb = index // self.block_size
            kb = positions // self.block_size
            valid = valid & ((kb > qb - self.window_size) | (kb == 0))
        out = dense_attention(q, cache["k"], cache["v"],
                              valid[None, None, None, :])
        return self._finalize(out), cache

    def decode_chunk(self, x, cache, index):
        """C-token attention against the cache WITHOUT committing — the
        speculative-verification peek (models/spec_decode.py).

        x: [B, C, D] chunk occupying absolute positions index..index+C-1
        (scalar index; the cache has been committed through index-1).
        Query i attends the committed cache (positions <= index-1, window-
        masked for sparse models) plus chunk positions j <= i; the result
        equals C sequential `decode` calls exactly (tested), but the cache
        is left untouched: whether the chunk's tokens become real is only
        known after verification, so the caller commits the accepted prefix
        afterwards via `commit_chunk`. Returns (out [B, C, D], (k_c, v_c)).
        """
        c = x.shape[1]
        q = apply_rotary(split_heads(self.q_linear(x), self.local_heads),
                         self.rotary_base, offset=index)
        k_c = apply_rotary(split_heads(self.k_linear(x), self.local_heads),
                           self.rotary_base, offset=index)
        v_c = split_heads(self.v_linear(x), self.local_heads)
        ci = jnp.arange(c)
        intra = ci[:, None] >= ci[None, :]                   # [C, C] causal

        if "k_ring" in cache:
            bs, w = self.block_size, self.window_size
            ring_len = w * bs
            # The chunk may not reach past the CLS store's lifetime: a
            # query with qb >= w while block 0 is still being written
            # (index < bs) would need the half-filled CLS store.
            assert c <= (w - 1) * bs + 1, (c, w, bs)
            qb = (index + ci) // bs                           # [C]
            # Ring slot contents as of the COMMITTED state (positions
            # <= index-1): same slot->block math as _decode_ring, anchored
            # at the last written block instead of the query's.
            qb_old = (index - 1) // bs
            j = jnp.arange(ring_len)
            slot, offs = j // bs, j % bs
            b_old = qb_old - ((qb_old % w - slot) % w)
            pos_old = b_old * bs + offs
            written = (pos_old <= index - 1) & (b_old >= 0)
            ring_valid = written[None, :] & (b_old[None, :]
                                             > (qb[:, None] - w))
            cls_valid = jnp.broadcast_to((qb >= w)[:, None], (c, bs))
            # Intra-chunk pairs are always within the window: the C bound
            # keeps qb_i - qb_j <= (C-1)/bs < w.
            valid = jnp.concatenate([cls_valid, ring_valid, intra], axis=1)
            dt = cache["k_ring"].dtype
            k_all = jnp.concatenate(
                [cache["k_cls"], cache["k_ring"], k_c.astype(dt)], axis=2)
            v_all = jnp.concatenate(
                [cache["v_cls"], cache["v_ring"], v_c.astype(dt)], axis=2)
            out = dense_attention(q, k_all, v_all, valid[None, None])
            return self._finalize(out), (k_c, v_c)

        positions = jnp.arange(cache["k"].shape[2])
        old_valid = jnp.broadcast_to((positions <= index - 1)[None, :],
                                     (c, positions.shape[0]))
        if self.sparse:
            qb = (index + ci) // self.block_size
            kb = positions // self.block_size
            old_valid = old_valid & ((kb[None, :] > (qb[:, None]
                                                     - self.window_size))
                                     | (kb[None, :] == 0))
        valid = jnp.concatenate([old_valid, intra], axis=1)
        dt = cache["k"].dtype
        k_all = jnp.concatenate([cache["k"], k_c.astype(dt)], axis=2)
        v_all = jnp.concatenate([cache["v"], v_c.astype(dt)], axis=2)
        out = dense_attention(q, k_all, v_all, valid[None, None])
        return self._finalize(out), (k_c, v_c)

    def decode_chunk_rowwise(self, x, cache, index):
        """decode_chunk with PER-ROW positions: index [B] int32 is each
        row's chunk start (continuous batching — rows sit at their own
        offsets). Row r's semantics equal decode_chunk at index[r]
        (tested). Returns (out [B, C, D], (k_c, v_c)) — commit via
        commit_chunk_rowwise."""
        b, c = x.shape[:2]
        q = apply_rotary(split_heads(self.q_linear(x), self.local_heads),
                         self.rotary_base, offset=index)
        k_c = apply_rotary(split_heads(self.k_linear(x), self.local_heads),
                           self.rotary_base, offset=index)
        v_c = split_heads(self.v_linear(x), self.local_heads)
        ci = jnp.arange(c)
        intra = (ci[:, None] >= ci[None, :])[None]           # [1, C, C]

        if "k_ring" in cache:
            bs, w = self.block_size, self.window_size
            ring_len = w * bs
            assert c <= (w - 1) * bs + 1, (c, w, bs)
            qb = (index[:, None] + ci[None, :]) // bs         # [B, C]
            qb_old = (index - 1) // bs                        # [B]
            j = jnp.arange(ring_len)
            slot, offs = j // bs, j % bs
            b_old = qb_old[:, None] - ((qb_old[:, None] % w
                                        - slot[None, :]) % w)  # [B, ring]
            pos_old = b_old * bs + offs[None, :]
            written = (pos_old <= (index - 1)[:, None]) & (b_old >= 0)
            ring_valid = written[:, None, :] & (b_old[:, None, :]
                                                > (qb[:, :, None] - w))
            cls_valid = jnp.broadcast_to((qb >= w)[:, :, None], (b, c, bs))
            valid = jnp.concatenate(
                [cls_valid, ring_valid,
                 jnp.broadcast_to(intra, (b, c, c))], axis=2)
            dt = cache["k_ring"].dtype
            k_all = jnp.concatenate(
                [cache["k_cls"], cache["k_ring"], k_c.astype(dt)], axis=2)
            v_all = jnp.concatenate(
                [cache["v_cls"], cache["v_ring"], v_c.astype(dt)], axis=2)
            out = dense_attention(q, k_all, v_all, valid[:, None])
            return self._finalize(out), (k_c, v_c)

        positions = jnp.arange(cache["k"].shape[2])
        old_valid = jnp.broadcast_to(
            (positions[None, :] <= (index - 1)[:, None])[:, None, :],
            (b, c, positions.shape[0]))
        if self.sparse:
            qb = (index[:, None] + ci[None, :]) // self.block_size
            kb = positions // self.block_size
            old_valid = old_valid & ((kb[None, None, :]
                                      > (qb[:, :, None] - self.window_size))
                                     | (kb[None, None, :] == 0))
        valid = jnp.concatenate(
            [old_valid, jnp.broadcast_to(intra, (b, c, c))], axis=2)
        dt = cache["k"].dtype
        k_all = jnp.concatenate([cache["k"], k_c.astype(dt)], axis=2)
        v_all = jnp.concatenate([cache["v"], v_c.astype(dt)], axis=2)
        out = dense_attention(q, k_all, v_all, valid[:, None])
        return self._finalize(out), (k_c, v_c)

    def commit_chunk_rowwise(self, cache, kv, index, m):
        """commit_chunk with PER-ROW start positions (index [B]) and
        PER-ROW accepted lengths (m [B]) — scatter-free one-hot merges,
        like row_cache_write."""
        k_c, v_c = kv
        b, _, c, _ = k_c.shape
        if "k_ring" in cache:
            bs, w = self.block_size, self.window_size
            ring_len = w * bs
            assert ring_len >= c, (ring_len, c)
            s = jnp.arange(ring_len)
            i_s = (s[None, :] - index[:, None]) % ring_len      # [B, ring]
            valid = i_s < jnp.minimum(m, c)[:, None]
            idx = jnp.clip(i_s, 0, c - 1)

            def wr(buf, new):
                g = jnp.take_along_axis(
                    new.astype(buf.dtype),
                    idx[:, None, :, None].repeat(new.shape[1], 1)
                       .repeat(new.shape[3], 3), axis=2)
                return jnp.where(valid[:, None, :, None], g, buf)

            p = jnp.arange(bs)
            i_p = p[None, :] - index[:, None]                   # [B, bs]
            cvalid = (i_p >= 0) & (i_p < jnp.minimum(m, c)[:, None])
            cidx = jnp.clip(i_p, 0, c - 1)

            def wr_cls(buf, new):
                g = jnp.take_along_axis(
                    new.astype(buf.dtype),
                    cidx[:, None, :, None].repeat(new.shape[1], 1)
                        .repeat(new.shape[3], 3), axis=2)
                return jnp.where(cvalid[:, None, :, None], g, buf)

            return {"k_ring": wr(cache["k_ring"], k_c),
                    "v_ring": wr(cache["v_ring"], v_c),
                    "k_cls": wr_cls(cache["k_cls"], k_c),
                    "v_cls": wr_cls(cache["v_cls"], v_c)}

        # Dense cache: O(max_length) gather-merge per call (per-row starts
        # preclude a static slice). Ring caches are the serving layout;
        # this path exists for completeness and short dense contexts.
        positions = jnp.arange(cache["k"].shape[2])
        i_p = positions[None, :] - index[:, None]               # [B, L]
        valid = (i_p >= 0) & (i_p < jnp.minimum(m, c)[:, None])
        idx = jnp.clip(i_p, 0, c - 1)

        def wr_dense(buf, new):
            g = jnp.take_along_axis(
                new.astype(buf.dtype),
                idx[:, None, :, None].repeat(new.shape[1], 1)
                   .repeat(new.shape[3], 3), axis=2)
            return jnp.where(valid[:, None, :, None], g, buf)

        return {"k": wr_dense(cache["k"], k_c),
                "v": wr_dense(cache["v"], v_c)}

    def commit_chunk(self, cache, kv, index, m):
        """Write the first m tokens of a decode_chunk peek into the cache.

        m is a traced scalar (0 <= m <= C): the verified-accepted prefix
        length. Positions index..index+m-1 become committed; the rejected
        tail is never written, so the cache invariant (contents = exactly
        the final tokens) is preserved — speculative rewind is a no-op.
        """
        k_c, v_c = kv
        c = k_c.shape[2]
        if "k_ring" in cache:
            bs, w = self.block_size, self.window_size
            ring_len = w * bs
            assert ring_len >= c, (ring_len, c)
            s = jnp.arange(ring_len)
            i_s = (s - index) % ring_len                  # chunk idx per slot
            valid = i_s < jnp.minimum(m, c)
            idx = jnp.clip(i_s, 0, c - 1)

            def wr(buf, new):
                g = jnp.take(new.astype(buf.dtype), idx, axis=2)
                return jnp.where(valid[None, None, :, None], g, buf)

            # CLS store: absolute positions 0..bs-1 (only touched when the
            # chunk overlaps block 0).
            p = jnp.arange(bs)
            i_p = p - index
            cvalid = (i_p >= 0) & (i_p < jnp.minimum(m, c))
            cidx = jnp.clip(i_p, 0, c - 1)

            def wr_cls(buf, new):
                g = jnp.take(new.astype(buf.dtype), cidx, axis=2)
                return jnp.where(cvalid[None, None, :, None], g, buf)

            return {"k_ring": wr(cache["k_ring"], k_c),
                    "v_ring": wr(cache["v_ring"], v_c),
                    "k_cls": wr_cls(cache["k_cls"], k_c),
                    "v_cls": wr_cls(cache["v_cls"], v_c)}

        # Dense cache: read-modify-write a C-token region (the caller sizes
        # max_length with >= C slack so the slice never clamps).
        b, h, _, dh = k_c.shape
        sel = (jnp.arange(c) < m)[None, None, :, None]

        def wr_dense(buf, new):
            region = jax.lax.dynamic_slice(buf, (0, 0, index, 0),
                                           (b, h, c, dh))
            merged = jnp.where(sel, new.astype(buf.dtype), region)
            return jax.lax.dynamic_update_slice(buf, merged,
                                                (0, 0, index, 0))

        return {"k": wr_dense(cache["k"], k_c),
                "v": wr_dense(cache["v"], v_c)}


def fill_cache_row(cache: dict, row, k, v, length) -> dict:
    """Write ONE row of a decode cache from full-prefix K/V in one shot —
    the bulk-prefill primitive (server.py): equals `length` sequential
    decode writes of positions 0..length-1 (tested).

    cache: a batched init_cache dict (ring or dense layout); row: int32
    row index; k, v: [H, Lp, Dh] head-major rotary K/V of the prefix (the
    "cache_seed" sown by Attention.__call__), Lp >= length; length: int32
    count of REAL positions. Pad positions (>= length) never enter: the
    ring gather stops at length-1, the CLS store is masked, and the dense
    tail is only ever attended after being overwritten (decode masks
    positions <= index).
    """
    last = length - 1  # newest written position
    if "k_ring" in cache:
        ring_len = cache["k_ring"].shape[2]
        bs = cache["k_cls"].shape[2]
        dt = cache["k_ring"].dtype
        o = jnp.arange(ring_len)
        # Final occupant of ring offset o after sequential writes 0..last:
        # the largest pos <= last with pos % ring_len == o (or never
        # written, when the prefix is shorter than the ring).
        pos_o = last - ((last - o) % ring_len)
        sel = jnp.clip(pos_o, 0, k.shape[1] - 1)
        ring_ok = (pos_o >= 0)[None, :, None]
        k_row = jnp.where(ring_ok, jnp.take(k, sel, axis=1), 0).astype(dt)
        v_row = jnp.where(ring_ok, jnp.take(v, sel, axis=1), 0).astype(dt)
        c = jnp.arange(bs)
        cls_ok = (c <= last)[None, :, None]
        csel = jnp.clip(c, 0, k.shape[1] - 1)
        k_cls = jnp.where(cls_ok, jnp.take(k, csel, axis=1), 0).astype(dt)
        v_cls = jnp.where(cls_ok, jnp.take(v, csel, axis=1), 0).astype(dt)
        return {"k_ring": cache["k_ring"].at[row].set(k_row),
                "v_ring": cache["v_ring"].at[row].set(v_row),
                "k_cls": cache["k_cls"].at[row].set(k_cls),
                "v_cls": cache["v_cls"].at[row].set(v_cls)}
    dt = cache["k"].dtype
    lp = min(k.shape[1], cache["k"].shape[2])
    return {"k": cache["k"].at[row, :, :lp].set(k[:, :lp].astype(dt)),
            "v": cache["v"].at[row, :, :lp].set(v[:, :lp].astype(dt))}

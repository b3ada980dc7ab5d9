"""Pre-LN transformer layer with optional cross-attention.

Flax port of /root/reference/sparse_vae/core/transformer_layer.py: self-attn
-> optional cross-attn (separate LayerNorms for query and context, :35-40)
-> 4x GELU FFN with bias-free output projection (:17-21) and dropout 0.1
(:22). The residual is skipped when learned queries change the sequence
length (:49).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import Attention
from .base import dense_kernel_init


class TransformerLayer(nn.Module):
    d_model: int
    num_heads: int
    causal: bool = False
    use_cross_attention: bool = False
    sparse_self_attention: bool = False
    window_size: int = 2
    block_size: int = 128
    learned_queries: Optional[int] = None
    dropout_rate: float = 0.1
    use_pallas_kernel: bool = True
    dtype: Any = jnp.float32
    # Tensor parallelism (parallel/tp.py): ffn_in is column-parallel,
    # ffn_out row-parallel (bias-free, so one psum closes it); attention
    # shards its heads. tp_size=1 is the old behavior exactly.
    tp_size: int = 1
    tp_axis: str = "model"
    # Sequence parallelism (parallel/sp.py). sp_cross_only: the layer's
    # SELF-attention runs on replicated activations (the Perceiver's latent
    # set) while only its cross-attention consumes the 'seq'-sharded
    # document — so sp applies to the cross path alone.
    sp_size: int = 1
    sp_axis: str = "seq"
    sp_cross_only: bool = False
    # Mixture-of-Experts FFN (models/moe.py): num_experts > 1 replaces the
    # dense 4x GELU FFN with E expert FFNs behind a learned top-k router.
    # ep_size > 1 only on the expert-parallel twin (parallel/ep.py).
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    ep_size: int = 1

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 1

    def setup(self):
        self.attention = Attention(
            d_model=self.d_model, num_heads=self.num_heads,
            causal=self.causal, sparse=self.sparse_self_attention,
            window_size=self.window_size, block_size=self.block_size,
            learned_queries=self.learned_queries,
            use_pallas_kernel=self.use_pallas_kernel, dtype=self.dtype,
            tp_size=self.tp_size, tp_axis=self.tp_axis,
            sp_size=1 if self.sp_cross_only else self.sp_size,
            sp_axis=self.sp_axis)
        init = dense_kernel_init(0.02)
        if self.is_moe:
            # MoE composes with TP by sharding every expert's hidden dim
            # over 'model' (the dense-FFN Megatron pattern per expert) —
            # MoEFFN owns the f/g collectives. MoE x EP x TP (a 3-axis
            # step) is guarded inside MoEFFN.setup.
            from .moe import MoEFFN
            self.moe = MoEFFN(d_model=self.d_model,
                              d_hidden=self.d_model * 4,
                              num_experts=self.num_experts,
                              top_k=self.moe_top_k,
                              capacity_factor=self.moe_capacity_factor,
                              dtype=self.dtype, ep_size=self.ep_size,
                              tp_size=self.tp_size, tp_axis=self.tp_axis)
        else:
            self.ffn_in = nn.Dense(self.d_model * 4 // self.tp_size,
                                   kernel_init=init, dtype=self.dtype)
            self.ffn_out = nn.Dense(self.d_model, use_bias=False,
                                    kernel_init=init, dtype=self.dtype)
        self.dropout = nn.Dropout(rate=self.dropout_rate)
        self.attn_layer_norm = nn.LayerNorm(dtype=self.dtype)
        self.ffn_layer_norm = nn.LayerNorm(dtype=self.dtype)
        if self.use_cross_attention:
            # Under sequence parallelism the cross-attention's sp role
            # depends on which side is sharded: the Perceiver pattern
            # (sp_cross_only) has REPLICATED queries (latents) over the
            # sharded document — the distributed-softmax combine; a decoder
            # layer's cross-attention has SHARDED queries over a replicated
            # context — plain local attention (sp_size=1), exact because
            # each shard attends the full context for its own rows.
            self.cross_attention = Attention(
                d_model=self.d_model, num_heads=self.num_heads,
                dtype=self.dtype,
                tp_size=self.tp_size, tp_axis=self.tp_axis,
                sp_size=self.sp_size if self.sp_cross_only else 1,
                sp_axis=self.sp_axis,
                sp_replicated_q=self.sp_cross_only)
            self.cross_attn_layer_norm = nn.LayerNorm(dtype=self.dtype)
            self.context_layer_norm = nn.LayerNorm(dtype=self.dtype)

    def _ffn(self, x, deterministic, mask=None):
        y = self.ffn_layer_norm(x)
        if self.is_moe:
            y = self.moe(y, mask=mask)
        elif self.tp_size > 1:
            from ..parallel.tp import reduce_activations, replicate_gradient
            y = replicate_gradient(y, self.tp_axis)       # column-parallel in
            y = self.ffn_out(nn.gelu(self.ffn_in(y)))     # partial (bias-free)
            y = reduce_activations(y, self.tp_axis)       # row-parallel close
        else:
            y = self.ffn_out(nn.gelu(self.ffn_in(y)))
        return x + self.dropout(y, deterministic=deterministic)

    def __call__(self, x, context=None, mask=None, context_mask=None,
                 deterministic: bool = True):
        """x: [B, L, D]; mask: [B, L] key-padding mask (True = valid);
        context: [B, Lc, D] for cross-attention."""
        y = self.attn_layer_norm(x)
        y = self.attention(y, y, kv_mask=mask)
        # No residual for learned-query layers: the query bank replaced x
        # (ref :49 gates on shape equality, which is equivalent for its
        # configs but misfires when a sequence shard happens to equal
        # num_latents — gate on intent instead).
        x = y if self.learned_queries else x + y

        if self.use_cross_attention and context is not None:
            ctx = self.context_layer_norm(context)
            y = self.cross_attn_layer_norm(x)
            y = self.cross_attention(y, ctx, kv_mask=context_mask)
            x = x + y

        return self._ffn(x, deterministic, mask=mask)

    def window_decode(self, x, cache, start, mask=None):
        """Active-window pass for frontier Jacobi decoding: like __call__
        restricted to absolute positions start..start+W-1, attending the
        frozen-prefix window cache. Returns (out [B, W, D], window (k, v)).
        mask ([B, W], True = real token) matters only for MoE configs: PAD
        positions must not be dispatched (capacity pollution)."""
        y = self.attn_layer_norm(x)
        y, kv = self.attention.window_attend(y, cache, start)
        x = x + y
        return self._ffn(x, True, mask=mask), kv

    def init_window_cache(self, batch_size: int):
        return self.attention.init_window_cache(batch_size)

    def decode(self, x_t, cache, index, mask=None):
        """One-token step against this layer's KV cache (no cross-attn path
        at decode — matches reference usage where context is None). mask
        ([B, 1]): see window_decode — dead rows feed [PAD] every step and
        must not consume MoE expert capacity from live rows."""
        y = self.attn_layer_norm(x_t)
        y, cache = self.attention.decode(y, cache, index)
        x = x_t + y
        return self._ffn(x, True, mask=mask), cache

    def decode_rowwise(self, x_t, cache, index, mask=None):
        """One-token step at PER-ROW positions (continuous batching)."""
        y = self.attn_layer_norm(x_t)
        y, cache = self.attention.decode_rowwise(y, cache, index)
        x = x_t + y
        return self._ffn(x, True, mask=mask), cache

    def decode_chunk(self, x, cache, index, mask=None):
        """C-token speculative-verification peek (no cache commit): equals
        C sequential `decode` steps; the caller commits the accepted prefix
        via commit_chunk. Returns (out [B, C, D], this layer's chunk K/V)."""
        y = self.attn_layer_norm(x)
        y, kv = self.attention.decode_chunk(y, cache, index)
        x = x + y
        return self._ffn(x, True, mask=mask), kv

    def commit_chunk(self, cache, kv, index, m):
        return self.attention.commit_chunk(cache, kv, index, m)

    def init_cache(self, batch_size: int, max_length: int):
        return self.attention.init_cache(batch_size, max_length)

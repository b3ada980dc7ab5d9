"""Perceiver encoder: variable-length sequence -> fixed set of latents.

Flax port of /root/reference/sparse_vae/core/perceiver.py: first layer uses a
learned-query bank to cross-attend over the input (:16), middle layers
self-attend over the latents and cross-attend back to the input (:25-28),
and an optional bottleneck layer compresses to `bottleneck_width` vectors
(:17-23). num_heads = d_model // 64 (:13).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .transformer_layer import TransformerLayer


class Perceiver(nn.Module):
    num_layers: int
    num_latents: int
    d_model: int
    bottleneck_width: Optional[int] = None
    init_scale: Optional[float] = 0.02
    dtype: Any = jnp.float32
    tp_size: int = 1          # tensor parallelism, see parallel/tp.py
    tp_axis: str = "model"
    # Sequence parallelism (parallel/sp.py): the INPUT x is sharded over
    # 'seq'; the latent set is replicated. The first (learned-query) layer
    # and the middle layers' cross-attention consume the sharded document
    # (distributed-softmax combine); latent self-attention and the
    # bottleneck run replicated on every shard.
    sp_size: int = 1
    sp_axis: str = "seq"

    def setup(self):
        assert self.num_layers > 1
        num_heads = max(1, self.d_model // 64)
        common = dict(d_model=self.d_model, num_heads=num_heads,
                      dtype=self.dtype, tp_size=self.tp_size,
                      tp_axis=self.tp_axis)
        self.first_layer = TransformerLayer(
            learned_queries=self.num_latents, sp_size=self.sp_size,
            sp_axis=self.sp_axis, **common)
        middle = self.num_layers - 1
        if self.bottleneck_width:
            # Learned queries over the REPLICATED latents — no sp.
            self.bottleneck = TransformerLayer(
                learned_queries=self.bottleneck_width, **common)
            middle -= 1
        self.middle_layers = [
            TransformerLayer(use_cross_attention=True, name=f"middle_{i}",
                             sp_size=self.sp_size, sp_axis=self.sp_axis,
                             sp_cross_only=True, **common)
            for i in range(max(middle, 0))
        ]

    def __call__(self, x, mask=None, deterministic: bool = True):
        """x: [B, L, D], mask: [B, L] (True = valid). Returns
        [B, bottleneck_width or num_latents, D]."""
        z = self.first_layer(x, mask=mask, deterministic=deterministic)
        for layer in self.middle_layers:
            z = layer(z, context=x, context_mask=mask,
                      deterministic=deterministic)
        if self.bottleneck_width:
            z = self.bottleneck(z, deterministic=deterministic)
        return z

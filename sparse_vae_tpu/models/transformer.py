"""Generic transformer stack: embedding -> N layers -> tied output head.

Parity with /root/reference/sparse_vae/core/transformer.py:5-27, which is
exported from the reference's core package (core/__init__.py:11) as a
reusable building block (the concrete models use the richer
TransformerLanguageModel instead).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .base import dense_kernel_init, embed_init
from .transformer_layer import TransformerLayer


class Transformer(nn.Module):
    vocab_size: int
    d_model: int
    num_heads: int
    num_layers: int
    causal: bool = True
    sparse_self_attention: bool = False
    window_size: int = 2
    block_size: int = 128
    use_pallas_kernel: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.d_model,
                                  embedding_init=embed_init(0.02))
        self.layers = [
            TransformerLayer(
                d_model=self.d_model, num_heads=self.num_heads,
                causal=self.causal,
                sparse_self_attention=self.sparse_self_attention,
                window_size=self.window_size, block_size=self.block_size,
                use_pallas_kernel=self.use_pallas_kernel,
                dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, token_ids, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """token_ids: [B, L] -> logits [B, L, V] via the tied embedding
        (transformer.py:22-27)."""
        if mask is None:
            mask = token_ids != 0
        x = self.embedding(token_ids).astype(self.dtype)
        for layer in self.layers:
            x = layer(x, None, mask, None, deterministic)
        table = self.embedding.embedding.astype(self.dtype)
        return x @ table.T

"""Rotary position embedding.

Functional port of the reference's `encode_position_rotary`
(/root/reference/sparse_vae/core/attention.py:194-208): interleaved-pair
rotation with theta_d = max_pos^(-d / (D/2)), supporting a position offset
for incremental decoding (the reference passed `self.cache_index`).

One deliberate deviation: the reference rotated the full d_model vector
*before* splitting heads (attention.py:61,70), giving each head a different
frequency band. We apply rotary per head (standard RoPE), which treats heads
uniformly and is the stronger design; `max_pos` plays the role of the RoPE
base. The sparse models' base is tied to the attention window span like the
reference (attention.py:52).
"""
from __future__ import annotations

import jax.numpy as jnp


def rotary_angles(length: int, dim_half: int, max_pos: float,
                  offset=0, dtype=jnp.float32):
    """[length, dim_half] rotation angles for positions offset..offset+L-1."""
    freqs = jnp.arange(dim_half, dtype=dtype)
    theta = max_pos ** (-freqs / dim_half)
    positions = jnp.arange(length, dtype=dtype) + offset
    return positions[:, None] * theta[None, :]


def apply_rotary(x, max_pos: float = 10_000.0, offset=0):
    """Rotate interleaved pairs of the last axis by position-dependent angles.

    x: [..., L, D] with D even (per head). For pair (x0, x1):
    out = (x0 cos - x1 sin, x1 cos + x0 sin) — attention.py:199-208.

    offset may be a scalar (whole batch at one position — the classic decode
    case) or a [B] array of PER-ROW positions with x of shape [B, H, L, D]
    (continuous-batching decode, where every row sits at its own index).
    """
    d_half = x.shape[-1] // 2
    if jnp.ndim(offset) == 1:
        assert x.ndim == 4, "per-row offsets need [B, H, L, D] inputs"
        freqs = jnp.arange(d_half, dtype=jnp.float32)
        theta = max_pos ** (-freqs / d_half)
        positions = (jnp.arange(x.shape[-2], dtype=jnp.float32)[None, :]
                     + offset[:, None].astype(jnp.float32))    # [B, L]
        angles = positions[..., None] * theta                  # [B, L, half]
        angles = angles[:, None]                               # [B, 1, L, .]
    else:
        angles = rotary_angles(x.shape[-2], d_half, max_pos, offset,
                               jnp.float32)
    cos = jnp.cos(angles).astype(x.dtype)
    sin = jnp.sin(angles).astype(x.dtype)

    x_pairs = x.reshape(*x.shape[:-1], d_half, 2)
    x0, x1 = x_pairs[..., 0], x_pairs[..., 1]
    out0 = x0 * cos - x1 * sin
    out1 = x1 * cos + x0 * sin
    return jnp.stack([out0, out1], axis=-1).reshape(x.shape)

"""Token-level cross-entropy losses.

Replaces the reference's `robust_cross_entropy`
(/root/reference/sparse_vae/core/language_model.py:161-170), which chunked
logits above 2^30 elements to dodge int32 CUDA kernel limits. On TPU the
equivalent memory problem is materializing the [B, L, 32768] logits tensor for
100k-token documents, so `chunked_cross_entropy` fuses the output projection
with the loss over sequence chunks inside a `lax.scan` — logits for only one
chunk ever exist, and XLA fuses projection + log-softmax + gather per chunk.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def token_nll(logits, labels, reduce: bool = True):
    """Mean negative log-likelihood over non-pad tokens (pad label == 0).

    Matches F.cross_entropy(..., ignore_index=0) semantics
    (language_model.py:164). logits: [..., L, V], labels: [..., L] int.
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    mask = (labels != 0).astype(jnp.float32)
    if not reduce:
        return nll * mask, mask
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def bits_per_byte(nll_sum, num_bytes):
    """Convert a summed token NLL (nats) into bits per byte.

    The reference logged `val_bpb` via a byte-weighted cross entropy
    (language_model.py:106-110); we compute the standard definition
    total_nats / total_bytes / ln(2) directly, which is what the metric means.
    """
    return nll_sum / jnp.maximum(num_bytes, 1.0) / jnp.log(2.0)


def chunked_cross_entropy(
    hidden: jax.Array,
    project_fn: Callable[[jax.Array], jax.Array],
    labels: jax.Array,
    chunk_size: int = 2048,
) -> Tuple[jax.Array, jax.Array]:
    """Fused output-projection + CE over sequence chunks.

    hidden: [B, L, D] decoder states; project_fn maps [B, C, D] -> [B, C, V]
    logits; labels: [B, L]. Returns (nll_sum, token_count) reduced over all
    non-pad positions. L is padded up to a chunk multiple internally (padding
    labels are 0 and therefore ignored).
    """
    b, length, d = hidden.shape
    num_chunks = -(-length // chunk_size)
    padded = num_chunks * chunk_size
    if padded != length:
        hidden = jnp.pad(hidden, ((0, 0), (0, padded - length), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, padded - length)))

    # Remat the chunk body: without it, lax.scan stacks every chunk's
    # [B, C, V] logits as backward residuals — exactly the memory blow-up
    # this function exists to avoid. With remat only the [B, C, D] hidden
    # chunks are saved and logits are recomputed in the backward pass.
    @jax.checkpoint
    def chunk_loss(h, y):
        # Projection stays in model dtype (bf16 matmul output halves the
        # HBM write vs emitting fp32 from the MXU — measured faster); the
        # fp32 convert fuses into the consuming reduces.
        logits = project_fn(h).astype(jnp.float32)
        # nll = logsumexp - label logit, WITHOUT materializing the full
        # [B, C, V] log-softmax (a second multi-GB fp32 tensor per chunk):
        # the logsumexp reduce and the label gather both consume the raw
        # logits, which XLA keeps fused with the projection matmul.
        lse = jax.nn.logsumexp(logits, axis=-1)
        label_logit = jnp.take_along_axis(
            logits, y[..., None], axis=-1)[..., 0]
        mask = (y != 0).astype(jnp.float32)
        return jnp.sum((lse - label_logit) * mask), jnp.sum(mask)

    # Scan over chunk *indices* and dynamic-slice in place — stacking
    # [num_chunks, B, C, D] via reshape+transpose costs a full extra copy
    # of the hidden states in HBM.
    def body(carry, ci):
        nll_sum, count = carry
        h = jax.lax.dynamic_slice_in_dim(hidden, ci * chunk_size,
                                         chunk_size, axis=1)
        y = jax.lax.dynamic_slice_in_dim(labels, ci * chunk_size,
                                         chunk_size, axis=1)
        s, c = chunk_loss(h, y)
        return (nll_sum + s, count + c), None

    (nll_sum, count), _ = jax.lax.scan(
        body, (jnp.zeros([], jnp.float32), jnp.zeros([], jnp.float32)),
        jnp.arange(num_chunks))
    return nll_sum, count


def chunked_sequence_log_likelihood(
    hidden: jax.Array,
    project_fn: Callable[[jax.Array], jax.Array],
    labels: jax.Array,
    chunk_size: int = 2048,
) -> jax.Array:
    """Per-ROW summed log p(labels) without materializing [B, L, V] logits.

    The long-document IWAE path (continuous_autoencoder.py:62-80 needs a
    per-document log p(x|z); at 102,400 tokens x 32,768 vocab the full
    logits are ~13 GB fp32, so the projection + gather run fused over
    sequence chunks like chunked_cross_entropy). hidden: [B, L, D];
    labels: [B, L] (0 = pad). Returns [B].
    """
    b, length, d = hidden.shape
    num_chunks = -(-length // chunk_size)
    padded = num_chunks * chunk_size
    if padded != length:
        hidden = jnp.pad(hidden, ((0, 0), (0, padded - length), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, padded - length)))

    @jax.checkpoint
    def chunk_ll(h, y):
        logits = project_fn(h).astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        label_logit = jnp.take_along_axis(
            logits, y[..., None], axis=-1)[..., 0]
        mask = (y != 0).astype(jnp.float32)
        return jnp.sum((label_logit - lse) * mask, axis=-1)  # [B]

    def body(ll, ci):
        h = jax.lax.dynamic_slice_in_dim(hidden, ci * chunk_size,
                                         chunk_size, axis=1)
        y = jax.lax.dynamic_slice_in_dim(labels, ci * chunk_size,
                                         chunk_size, axis=1)
        return ll + chunk_ll(h, y), None

    ll, _ = jax.lax.scan(body, jnp.zeros((b,), jnp.float32),
                         jnp.arange(num_chunks))
    return ll


def sequence_log_likelihood(logits, labels):
    """Per-sequence summed log p(x) with pad positions zeroed.

    Equivalent of ContinuousVAE.p_of_x_given_z's gather
    (continuous_autoencoder.py:83-88): returns [...,] log-likelihood summed
    over the length axis, treating label 0 as padding.
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(labels != 0, ll, 0.0), axis=-1)

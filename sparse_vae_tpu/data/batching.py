"""Token-budget batching with XLA-static shapes.

Re-designs the reference's `UniformSizeRandomSampler`
(/root/reference/sparse_vae/data_utils.py:54-101) for the TPU compilation
model. The reference packed variable-size batches subject to
``max_doc_len * batch_count <= tokens_per_batch``; every batch could have a
fresh (B, L) shape, which is free on GPU but a recompile per shape under jit.

Here documents are quantized into length buckets (multiples of
``pad_to_multiple_of``, 512 like text_data_module.py:50), and every bucket has
ONE fixed batch shape: ``(tokens_per_batch // L_bucket, L_bucket)``. The
token-budget invariant still holds (rows * L <= tokens_per_batch), shuffling
happens within buckets and across batch order (the sampler's
shuffle->stable-sort-by-bin behavior, data_utils.py:63-67), and the number of
distinct compiled shapes is bounded by the number of buckets. Short final
batches are padded with all-[PAD] rows, which the loss masks out.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, NamedTuple, Optional, Sequence

import numpy as np


class TextBatch(NamedTuple):
    """The device batch: [B, L] int32 token ids (0 = [PAD]) plus per-row
    token/byte counts. Rows that are pure padding have num_tokens == 0.

    Replaces the reference's PaddedTensor (padded_tensor.py:12): the padding
    mask is derivable as ``token_ids != 0`` and never travels separately.
    """
    token_ids: np.ndarray   # [B, L] int32
    num_tokens: np.ndarray  # [B] int32 (real token count incl. CLS/SEP)
    num_bytes: np.ndarray   # [B] int32 (raw text bytes; 0 for pad rows)

    @property
    def mask(self):
        return self.token_ids != 0


def length_bucket(n_tokens: int, multiple: int = 512,
                  coarsen_after: int = 8) -> int:
    """Round a document length up to its padding bucket.

    The reference rounds up to a fixed 512 multiple
    (text_data_module.py:166-170); on GPU a fresh shape is free, but under
    jit every distinct bucket is one XLA compile. With documents spanning
    512..100k tokens that is ~200 buckets, so beyond ``coarsen_after``
    multiples the granularity doubles each octave: buckets are multiples of
    512 up to 4096 tokens, multiples of 1024 up to 8192, and so on. This
    bounds the compiled-shape count at ~3*coarsen_after regardless of corpus
    length spread, while padding waste on long documents stays below
    ~1/coarsen_after of the batch.
    """
    g = multiple
    while coarsen_after > 0 and n_tokens > coarsen_after * g:
        g *= 2
    return ((n_tokens + g - 1) // g) * g


@dataclass
class BatchPlan:
    """One batch to assemble: bucket length + document indices (may be fewer
    than rows_per_batch; the collate pads the remainder with [PAD] rows)."""
    bucket_len: int
    rows: int
    doc_indices: List[int]


def plan_batches(
    lengths: Sequence[int],
    tokens_per_batch: int,
    pad_to_multiple_of: int = 512,
    rng: Optional[np.random.Generator] = None,
    drop_remainder: bool = False,
    rows_multiple_of: int = 1,
) -> List[BatchPlan]:
    """Build an epoch's batch plan.

    Every document is assigned to its length bucket; each bucket yields
    batches of exactly ``max(1, tokens_per_batch // bucket_len)`` rows.
    Documents are shuffled within buckets and the final batch list is
    shuffled, matching the reference sampler's semantics
    (data_utils.py:63-86) with a fixed shape per bucket.

    rows_multiple_of: force the batch (row) dimension to a multiple — the
    data-parallel axis size, so every batch shards evenly over the mesh.
    """
    rng = rng or np.random.default_rng()
    lengths = np.asarray(lengths)
    # Bucket coarsening exists only to bound the compiled-shape count. A
    # corpus that is already shape-bounded — e.g. concat_documents streams,
    # all exactly max_tokens long — gets exact 512-multiple buckets instead
    # (the pg19 regime would otherwise pad 102,400 -> 114,688, 12% waste).
    if len(np.unique(lengths)) <= 4:
        m = pad_to_multiple_of
        buckets = ((lengths + m - 1) // m) * m
    else:
        buckets = np.array([length_bucket(int(n), pad_to_multiple_of)
                            for n in lengths])

    plans: List[BatchPlan] = []
    for bucket_len in np.unique(buckets):
        bucket_len = int(bucket_len)
        rows = max(1, tokens_per_batch // bucket_len)
        m = rows_multiple_of
        if m > 1:
            rows = max(m, (rows // m) * m)
        idx = np.flatnonzero(buckets == bucket_len)
        rng.shuffle(idx)
        for start in range(0, len(idx), rows):
            chunk = idx[start:start + rows]
            if drop_remainder and len(chunk) < rows:
                continue
            plans.append(BatchPlan(bucket_len=bucket_len, rows=rows,
                                   doc_indices=[int(i) for i in chunk]))
    order = rng.permutation(len(plans))
    return [plans[i] for i in order]


def collate(
    plan: BatchPlan,
    docs: Sequence[np.ndarray],
    num_bytes: Sequence[int],
) -> TextBatch:
    """Assemble a fixed-shape TextBatch from a plan.

    docs[i] are uint16/int token-id arrays for plan.doc_indices (pre-fetched
    by the caller in plan order). Equivalent of TextDataModule.collate +
    pad_pack (text_data_module.py:194-228), minus the uint16 reinterpret
    dance — we upcast to int32 once, on the host.
    """
    out = np.zeros((plan.rows, plan.bucket_len), dtype=np.int32)
    n_tok = np.zeros(plan.rows, dtype=np.int32)
    n_byte = np.zeros(plan.rows, dtype=np.int32)
    for row, (doc, nb) in enumerate(zip(docs, num_bytes)):
        L = min(len(doc), plan.bucket_len)
        out[row, :L] = doc[:L].astype(np.int32)
        n_tok[row] = L
        n_byte[row] = nb
    return TextBatch(token_ids=out, num_tokens=n_tok, num_bytes=n_byte)


def batch_shapes(plans: Sequence[BatchPlan]) -> set:
    """Distinct (rows, bucket_len) shapes an epoch will compile."""
    return {(p.rows, p.bucket_len) for p in plans}


def iterate_epoch(
    corpus,
    tokens_per_batch: int,
    pad_to_multiple_of: int = 512,
    rng: Optional[np.random.Generator] = None,
    drop_remainder: bool = False,
    rows_multiple_of: int = 1,
) -> Iterator[TextBatch]:
    """Yield collated batches for one epoch over `corpus`.

    `corpus` must expose .lengths (np array), .num_bytes (np array), and
    .get_docs(indices) -> list of token arrays (see datasets.py).
    """
    plans = plan_batches(corpus.lengths, tokens_per_batch, pad_to_multiple_of,
                         rng, drop_remainder, rows_multiple_of)
    arena = corpus.ensure_arena() if hasattr(corpus, "ensure_arena") else None
    if arena is not None:
        from .native import pack_batch
        for plan in plans:
            tokens, num_tokens = pack_batch(arena, plan.doc_indices,
                                            plan.rows, plan.bucket_len)
            nbytes = np.zeros(plan.rows, dtype=np.int32)
            nbytes[:len(plan.doc_indices)] = corpus.num_bytes[
                plan.doc_indices]
            yield TextBatch(tokens, num_tokens, nbytes)
        return
    for plan in plans:
        docs = corpus.get_docs(plan.doc_indices)
        nbytes = [int(corpus.num_bytes[i]) for i in plan.doc_indices]
        yield collate(plan, docs, nbytes)

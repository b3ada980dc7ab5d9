"""Mass sampling sink.

Counterpart of /root/reference/sparse_vae/batch_generation.py: repeatedly
call a jitted batched sample function and stream results into one
preallocated host buffer, then trim each row at its [SEP]. The reference's
pinned-memory + non_blocking copies become jax async dispatch: the next
device batch is enqueued while np.asarray pulls the previous one.
"""
from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np


def batch_generate_samples(sample_fn: Callable[[int], "jax.Array"],
                           num_samples: int, max_length: int,
                           end_token: Optional[int] = 2,
                           progress: bool = True) -> List[np.ndarray]:
    """sample_fn(batch_index) -> [B, max_length-1] device tokens.

    Returns a list of np.int32 arrays trimmed after the first end_token
    (batch_generation.py:10-39).
    """
    buffer = np.zeros((num_samples, max_length - 1), dtype=np.int32)
    pbar = None
    if progress:
        try:
            from tqdm import tqdm
            pbar = tqdm(desc="Generating samples", total=num_samples,
                        unit="samples", smoothing=0.1)
        except ImportError:
            pass

    cur, call = 0, 0
    pending = sample_fn(call)  # async dispatch
    while cur < num_samples:
        ready = np.asarray(pending)  # blocks on this batch only
        call += 1
        if cur + len(ready) < num_samples:
            pending = sample_fn(call)  # overlap next batch with host copy
        n = min(len(ready), num_samples - cur)
        buffer[cur:cur + n] = ready[:n]
        cur += n
        if pbar is not None:
            pbar.update(n)
    if pbar is not None:
        pbar.close()

    outputs: List[np.ndarray] = []
    for row in buffer:
        if end_token is not None:
            ends = np.flatnonzero(row == end_token)
            if len(ends):
                row = row[:ends[0] + 1]
        outputs.append(row)
    return outputs

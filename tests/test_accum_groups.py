"""Gradient-accumulation grouping (training/trainer.py::defer_accum_groups):
partial groups must DEFER across epochs rather than emit odd-shaped stacks —
every yielded stack has the one fixed [k, rows, L] shape per length bucket
(each extra stacked shape is a fresh multi-minute XLA compile of the train
step; measured: 16 of 33 flagship-corpus train shapes were one-use epoch-end
remainders before this)."""
import numpy as np

from sparse_vae_tpu.data.batching import TextBatch
from sparse_vae_tpu.training.trainer import defer_accum_groups


def _batch(rows, length, fill):
    ids = np.full((rows, length), fill, np.int32)
    return TextBatch(token_ids=ids,
                     num_tokens=np.full((rows,), length, np.int32),
                     num_bytes=np.full((rows,), length * 4, np.int32))


def test_only_full_k_stacks_and_cross_epoch_carryover():
    k = 2
    # epoch 1: three (4, 64) batches and one (2, 128) batch -> one full
    # (4, 64) group; one (4, 64) + the (2, 128) defer.
    epoch1 = [_batch(4, 64, 1), _batch(4, 64, 2), _batch(2, 128, 3),
              _batch(4, 64, 4)]
    # epoch 2 completes both deferred groups.
    epoch2 = [_batch(2, 128, 5), _batch(4, 64, 6)]

    pending = {}
    got1 = list(defer_accum_groups(iter(epoch1), k, pending))
    assert [g[0]["token_ids"].shape for g in got1] == [(2, 4, 64)]
    np.testing.assert_array_equal(
        got1[0][0]["token_ids"][:, 0, 0], [1, 2])
    assert sum(len(v) for v in pending.values()) == 2  # deferred, not lost

    got2 = list(defer_accum_groups(iter(epoch2), k, pending))
    shapes = sorted(g[0]["token_ids"].shape for g in got2)
    assert shapes == [(2, 2, 128), (2, 4, 64)]
    fills = sorted(int(g[0]["token_ids"][0, 0, 0]) for g in got2)
    assert fills == [3, 4]  # the epoch-1 leftovers lead their groups
    assert not pending

    # num_tokens/num_bytes stack alongside
    assert got2[0][0]["num_tokens"].ndim == 2


def test_k1_passthrough():
    pending = {}
    got = list(defer_accum_groups(iter([_batch(3, 32, 1)]), 1, pending))
    assert [g[0]["token_ids"].shape for g in got] == [(1, 3, 32)]
    assert not pending

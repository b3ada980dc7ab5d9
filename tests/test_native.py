"""Native C++ packer vs the numpy collate, and arena save/load roundtrip."""
import numpy as np
import pytest

from sparse_vae_tpu.data import native
from sparse_vae_tpu.data.native import TokenArena, bucket_lengths, pack_batch


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(0)
    return [rng.integers(1, 60_000, size=rng.integers(5, 200)).astype(np.uint16)
            for _ in range(50)]


class TestTokenArena:
    def test_roundtrip_memory(self, docs):
        arena = TokenArena.from_docs(docs)
        assert len(arena.lengths) == 50
        for i in (0, 7, 49):
            np.testing.assert_array_equal(arena.doc(i), docs[i])

    def test_save_load(self, docs, tmp_path):
        arena = TokenArena.from_docs(docs)
        arena.save(tmp_path / "cache.svtc")
        loaded = TokenArena.load(tmp_path / "cache.svtc")
        np.testing.assert_array_equal(loaded.tokens, arena.tokens)
        np.testing.assert_array_equal(loaded.offsets, arena.offsets)


class TestPackBatch:
    def test_native_is_loaded(self):
        # The library is built by `make -C native` in CI/setup; this test
        # suite requires it so the native path is actually exercised.
        assert native.native_available()

    def test_matches_numpy_fallback(self, docs, monkeypatch):
        arena = TokenArena.from_docs(docs)
        idx = [3, 10, 4]
        out_c, ntok_c = pack_batch(arena, idx, rows=4, bucket_len=256)

        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_LIB_CHECKED", True)
        out_np, ntok_np = pack_batch(arena, idx, rows=4, bucket_len=256)
        np.testing.assert_array_equal(out_c, out_np)
        np.testing.assert_array_equal(ntok_c, ntok_np)

    def test_truncation_and_padding(self, docs):
        arena = TokenArena.from_docs(docs)
        out, ntok = pack_batch(arena, [0], rows=2, bucket_len=8)
        assert ntok[0] == min(len(docs[0]), 8)
        assert ntok[1] == 0
        assert (out[1] == 0).all()

    def test_bucket_lengths(self):
        out = bucket_lengths(np.array([1, 512, 513]), 512)
        np.testing.assert_array_equal(out, [512, 512, 1024])


class TestEpochUsesNative(object):
    def test_epoch_batches_equal_with_and_without_arena(self, docs,
                                                        monkeypatch):
        from sparse_vae_tpu.data.batching import iterate_epoch
        from sparse_vae_tpu.data.datasets import TokenizedCorpus
        corpus = TokenizedCorpus(docs=list(docs),
                                 num_bytes=np.arange(len(docs)))
        a = list(iterate_epoch(corpus, 2048, 128,
                               np.random.default_rng(5)))
        # Force the pure-numpy collate path (no arena attribute at all)
        corpus2 = TokenizedCorpus(docs=list(docs),
                                  num_bytes=np.arange(len(docs)))
        monkeypatch.delattr(TokenizedCorpus, "ensure_arena")
        b = list(iterate_epoch(corpus2, 2048, 128,
                               np.random.default_rng(5)))
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x.token_ids, y.token_ids)
            np.testing.assert_array_equal(x.num_tokens, y.num_tokens)

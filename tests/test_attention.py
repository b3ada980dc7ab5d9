"""Tests for rotary, dense attention, the sliding-window mask semantics, the
blocked-XLA sparse attention vs the dense-masked oracle, and KV-cache decode
equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.ops.attention import (Attention, dense_attention,
                                          sliding_window_block_mask,
                                          sliding_window_token_mask,
                                          split_heads)
from sparse_vae_tpu.ops.rotary import apply_rotary
from sparse_vae_tpu.ops.sliding_window_attention import (
    sliding_window_attention_xla)


class TestRotary:
    def test_preserves_norm(self, rng):
        x = jax.random.normal(rng, (2, 8, 16))
        y = apply_rotary(x)
        np.testing.assert_allclose(jnp.linalg.norm(x, axis=-1),
                                   jnp.linalg.norm(y, axis=-1), rtol=1e-5)

    def test_relative_property(self, rng):
        """<rot(q, i), rot(k, j)> depends only on i - j."""
        q = jax.random.normal(rng, (1, 1, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 16))

        def score(qi, kj):
            rq = apply_rotary(q, offset=qi)
            rk = apply_rotary(k, offset=kj)
            return float(jnp.sum(rq * rk))

        assert score(5, 3) == pytest.approx(score(7, 5), rel=1e-4)
        assert score(5, 3) != pytest.approx(score(5, 4), rel=1e-3)

    def test_offset_matches_shifted_sequence(self, rng):
        x = jax.random.normal(rng, (1, 10, 16))
        full = apply_rotary(x)
        tail = apply_rotary(x[:, 6:], offset=6)
        np.testing.assert_allclose(full[:, 6:], tail, rtol=1e-5, atol=1e-6)


class TestSlidingWindowMask:
    def test_causal_band(self):
        m = np.asarray(sliding_window_block_mask(6, 6, 32, window_size=2,
                                                 causal=True,
                                                 include_cls=False))
        for qb in range(6):
            for kb in range(6):
                assert m[qb, kb] == (0 <= qb - kb < 2)

    def test_cls_column(self):
        m = np.asarray(sliding_window_block_mask(6, 6, 32, 2, True, True))
        assert m[:, 0].all()

    def test_bidirectional_split(self):
        # window 4 -> left 2 (incl diagonal), right 2: deltas -2..1
        m = np.asarray(sliding_window_block_mask(8, 8, 32, 4, causal=False,
                                                 include_cls=False))
        for qb in range(8):
            for kb in range(8):
                assert m[qb, kb] == (-2 <= qb - kb <= 1), (qb, kb)

    def test_token_mask_causal_within_diag(self):
        m = np.asarray(sliding_window_token_mask(8, 8, 4, 1, causal=True,
                                                 include_cls=False))
        assert not m[0, 1]  # above diagonal masked inside the block
        assert m[1, 0] and m[3, 0]
        assert not m[4, 0]  # outside window (block 1 q, block 0 k, w=1)


def _oracle(q, k, v, kv_mask, window, block, causal, cls):
    L = q.shape[2]
    mask = sliding_window_token_mask(L, L, block, window, causal, cls)
    mask = mask[None, None]
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, None, :]
    return dense_attention(q, k, v, mask)


class TestSparseAttentionXLA:
    @pytest.mark.parametrize("causal", [True, False])
    @pytest.mark.parametrize("window", [1, 2, 3])
    def test_matches_dense_oracle(self, rng, causal, window):
        b, h, L, d, block = 2, 2, 256, 16, 32
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, h, L, d))
        k = jax.random.normal(ks[1], (b, h, L, d))
        v = jax.random.normal(ks[2], (b, h, L, d))
        out = sliding_window_attention_xla(
            q, k, v, window_size=window, block_size=block, causal=causal)
        ref = _oracle(q, k, v, None, window, block, causal, True)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_padding_mask(self, rng):
        b, h, L, d, block = 2, 2, 128, 16, 32
        ks = jax.random.split(rng, 3)
        q, k, v = (jax.random.normal(kk, (b, h, L, d)) for kk in ks)
        kv_mask = jnp.arange(L)[None, :] < jnp.array([[100], [64]])
        out = sliding_window_attention_xla(
            q, k, v, kv_mask, window_size=2, block_size=block)
        ref = _oracle(q, k, v, kv_mask, 2, block, True, True)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_gradients_match_oracle(self, rng):
        b, h, L, d, block = 1, 1, 128, 8, 32
        ks = jax.random.split(rng, 3)
        q, k, v = (jax.random.normal(kk, (b, h, L, d)) for kk in ks)

        def f_sparse(q, k, v):
            return jnp.sum(sliding_window_attention_xla(
                q, k, v, window_size=2, block_size=block) ** 2)

        def f_dense(q, k, v):
            return jnp.sum(_oracle(q, k, v, None, 2, block, True, True) ** 2)

        gs = jax.grad(f_sparse, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gs, gd):
            np.testing.assert_allclose(a, b_, rtol=5e-4, atol=5e-5)


class TestAttentionModule:
    def test_learned_queries_shape(self, rng):
        attn = Attention(d_model=32, num_heads=4, learned_queries=8)
        x = jax.random.normal(rng, (2, 20, 32))
        params = attn.init(rng, x, x)
        out = attn.apply(params, x, x)
        assert out.shape == (2, 8, 32)

    def test_dense_decode_matches_full(self, rng):
        """Token-by-token KV-cache decoding must reproduce the full-sequence
        causal forward (the reference's cache protocol contract)."""
        attn = Attention(d_model=32, num_heads=4, causal=True)
        L = 10
        x = jax.random.normal(rng, (2, L, 32))
        params = attn.init(rng, x, x)
        full = attn.apply(params, x, x)

        cache = attn.apply(params, 2, L, method=Attention.init_cache)
        outs = []
        for i in range(L):
            out, cache = attn.apply(params, x[:, i:i + 1], cache, i,
                                    method=Attention.decode)
            outs.append(out)
        np.testing.assert_allclose(jnp.concatenate(outs, 1), full,
                                   rtol=2e-4, atol=1e-5)

    def test_sparse_decode_matches_full(self, rng):
        attn = Attention(d_model=32, num_heads=4, causal=True, sparse=True,
                         window_size=2, block_size=4, use_pallas_kernel=False)
        L = 16
        x = jax.random.normal(rng, (1, L, 32))
        params = attn.init(rng, x, x)
        full = attn.apply(params, x, x)

        cache = attn.apply(params, 1, L, method=Attention.init_cache)
        outs = []
        for i in range(L):
            out, cache = attn.apply(params, x[:, i:i + 1], cache, i,
                                    method=Attention.decode)
            outs.append(out)
        np.testing.assert_allclose(jnp.concatenate(outs, 1), full,
                                   rtol=2e-4, atol=1e-5)

    def test_sparse_ring_cache_many_wraps(self, rng):
        """The block-ring cache (O(window) memory regardless of document
        length, ref attention.py:113-134's eviction) must match the full
        forward across many ring wraps and an odd window size."""
        attn = Attention(d_model=32, num_heads=4, causal=True, sparse=True,
                         window_size=3, block_size=4, use_pallas_kernel=False)
        L = 57  # 14+ blocks, several wraps, non-multiple-of-block tail
        x = jax.random.normal(rng, (2, L, 32))
        params = attn.init(rng, x, x)
        full = attn.apply(params, x, x)

        cache = attn.apply(params, 2, L, method=Attention.init_cache)
        # O(window): cache size is independent of max_length
        assert cache["k_ring"].shape[2] == 3 * 4
        assert cache["k_cls"].shape[2] == 4
        outs = []
        for i in range(L):
            out, cache = attn.apply(params, x[:, i:i + 1], cache, i,
                                    method=Attention.decode)
            outs.append(out)
        np.testing.assert_allclose(jnp.concatenate(outs, 1), full,
                                   rtol=2e-4, atol=1e-5)


class TestFlashDensePath:
    def test_flash_matches_masked_dense_oracle(self, rng):
        """The in-tree Pallas flash attention (the TPU dense causal path in
        Attention.__call__) must equal the masked dense oracle, ragged
        padding included — run in interpret mode on CPU."""
        from jax.experimental.pallas import tpu as pltpu
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention)

        B, H, L, D = 2, 4, 512, 64
        ks = jax.random.split(rng, 3)
        q, k, v = (jax.random.normal(kk, (B, H, L, D)) for kk in ks)
        lengths = jnp.array([512, 200])
        seg = jnp.where(jnp.arange(L)[None, :] < lengths[:, None], 1, 0)

        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v,
                                  segment_ids=SegmentIds(q=seg, kv=seg),
                                  causal=True, sm_scale=D ** -0.5)

        mask = (jnp.arange(L)[None, :] <= jnp.arange(L)[:, None])[None, None]
        mask = mask & (jnp.arange(L)[None, :]
                       < lengths[:, None])[:, None, None, :]
        ref = dense_attention(q, k, v, mask)
        real = np.asarray(seg, bool)
        for b in range(B):
            np.testing.assert_allclose(np.asarray(out)[b, :, real[b]],
                                       np.asarray(ref)[b, :, real[b]],
                                       rtol=2e-4, atol=2e-5)


class TestRowCacheWrite:
    """ops.attention.row_cache_write: the one-hot select rewrite (TPU
    default) must equal the XLA scatter it replaced, including the CLS
    store's out-of-range drop semantics."""

    def test_select_equals_scatter_including_drop(self):
        from sparse_vae_tpu.ops import attention as A
        rng = jax.random.PRNGKey(3)
        B, H, L, D = 5, 3, 8, 4
        buf = jax.random.normal(rng, (B, H, L, D), jnp.float32)
        val = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, D))
        # mixed in-range per-row indices plus one out-of-range (drop) row
        idx = jnp.array([0, 7, 3, L, 5], jnp.int32)

        got = A.row_cache_write(buf, idx, val)
        rows = jnp.arange(B)
        want = buf.at[rows, :, idx].set(val, mode="drop")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
        # the dropped row is bitwise untouched
        np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(buf[3]))

    def test_bf16_cache_cast(self):
        from sparse_vae_tpu.ops import attention as A
        B, H, L, D = 2, 2, 4, 4
        buf = jnp.zeros((B, H, L, D), jnp.bfloat16)
        val = jnp.full((B, H, D), 1.0078125, jnp.float32)  # exact in bf16
        out = A.row_cache_write(buf, jnp.array([1, 2]), val)
        assert out.dtype == jnp.bfloat16
        assert float(out[0, 0, 1, 0]) == 1.0078125
        assert float(out[1, 0, 2, 0]) == 1.0078125
        assert float(out[0, 0, 2, 0]) == 0.0

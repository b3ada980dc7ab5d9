"""Pallas sliding-window attention kernel vs the blocked-XLA/dense oracles.

Runs in interpret mode on the CPU test backend (the standard way to unit-test
Mosaic kernels without hardware); bench.py exercises the compiled kernel on
the real chip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.ops.pallas_kernels import sliding_window_attention_pallas
from sparse_vae_tpu.ops.sliding_window_attention import (
    sliding_window_attention_xla)


def rand_qkv(rng, b=2, h=2, L=256, d=64):
    ks = jax.random.split(rng, 3)
    return tuple(jax.random.normal(kk, (b, h, L, d)) for kk in ks)


class TestPallasForward:
    @pytest.mark.parametrize("window", [1, 2, 3])
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_xla(self, rng, window, causal):
        q, k, v = rand_qkv(rng, L=256, d=64)
        out = sliding_window_attention_pallas(
            q, k, v, None, window, 64, causal, True, True)
        ref = sliding_window_attention_xla(
            q, k, v, None, window_size=window, block_size=64, causal=causal,
            include_cls=True)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_no_cls(self, rng):
        q, k, v = rand_qkv(rng, L=128, d=32)
        out = sliding_window_attention_pallas(
            q, k, v, None, 2, 32, True, False, True)
        ref = sliding_window_attention_xla(
            q, k, v, None, window_size=2, block_size=32, causal=True,
            include_cls=False)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_padding_mask(self, rng):
        q, k, v = rand_qkv(rng, b=2, L=128, d=32)
        kv_mask = jnp.arange(128)[None, :] < jnp.array([[100], [40]])
        out = sliding_window_attention_pallas(
            q, k, v, kv_mask, 2, 32, True, True, True)
        ref = sliding_window_attention_xla(
            q, k, v, kv_mask, window_size=2, block_size=32, causal=True,
            include_cls=True)
        real = np.asarray(kv_mask)
        # Compare only real query rows (pad rows are garbage by contract)
        for bi in range(2):
            np.testing.assert_allclose(
                np.asarray(out)[bi, :, real[bi]],
                np.asarray(ref)[bi, :, real[bi]], rtol=2e-4, atol=2e-5)

    def test_bf16_inputs(self, rng):
        q, k, v = (t.astype(jnp.bfloat16) for t in rand_qkv(rng, L=128, d=64))
        out = sliding_window_attention_pallas(
            q, k, v, None, 2, 64, True, True, True)
        ref = sliding_window_attention_xla(
            q, k, v, None, window_size=2, block_size=64)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(out.astype(jnp.float32),
                                   ref.astype(jnp.float32), rtol=2e-2,
                                   atol=2e-2)

    def test_long_sequence_window_locality(self, rng):
        """Tokens beyond the window + CLS must have zero influence."""
        q, k, v = rand_qkv(rng, b=1, h=1, L=256, d=32)
        out1 = sliding_window_attention_pallas(
            q, k, v, None, 1, 32, True, True, True)
        # Perturb k/v in a block far outside the last query block's window
        k2 = k.at[:, :, 64:96].set(jax.random.normal(rng, (1, 1, 32, 32)))
        v2 = v.at[:, :, 64:96].set(jax.random.normal(rng, (1, 1, 32, 32)))
        out2 = sliding_window_attention_pallas(
            q, k2, v2, None, 1, 32, True, True, True)
        # Last block (224..256) attends only to itself + block 0
        np.testing.assert_allclose(out1[:, :, 224:], out2[:, :, 224:],
                                   rtol=1e-5, atol=1e-6)
        # But the perturbed region itself changed
        assert not np.allclose(out1[:, :, 64:96], out2[:, :, 64:96])


class TestPallasBackward:
    def test_grads_match_xla(self, rng):
        q, k, v = rand_qkv(rng, b=1, h=1, L=128, d=32)

        def f_pallas(q, k, v):
            return jnp.sum(sliding_window_attention_pallas(
                q, k, v, None, 2, 32, True, True, True) ** 2)

        def f_xla(q, k, v):
            return jnp.sum(sliding_window_attention_xla(
                q, k, v, None, window_size=2, block_size=32) ** 2)

        gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)

    @pytest.mark.parametrize("window", [1, 2, 3])
    @pytest.mark.parametrize("causal", [True, False])
    def test_grads_match_xla_windows(self, rng, window, causal):
        q, k, v = rand_qkv(rng, b=1, h=2, L=192, d=32)

        def f_pallas(q, k, v):
            return jnp.sum(jnp.sin(sliding_window_attention_pallas(
                q, k, v, None, window, 32, causal, True, True)))

        def f_xla(q, k, v):
            return jnp.sum(jnp.sin(sliding_window_attention_xla(
                q, k, v, None, window_size=window, block_size=32,
                causal=causal)))

        gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)

    def test_grads_no_cls(self, rng):
        q, k, v = rand_qkv(rng, b=1, h=1, L=128, d=32)

        def f(impl):
            def g(q, k, v):
                return jnp.sum(impl(q, k, v) ** 2)
            return jax.grad(g, argnums=(0, 1, 2))(q, k, v)

        gp = f(lambda q, k, v: sliding_window_attention_pallas(
            q, k, v, None, 2, 32, True, False, True))
        gx = f(lambda q, k, v: sliding_window_attention_xla(
            q, k, v, None, window_size=2, block_size=32, causal=True,
            include_cls=False))
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)

    def test_grads_with_padding(self, rng):
        q, k, v = rand_qkv(rng, b=2, h=1, L=128, d=32)
        kv_mask = jnp.arange(128)[None, :] < jnp.array([[100], [40]])
        # Zero query-grad contributions from pad rows, as the model does
        # (loss masks pad positions => their upstream cotangent is 0).
        row_mask = kv_mask[:, None, :, None]

        def f(impl):
            def g(q, k, v):
                out = impl(q, k, v) * row_mask
                return jnp.sum(out ** 2)
            return jax.grad(g, argnums=(0, 1, 2))(q, k, v)

        gp = f(lambda q, k, v: sliding_window_attention_pallas(
            q, k, v, kv_mask, 2, 32, True, True, True))
        gx = f(lambda q, k, v: sliding_window_attention_xla(
            q, k, v, kv_mask, window_size=2, block_size=32))
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)

    def test_grads_bf16(self, rng):
        q, k, v = (t.astype(jnp.bfloat16)
                   for t in rand_qkv(rng, b=1, h=2, L=128, d=64))

        def f(impl):
            def g(q, k, v):
                return jnp.sum(impl(q, k, v).astype(jnp.float32) ** 2)
            return jax.grad(g, argnums=(0, 1, 2))(q, k, v)

        gp = f(lambda q, k, v: sliding_window_attention_pallas(
            q, k, v, None, 2, 64, True, True, True))
        gx = f(lambda q, k, v: sliding_window_attention_xla(
            q, k, v, None, window_size=2, block_size=64))
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(a.astype(jnp.float32),
                                       b.astype(jnp.float32),
                                       rtol=5e-2, atol=5e-2)

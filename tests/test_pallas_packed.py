"""Packed-layout (Dh % 128 == 0) Pallas attention vs the head-major oracle.

The packed kernels (ops/pallas_kernels.py packed section) take [B, L, H*Dh]
projections directly and slice heads along lanes in-kernel, eliminating the
head-major transpose copies at the custom-call boundary. Interpret mode on
the CPU test backend; semantics (values AND gradients) must match the
blocked-XLA oracle on split heads exactly up to float tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.ops.pallas_kernels import (
    sliding_window_attention_pallas_packed)
from sparse_vae_tpu.ops.sliding_window_attention import (
    sliding_window_attention_xla)

H, D = 2, 128  # packed path requires Dh % 128 == 0


def rand_packed(rng, b=2, L=256):
    ks = jax.random.split(rng, 3)
    return tuple(jax.random.normal(kk, (b, L, H * D)) for kk in ks)


def to_heads(x):
    b, L, hd = x.shape
    return x.reshape(b, L, H, D).transpose(0, 2, 1, 3)


def oracle(qp, kp, vp, kv_mask, window, block, causal, include_cls=True):
    ref = sliding_window_attention_xla(
        to_heads(qp), to_heads(kp), to_heads(vp), kv_mask,
        window_size=window, block_size=block, causal=causal,
        include_cls=include_cls)
    b, h, L, d = ref.shape
    return ref.transpose(0, 2, 1, 3).reshape(b, L, h * d)


class TestPackedForward:
    @pytest.mark.parametrize("window", [1, 2])
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_oracle(self, rng, window, causal):
        qp, kp, vp = rand_packed(rng)
        out = sliding_window_attention_pallas_packed(
            qp, kp, vp, None, H, window, 128, causal, True, True)
        ref = oracle(qp, kp, vp, None, window, 128, causal)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_no_cls(self, rng):
        qp, kp, vp = rand_packed(rng)
        out = sliding_window_attention_pallas_packed(
            qp, kp, vp, None, H, 2, 128, True, False, True)
        ref = oracle(qp, kp, vp, None, 2, 128, True, include_cls=False)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_padding_mask(self, rng):
        qp, kp, vp = rand_packed(rng)
        kv_mask = jnp.arange(256)[None, :] < jnp.array([[200], [70]])
        out = sliding_window_attention_pallas_packed(
            qp, kp, vp, kv_mask, H, 2, 128, True, True, True)
        ref = oracle(qp, kp, vp, kv_mask, 2, 128, True)
        real = np.asarray(kv_mask)
        for bi in range(2):  # pad query rows are garbage by contract
            np.testing.assert_allclose(
                np.asarray(out)[bi][real[bi]],
                np.asarray(ref)[bi][real[bi]], rtol=2e-4, atol=2e-5)

    def test_bf16(self, rng):
        qp, kp, vp = (t.astype(jnp.bfloat16) for t in rand_packed(rng))
        out = sliding_window_attention_pallas_packed(
            qp, kp, vp, None, H, 2, 128, True, True, True)
        assert out.dtype == jnp.bfloat16
        ref = oracle(qp, kp, vp, None, 2, 128, True)
        np.testing.assert_allclose(out.astype(jnp.float32),
                                   ref.astype(jnp.float32),
                                   rtol=2e-2, atol=2e-2)


class TestPackedBackward:
    @pytest.mark.parametrize("causal", [True, False])
    def test_grads_match_oracle(self, rng, causal):
        qp, kp, vp = rand_packed(rng)
        w = jax.random.normal(jax.random.fold_in(rng, 9), qp.shape)
        kv_mask = jnp.arange(256)[None, :] < jnp.array([[256], [180]])
        # Pad-row output gradients are masked: pad query rows are garbage
        # by contract in both implementations.
        w = w * kv_mask[..., None]

        def loss_packed(q, k, v):
            out = sliding_window_attention_pallas_packed(
                q, k, v, kv_mask, H, 2, 128, causal, True, True)
            return jnp.sum(out * w)

        def loss_oracle(q, k, v):
            return jnp.sum(oracle(q, k, v, kv_mask, 2, 128, causal) * w)

        gp = jax.grad(loss_packed, argnums=(0, 1, 2))(qp, kp, vp)
        go = jax.grad(loss_oracle, argnums=(0, 1, 2))(qp, kp, vp)
        for a, b, name in zip(gp, go, "qkv"):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5,
                                       err_msg=f"d{name}")

    def test_grads_window1_no_cls_kernel(self, rng):
        """window=1 causal: left == 1 < nq so the CLS backward kernel runs
        over every block beyond block 0 — the sequential-accumulator path."""
        qp, kp, vp = rand_packed(rng)
        w = jax.random.normal(jax.random.fold_in(rng, 3), qp.shape)

        def loss_packed(q, k, v):
            out = sliding_window_attention_pallas_packed(
                q, k, v, None, H, 1, 128, True, True, True)
            return jnp.sum(out * w)

        def loss_oracle(q, k, v):
            return jnp.sum(oracle(q, k, v, None, 1, 128, True) * w)

        gp = jax.grad(loss_packed, argnums=(0, 1, 2))(qp, kp, vp)
        go = jax.grad(loss_oracle, argnums=(0, 1, 2))(qp, kp, vp)
        for a, b, name in zip(gp, go, "qkv"):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5,
                                       err_msg=f"d{name}")


class TestModulePackedDispatch:
    def _model(self, use_pallas):
        from sparse_vae_tpu.ops.attention import Attention
        return Attention(d_model=256, num_heads=2, causal=True, sparse=True,
                         window_size=2, block_size=128,
                         use_pallas_kernel=use_pallas)

    def test_attention_module_packed_vs_oracle(self, rng, monkeypatch):
        """Full module forward + param grads: packed dispatch (interpret)
        vs the use_pallas_kernel=False oracle path."""
        from sparse_vae_tpu.ops import attention as attention_mod
        monkeypatch.setattr(attention_mod, "_PACKED_KERNEL_INTERPRET", True)

        x = jax.random.normal(rng, (2, 256, 256))
        kv_mask = jnp.arange(256)[None, :] < jnp.array([[256], [130]])
        packed = self._model(True)
        params = packed.init(jax.random.PRNGKey(0), x, x, kv_mask)["params"]
        oracle_m = self._model(False)

        w = jax.random.normal(jax.random.fold_in(rng, 7), x.shape)
        w = w * kv_mask[..., None]

        def loss(m, p):
            out = m.apply({"params": p}, x, x, kv_mask)
            return jnp.sum(out * w)

        lp, gp = jax.value_and_grad(lambda p: loss(packed, p))(params)
        lo, go = jax.value_and_grad(lambda p: loss(oracle_m, p))(params)
        np.testing.assert_allclose(lp, lo, rtol=1e-4)
        flat_p = jax.tree_util.tree_leaves_with_path(gp)
        flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
        for path, leaf in flat_p:
            np.testing.assert_allclose(
                leaf, flat_o[path], rtol=5e-4, atol=5e-5,
                err_msg=jax.tree_util.keystr(path))

    def test_gate_excludes_dh64(self):
        """d_head=64 must keep the head-major path (lane slices half-fill
        registers there — measured loser, BASELINE.md)."""
        from sparse_vae_tpu.ops.attention import Attention
        m = Attention(d_model=512, num_heads=8, causal=True, sparse=True,
                      window_size=2, block_size=128, use_pallas_kernel=True)
        bound = m.bind({"params": {}})
        assert not bound._packed_ok(256, 256)

    def test_env_escape_hatch(self, monkeypatch):
        from sparse_vae_tpu.ops import attention as attention_mod
        from sparse_vae_tpu.ops.attention import Attention
        monkeypatch.setattr(attention_mod, "_PACKED_KERNEL_INTERPRET", True)
        m = Attention(d_model=256, num_heads=2, causal=True, sparse=True,
                      window_size=2, block_size=128, use_pallas_kernel=True)
        bound = m.bind({"params": {}})
        assert bound._packed_ok(256, 256)
        monkeypatch.setenv("SVT_PACKED_ATTN", "0")
        assert not bound._packed_ok(256, 256)

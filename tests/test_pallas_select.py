"""Fused decode-selection kernel (ops/pallas_select.py): equivalence with
the jnp selection stack, and Jacobi/frontier decoding under fused selection
(interpret mode on the CPU test backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.models.generation import SamplingParams, top_p_filter
from sparse_vae_tpu.models.parallel_decode import (_chunk_membership,
                                                   _chunk_repetition_penalty)
from sparse_vae_tpu.ops.pallas_select import nucleus_gumbel_argmax
from sparse_vae_tpu.models.transformer_lm import (TransformerHparams,
                                                  TransformerLanguageModel)

SAMPLED = SamplingParams(temperature=1.0, top_p=0.9, repetition_penalty=1.2)


def _penalize(s, member, penalty):
    return jnp.where(member, jnp.where(s < 0.0, s * penalty, s / penalty),
                     s)


def _jnp_reference(s, noise, member, sampling: SamplingParams):
    """The existing jnp selection stack (_filter_logits semantics), applied
    to explicit [N, V] inputs."""
    if member is not None and sampling.repetition_penalty > 1.0:
        s = _penalize(s, member, sampling.repetition_penalty)
    if sampling.temperature > 0.0:
        s = s / sampling.temperature
    if 0.0 < sampling.top_p < 1.0:
        s = top_p_filter(s, sampling.top_p)
    if noise is not None:
        s = jnp.where(jnp.isfinite(s), s + noise, s)
    return jnp.argmax(s, axis=-1).astype(jnp.int32)


class TestKernel:
    def _inputs(self, n=37, v=256, seed=0, noise=True):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        s = jax.random.normal(k1, (n, v), jnp.float32) * 3.0
        g = jax.random.gumbel(k2, (n, v), jnp.float32) if noise else None
        m = jax.random.uniform(k3, (n, v)) < 0.05
        return s, g, m

    @pytest.mark.parametrize("noise", [True, False])
    def test_kernel_matches_shared_tile_math(self, noise):
        """Pallas (interpret) == the same _select_tile math run as plain
        jnp — the kernel wrapper adds only tiling/padding."""
        s, g, _ = self._inputs(noise=noise)
        kw = dict(top_p=0.9, temperature=1.0, interpret=True)
        got = nucleus_gumbel_argmax(s, g, **kw)
        ref = nucleus_gumbel_argmax(s, g, use_pallas=False, **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_matches_jnp_selection_stack(self):
        """Same nucleus bisection (24 iters) as top_p_filter, with the
        repetition penalty pre-applied (as the fused integration does):
        choices agree with the production jnp path on >=99% of rows
        (disagreements can only come from fp reduction-order at the
        kept-set boundary)."""
        s, g, m = self._inputs(n=256, v=512, seed=1)
        s_pen = _penalize(s, m, SAMPLED.repetition_penalty)
        got = nucleus_gumbel_argmax(
            s_pen, g, top_p=0.9, temperature=1.0, interpret=True)
        ref = _jnp_reference(s, g, m, SAMPLED)
        agree = float(np.mean(np.asarray(got) == np.asarray(ref)))
        assert agree >= 0.99, agree

    def test_no_filter_is_plain_gumbel_max(self):
        """top_p=1: exactly argmax(s + noise)."""
        s, g, _ = self._inputs()
        got = nucleus_gumbel_argmax(s, g, top_p=1.0, temperature=1.0,
                                    interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(jnp.argmax(s + g, axis=-1)))

    def test_tiny_nucleus_is_argmax(self):
        """top_p below the max probability keeps only the argmax token, so
        the choice ignores the noise."""
        s, g, _ = self._inputs()
        got = nucleus_gumbel_argmax(s, g * 100.0, top_p=1e-6,
                                    temperature=1.0, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(jnp.argmax(s, axis=-1)))

    def test_pre_penalized_logits_demote_members(self):
        """The integration pre-applies the repetition penalty to the
        logits; a strong penalty on the argmax token flips the
        deterministic choice to the runner-up."""
        s = jnp.asarray([[4.0, 3.0, 0.0, -1.0]])
        member = jnp.asarray([[True, False, False, False]])
        got = nucleus_gumbel_argmax(_penalize(s, member, 10.0),
                                    top_p=1.0, temperature=1.0,
                                    interpret=True)
        assert int(got[0]) == 1

    def test_row_padding_is_discarded(self):
        """N not a multiple of the row tile: padded rows never leak."""
        s, g, _ = self._inputs(n=19, v=128, seed=3)
        got = nucleus_gumbel_argmax(s, g, top_p=0.9, temperature=1.0,
                                    interpret=True)
        assert got.shape == (19,)
        ref = nucleus_gumbel_argmax(s, g, top_p=0.9, temperature=1.0,
                                    use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_membership_helper_consistency(self):
        """_chunk_membership is the exact mask _chunk_repetition_penalty
        applies (the fused path pre-penalizes with it)."""
        rng = np.random.default_rng(2)
        B, C, V, L, W = 2, 4, 64, 12, 6
        logits = jnp.asarray(rng.normal(size=(B, C, V)).astype(np.float32))
        tokens = jnp.asarray(rng.integers(0, V, size=(B, L)))
        member = _chunk_membership(tokens, 3, C, W, V)
        via_mask = _penalize(logits, member, 1.2)
        direct = _chunk_repetition_penalty(logits, tokens, 3, 1.2, W)
        np.testing.assert_allclose(np.asarray(via_mask), np.asarray(direct),
                                   rtol=1e-6)


def sparse_lm_hparams(**kw):
    defaults = dict(d_model=32, num_heads=4, num_layers=2, vocab_size=128,
                    sparse_self_attention=True, attn_window_size=2,
                    attn_block_size=32, use_pallas_kernel=False)
    defaults.update(kw)
    return TransformerHparams(**defaults)


@pytest.fixture(scope="module")
def sparse_lm():
    hp = sparse_lm_hparams()
    model = TransformerLanguageModel(hp)
    rng = jax.random.PRNGKey(3)
    params = model.init(rng, jnp.ones((1, 64), jnp.int32))["params"]
    return model, params


class TestFusedDecode:
    """End-to-end parallel decoding with fused selection. Both decoders use
    the SAME selector, so the cross-decoder equalities of
    test_parallel_decode must continue to hold verbatim."""

    def test_frontier_fused_matches_full_jacobi_fused(self, sparse_lm):
        model, params = sparse_lm
        L, B = 128, 2
        rng = jax.random.PRNGKey(9)
        full, _ = model.apply(
            {"params": params}, rng, L, B, SAMPLED, chunk_size=32,
            fused_select=True, interpret=True,
            method=model.parallel_generate)
        fr, _ = model.apply(
            {"params": params}, rng, L, B, SAMPLED, window_tokens=64,
            fused_select=True, interpret=True,
            method=model.frontier_generate)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(fr))

    def test_fused_sampled_output_is_fixed_point(self, sparse_lm):
        from sparse_vae_tpu.models.parallel_decode import jacobi_decode
        model, params = sparse_lm
        L, B = 64, 2
        rng = jax.random.PRNGKey(1)
        out, _ = model.apply(
            {"params": params}, rng, L, B, SAMPLED, chunk_size=32,
            fused_select=True, interpret=True,
            method=model.parallel_generate)
        full = jnp.concatenate(
            [jnp.ones((B, 1), jnp.int32), jnp.asarray(out)], axis=-1)

        def hidden_fn(tokens):
            return model.apply({"params": params}, tokens,
                               method=model.forward_hidden)

        def project_fn(h):
            return model.apply({"params": params}, h, method=model.project)

        again, iters2 = jacobi_decode(
            hidden_fn, project_fn, B, L, rng, SAMPLED,
            max_iters=3, chunk_size=32, init_tokens=full,
            fused_select=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(again), np.asarray(full))
        assert int(iters2) == 1

    def test_greedy_ignores_fused_flag(self, sparse_lm):
        """Greedy falls back to the plain argmax path: fused_select=True
        must not change the output."""
        model, params = sparse_lm
        greedy = SamplingParams(temperature=0.0, top_p=1.0,
                                repetition_penalty=1.0)
        L = 64
        a, _ = model.apply(
            {"params": params}, jax.random.PRNGKey(0), L, 1, greedy,
            window_tokens=32, method=model.frontier_generate)
        b, _ = model.apply(
            {"params": params}, jax.random.PRNGKey(0), L, 1, greedy,
            window_tokens=32, fused_select=True, interpret=True,
            method=model.frontier_generate)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

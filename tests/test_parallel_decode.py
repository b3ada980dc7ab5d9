"""Jacobi parallel decoding: AR equivalence, fixed-point property, EOS
masking, and the VAE entry point."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.models.generation import SamplingParams
from sparse_vae_tpu.models.parallel_decode import (_chunk_repetition_penalty,
                                                   _mask_after_end,
                                                   _window_membership,
                                                   jacobi_decode)
from sparse_vae_tpu.models.transformer_lm import (TransformerHparams,
                                                  TransformerLanguageModel)
from sparse_vae_tpu.models.transformer_vae import (TransformerVAE,
                                                   TransformerVAEHparams)

GREEDY = SamplingParams(temperature=0.0, top_p=1.0, repetition_penalty=1.0)


def lm_hparams(**kw):
    defaults = dict(d_model=32, num_heads=4, num_layers=2, vocab_size=128,
                    sparse_self_attention=False, use_pallas_kernel=False)
    defaults.update(kw)
    return TransformerHparams(**defaults)


@pytest.fixture(scope="module")
def lm():
    hp = lm_hparams()
    model = TransformerLanguageModel(hp)
    rng = jax.random.PRNGKey(3)
    params = model.init(rng, jnp.ones((1, 16), jnp.int32))["params"]
    return model, params


class TestRepetitionPenalty:
    def test_membership_matches_naive(self):
        rng = np.random.default_rng(0)
        prev = jnp.asarray(rng.integers(0, 64, size=(3, 5, 17)))
        member = np.asarray(_window_membership(prev, 64))
        for b in range(3):
            for c in range(5):
                expected = np.isin(np.arange(64), np.asarray(prev[b, c]))
                np.testing.assert_array_equal(member[b, c], expected)

    def test_chunk_penalty_matches_scatter_reference(self):
        """The scatter-free membership formulation must equal the reference
        gather-modify-scatter (put_along_axis) exactly — duplicates in the
        window included."""
        rng = np.random.default_rng(1)
        B, C, V, L, W = 2, 4, 96, 12, 6
        logits = jnp.asarray(rng.normal(size=(B, C, V)).astype(np.float32))
        tokens = jnp.asarray(rng.integers(0, V, size=(B, L)))
        chunk_start, penalty = 3, 1.2

        got = _chunk_repetition_penalty(logits, tokens, chunk_start,
                                        penalty, W)

        pos = chunk_start + np.arange(C)[:, None]
        src = pos - W + 1 + np.arange(W)[None, :]
        valid = src >= 0
        src = np.clip(src, 0, L - 1)
        prev = np.asarray(tokens)[:, src]
        prev = np.where(valid[None], prev, 0)
        expected = np.asarray(logits).copy()
        for b in range(B):
            for c in range(C):
                for t in prev[b, c]:
                    x = np.asarray(logits)[b, c, t]
                    expected[b, c, t] = x * penalty if x < 0 else x / penalty
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


class TestMaskAfterEnd:
    def test_pads_after_first_end(self):
        t = jnp.array([[1, 5, 2, 9, 2, 7]])
        out = _mask_after_end(t, end_token=2, start_token=1)
        np.testing.assert_array_equal(out[0], [1, 5, 2, 0, 0, 0])

    def test_no_end_is_identity(self):
        t = jnp.array([[1, 5, 9, 7]])
        out = _mask_after_end(t, end_token=2, start_token=1)
        np.testing.assert_array_equal(out, t)


class TestJacobiLM:
    def test_greedy_matches_ar_greedy(self, lm):
        """The core claim: the Jacobi fixed point IS the sequential greedy
        decode (prefix-stability of causal maps)."""
        model, params = lm
        L = 24
        ar = model.apply({"params": params}, jax.random.PRNGKey(0), L,
                         2, GREEDY, method=model.sample)        # [B, L-1]
        pj, iters = model.apply(
            {"params": params}, jax.random.PRNGKey(0), L, 2, GREEDY,
            chunk_size=8, method=model.parallel_generate)
        # Compare up to each row's end token (AR stops writing, Jacobi pads)
        for a_row, p_row in zip(np.asarray(ar), np.asarray(pj)):
            np.testing.assert_array_equal(a_row, p_row)
        assert int(iters) <= L

    def test_sampled_output_is_fixed_point(self, lm):
        """With Gumbel-max noise fixed per position, re-running one Jacobi
        step on the converged output must reproduce it exactly."""
        model, params = lm
        sampling = SamplingParams(temperature=1.0, top_p=0.9,
                                  repetition_penalty=1.2)
        L, B = 20, 2
        rng = jax.random.PRNGKey(1)
        out, iters = model.apply(
            {"params": params}, rng, L, B, sampling, chunk_size=8,
            method=model.parallel_generate)
        assert int(iters) < L  # converged before the worst case

        full = jnp.concatenate(
            [jnp.ones((B, 1), jnp.int32), jnp.asarray(out)], axis=-1)

        def hidden_fn(tokens):
            return model.apply({"params": params}, tokens,
                               method=model.forward_hidden)

        def project_fn(h):
            return model.apply({"params": params}, h, method=model.project)

        again, iters2 = jacobi_decode(
            hidden_fn, project_fn, B, L, rng, sampling,
            max_iters=3, chunk_size=8, init_tokens=full)
        np.testing.assert_array_equal(np.asarray(again), np.asarray(full))
        assert int(iters2) == 1  # converged immediately: it's a fixed point

    def test_converges_faster_than_ar(self, lm):
        """On any non-degenerate model, convergence takes < L iterations
        (each iteration finalizes at least one token, usually several)."""
        model, params = lm
        L = 32
        _, iters = model.apply(
            {"params": params}, jax.random.PRNGKey(5), L, 1, GREEDY,
            chunk_size=8, method=model.parallel_generate)
        assert int(iters) < L


class TestJacobiVAE:
    def test_parallel_generate_from_z(self):
        hp = TransformerVAEHparams(
            d_model=32, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=128, num_encoder_latents=4,
            sparse_self_attention=False, use_pallas_kernel=False)
        model = TransformerVAE(hp)
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng, "sample": rng},
                            jnp.ones((1, 16), jnp.int32))["params"]
        z = jax.random.normal(jax.random.PRNGKey(9), (2, 1, 8))

        ar = model.apply({"params": params}, jax.random.PRNGKey(0), 16, 2,
                         z, GREEDY, method=model.sample)
        pj, _ = model.apply(
            {"params": params}, jax.random.PRNGKey(0), 16, 2, z, GREEDY,
            chunk_size=8, method=model.parallel_generate)
        np.testing.assert_array_equal(np.asarray(ar), np.asarray(pj))


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


class TestFrontierJacobi:
    """Frontier-windowed Jacobi (parallel_decode.frontier_jacobi_decode):
    per-pass cost O(window) instead of O(L), exact AR equivalence."""

    def test_greedy_matches_ar_greedy(self, sparse_lm):
        model, params = sparse_lm
        L = 128
        ar = model.apply({"params": params}, jax.random.PRNGKey(0), L,
                         2, GREEDY, method=model.sample)
        fr, iters = model.apply(
            {"params": params}, jax.random.PRNGKey(0), L, 2, GREEDY,
            window_tokens=64, method=model.frontier_generate)
        for a_row, f_row in zip(np.asarray(ar), np.asarray(fr)):
            np.testing.assert_array_equal(a_row, f_row)

    def test_window_size_invariance_sampled(self, sparse_lm):
        """The converged output must not depend on the window size — the
        noise is keyed by absolute block, so any window partition reaches
        the same ancestral sample."""
        model, params = sparse_lm
        sampling = SamplingParams(temperature=1.0, top_p=0.9,
                                  repetition_penalty=1.2)
        L, B = 128, 2
        rng = jax.random.PRNGKey(5)
        outs = []
        for w in (32, 64, 128):
            out, _ = model.apply(
                {"params": params}, rng, L, B, sampling, window_tokens=w,
                method=model.frontier_generate)
            outs.append(np.asarray(out))
        np.testing.assert_array_equal(outs[0], outs[1])
        np.testing.assert_array_equal(outs[0], outs[2])

    def test_matches_full_jacobi_when_noise_grids_agree(self, sparse_lm):
        """With the full-document Jacobi run at chunk_size == block_size
        (same absolute noise grid), both decoders must reach the identical
        sampled fixed point."""
        model, params = sparse_lm
        sampling = SamplingParams(temperature=1.0, top_p=0.9,
                                  repetition_penalty=1.2)
        L, B = 128, 2
        rng = jax.random.PRNGKey(9)
        full, _ = model.apply(
            {"params": params}, rng, L, B, sampling, chunk_size=32,
            method=model.parallel_generate)
        fr, _ = model.apply(
            {"params": params}, rng, L, B, sampling, window_tokens=64,
            method=model.frontier_generate)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(fr))

    def test_vae_frontier_matches_vae_ar(self):
        hp = TransformerVAEHparams(
            d_model=32, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=128, num_encoder_latents=4,
            sparse_self_attention=True, attn_window_size=2,
            attn_block_size=32, use_pallas_kernel=False)
        model = TransformerVAE(hp)
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng, "sample": rng},
                            jnp.ones((1, 64), jnp.int32))["params"]
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 8))
        L = 96
        ar = model.apply({"params": params}, jax.random.PRNGKey(1), L, 2,
                         z, GREEDY, method=model.sample)
        fr, _ = model.apply({"params": params}, jax.random.PRNGKey(1), L, 2,
                            z, GREEDY, window_tokens=32,
                            method=model.frontier_generate)
        np.testing.assert_array_equal(np.asarray(ar), np.asarray(fr))

    def test_rejects_dense_config(self, lm):
        model, params = lm
        with pytest.raises(ValueError, match="sparse"):
            model.apply({"params": params}, jax.random.PRNGKey(0), 64, 1,
                        GREEDY, method=model.frontier_generate)

    def test_draft_preserves_greedy_ar_equivalence(self, sparse_lm):
        """Suffix-match drafting only changes window initializations; the
        fixed point must still be the exact greedy AR trajectory."""
        model, params = sparse_lm
        L = 128
        ar = model.apply({"params": params}, jax.random.PRNGKey(0), L,
                         2, GREEDY, method=model.sample)
        fr, _ = model.apply(
            {"params": params}, jax.random.PRNGKey(0), L, 2, GREEDY,
            window_tokens=64, draft_ngram=3,
            method=model.frontier_generate)
        for a_row, f_row in zip(np.asarray(ar), np.asarray(fr)):
            np.testing.assert_array_equal(a_row, f_row)

    def test_draft_preserves_sampled_fixed_point(self, sparse_lm):
        """Drafted and undrafted frontier decoding converge to the same
        ancestral sample (the noise grid pins the fixed point)."""
        model, params = sparse_lm
        sampling = SamplingParams(temperature=1.0, top_p=0.9,
                                  repetition_penalty=1.2)
        rng = jax.random.PRNGKey(11)
        base, _ = model.apply(
            {"params": params}, rng, 128, 2, sampling, window_tokens=64,
            method=model.frontier_generate)
        drafted, _ = model.apply(
            {"params": params}, rng, 128, 2, sampling, window_tokens=64,
            draft_ngram=4, method=model.frontier_generate)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(drafted))


class TestSuffixMatchDraft:
    """Unit mechanics of parallel_decode._suffix_match_draft."""

    def _draft(self, buffer, win_old, frontier, ngram):
        from sparse_vae_tpu.models.parallel_decode import _suffix_match_draft
        return np.asarray(_suffix_match_draft(
            jnp.asarray(buffer, jnp.int32), jnp.asarray(win_old, jnp.int32),
            jnp.asarray(frontier, jnp.int32), ngram))

    def test_periodic_continuation_is_drafted(self):
        # Settled text: period-4 cycle 5,6,7,8 occupying positions 0..11;
        # window starts at 8; the pass changed position 9 (old 0 -> new 6,
        # continuing the cycle). Draft should copy the cycle onward.
        period = [5, 6, 7, 8]
        buffer = np.zeros((1, 24), np.int32)
        buffer[0, :10] = (period * 3)[:10]           # ends ...5, 6 at pos 9
        win_old = buffer[0, 8:16].copy()
        win_old[1] = 0                               # pos 9 changed this pass
        out = self._draft(buffer, win_old[None], 8, 2)
        # cascade at window coord 1 (pos 9); latest earlier "5,6" ends at
        # pos 5; continuation 7,8,5,6,... fills coords 2..8 (pos 10..16).
        np.testing.assert_array_equal(out[0, 10:17], [7, 8, 5, 6, 7, 8, 5])
        # Frozen/settled region untouched.
        np.testing.assert_array_equal(out[0, :10], buffer[0, :10])

    def test_no_match_leaves_buffer_unchanged(self):
        buffer = np.arange(1, 25, dtype=np.int32)[None]  # all-distinct
        win_old = buffer[0, 8:16].copy()
        win_old[2] = 0                               # a change, no repeat
        out = self._draft(buffer, win_old[None], 8, 3)
        np.testing.assert_array_equal(out, buffer)

    def test_no_change_means_no_draft(self):
        buffer = np.zeros((1, 24), np.int32)
        buffer[0, :12] = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6, 7]
        win_old = buffer[0, 8:16].copy()             # identical: converged
        out = self._draft(buffer, win_old[None], 8, 2)
        np.testing.assert_array_equal(out, buffer)

    def test_draft_with_single_block_window(self, sparse_lm):
        """W == block_size: nblk=1, the draft covers coords 1..W only."""
        model, params = sparse_lm
        ar = model.apply({"params": params}, jax.random.PRNGKey(0), 96,
                         1, GREEDY, method=model.sample)
        fr, _ = model.apply(
            {"params": params}, jax.random.PRNGKey(0), 96, 1, GREEDY,
            window_tokens=32, draft_ngram=2,
            method=model.frontier_generate)
        np.testing.assert_array_equal(np.asarray(ar), np.asarray(fr))

    def test_rows_draft_independently(self):
        buffer = np.zeros((2, 24), np.int32)
        buffer[0, :10] = [5, 6, 7, 8, 5, 6, 7, 8, 5, 6]
        buffer[1, :24] = np.arange(1, 25)            # no repeats in row 1
        win_old = buffer[:, 8:16].copy()
        win_old[:, 1] = 99                           # both rows changed
        out = self._draft(buffer, win_old, 8, 2)
        np.testing.assert_array_equal(out[0, 10:13], [7, 8, 5])
        np.testing.assert_array_equal(out[1], buffer[1])


class TestFrontierSpeculative:
    """Frontier speculative SAMPLING (frontier_speculative_decode): the
    window is the draft, verified by the exact accept/residual-resample
    rule — output distribution == AR sampling distribution; greedy is the
    degenerate exact-trajectory case."""

    def test_verify_operator_is_unbiased(self):
        """Monte-Carlo identity check of _speculative_verify: for a fixed
        filtered target p and point-mass draft d, the combined operator's
        output law P(out = x) = p(d) 1[x=d] + (1-p(d)) residual(x) must
        equal p exactly — drafts inside and outside the support alike."""
        from sparse_vae_tpu.models.parallel_decode import _speculative_verify

        V, N = 16, 200_000
        base = np.array([2.0, 1.1, 0.3, -0.5, -1.2, 0.8, 1.9, -2.0,
                         0.0, 0.4, -0.9, 1.3, -np.inf, -np.inf, 0.6, -0.1],
                        np.float32)
        p = np.exp(base - np.logaddexp.reduce(base[np.isfinite(base)]))
        p[~np.isfinite(base)] = 0.0
        p = p / p.sum()
        for d in (0, 7, 12):   # high-mass, low-mass, outside the support
            rng = jax.random.PRNGKey(d)
            ck, nk = jax.random.split(rng)
            coins = jax.random.uniform(ck, (N,), jnp.float32,
                                       minval=1e-38, maxval=1.0)
            noise = jax.random.gumbel(nk, (N, V), jnp.float32)
            lf = jnp.broadcast_to(jnp.asarray(base), (N, V))
            draft = jnp.full((N,), d, jnp.int32)
            accept, resample = jax.jit(_speculative_verify)(
                lf, draft, coins, noise)
            out = np.where(np.asarray(accept), d, np.asarray(resample))
            emp = np.bincount(out, minlength=V) / N
            np.testing.assert_allclose(emp, p, atol=0.01,
                                       err_msg=f"draft={d}")

    def test_greedy_matches_ar_greedy(self, sparse_lm):
        """temperature=0: accept iff draft == argmax reproduces the exact
        greedy trajectory."""
        model, params = sparse_lm
        L = 128
        ar = model.apply({"params": params}, jax.random.PRNGKey(0), L,
                         2, GREEDY, method=model.sample)
        sp, iters = model.apply(
            {"params": params}, jax.random.PRNGKey(0), L, 2, GREEDY,
            window_tokens=64, method=model.speculative_generate)
        np.testing.assert_array_equal(np.asarray(ar), np.asarray(sp))

    def test_greedy_faster_than_one_token_per_pass(self, sparse_lm):
        """With suffix-match drafting the pass count must beat 1 token per
        pass on the repetitive greedy continuation (the regime the Jacobi
        draft already wins; speculative must keep that)."""
        model, params = sparse_lm
        L = 128
        _, iters = model.apply(
            {"params": params}, jax.random.PRNGKey(0), L, 1, GREEDY,
            window_tokens=64, method=model.speculative_generate)
        assert int(iters) < L - 1, int(iters)

    def test_vae_greedy_matches_vae_ar(self):
        hp = TransformerVAEHparams(
            d_model=32, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=128, num_encoder_latents=8,
            sparse_self_attention=True, attn_window_size=2,
            attn_block_size=32, use_pallas_kernel=False)
        model = TransformerVAE(hp)
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng, "sample": rng},
                            jnp.ones((1, 16), jnp.int32))["params"]
        z = jax.random.normal(jax.random.PRNGKey(9), (2, 1, 8))
        ar = model.apply({"params": params}, jax.random.PRNGKey(0), 96, 2,
                         z, GREEDY, method=model.sample)
        sp, _ = model.apply(
            {"params": params}, jax.random.PRNGKey(0), 96, 2, z, GREEDY,
            window_tokens=32, method=model.speculative_generate)
        np.testing.assert_array_equal(np.asarray(ar), np.asarray(sp))

    def test_sampled_marginals_match_analytic(self, sparse_lm):
        """Distributional exactness, end to end: the empirical marginals of
        the first two generated tokens over a large iid batch must match
        the ANALYTIC marginals of the modified (temperature + top-p)
        ancestral distribution — the law the AR sampler draws from."""
        model, params = sparse_lm
        V = model.hparams.vocab_size
        sampling = SamplingParams(temperature=1.0, top_p=0.9,
                                  repetition_penalty=1.0)
        B, L = 8192, 32
        out, _ = model.apply(
            {"params": params}, jax.random.PRNGKey(11), L, B, sampling,
            window_tokens=32, method=model.speculative_generate)
        out = np.asarray(out)                       # [B, L-1], sans [CLS]

        def modified_dist(prefix):
            """Analytic filtered next-token distribution given a prefix."""
            from sparse_vae_tpu.models.parallel_decode import _filter_logits
            toks = jnp.asarray(prefix, jnp.int32)[None, :]
            h = model.apply({"params": params}, toks,
                            method=model.forward_hidden)
            logits = model.apply({"params": params}, h[:, -1],
                                 method=model.project).astype(jnp.float32)
            lf = _filter_logits(logits, sampling)
            return np.asarray(jax.nn.softmax(lf, axis=-1))[0]

        p1 = modified_dist([1])                     # token 1 | [CLS]
        emp1 = np.bincount(out[:, 0], minlength=V) / B
        assert np.abs(emp1 - p1).sum() < 0.10, np.abs(emp1 - p1).sum()

        # Marginal of token 2: sum over the (few) t1 in the nucleus.
        p2 = np.zeros(V)
        for t1 in np.nonzero(p1 > 1e-6)[0]:
            if t1 == 2:                             # end: position 2 is PAD
                p2[0] += p1[t1]
            else:
                p2 += p1[t1] * modified_dist([1, int(t1)])
        emp2 = np.bincount(out[:, 1], minlength=V) / B
        assert np.abs(emp2 - p2).sum() < 0.10, np.abs(emp2 - p2).sum()

    def test_sampled_pass_count_bounded(self, sparse_lm):
        """Every pass finalizes a token for every live row or advances the
        frozen frontier a block, so the pass count is bounded by
        L(1 + 1/window_blocks) — and never hits the default max_iters cap
        (hitting it would silently emit unverified draft)."""
        model, params = sparse_lm
        sampling = SamplingParams(temperature=1.0, top_p=0.9,
                                  repetition_penalty=1.2)
        L, W, bs = 128, 64, 32
        _, iters = model.apply(
            {"params": params}, jax.random.PRNGKey(3), L, 2, sampling,
            window_tokens=W, method=model.speculative_generate)
        assert int(iters) < L + L // (W // bs) + 2, int(iters)

    def test_all_position_marginals_context_free(self):
        """The decisive distribution regression: a context-free model
        (constant logits) makes EVERY position's modified target identical,
        so the pooled empirical marginal over all positions and a batch>1
        must match analytically. This pins the per-row-finality contract:
        the first (batch-min) implementation re-verified uncovered
        resamples with already-consumed coins and deviated by L1 ~0.2
        here; the per-row version sits at Monte-Carlo noise."""
        from sparse_vae_tpu.models.parallel_decode import \
            frontier_speculative_decode

        V, B, L, bs, W = 4, 4, 16, 4, 8
        base = jnp.array([1.0, 0.5, 0.0, -0.5], jnp.float32)
        p = np.asarray(jax.nn.softmax(base))
        sampling = SamplingParams(temperature=1.0, top_p=1.0,
                                  repetition_penalty=1.0)

        def whf(win, caches, f):
            return jnp.zeros((B, win.shape[1], 1), jnp.float32), ()

        def run(rng):
            out, _ = frontier_speculative_decode(
                whf, lambda h: jnp.broadcast_to(base,
                                                h.shape[:-1] + (V,)),
                lambda c, kv, off: c, (), B, L, rng, sampling,
                start_token=1, end_token=-1, window_tokens=W,
                block_size=bs, draft_ngram=0)
            return out

        rngs = jax.random.split(jax.random.PRNGKey(0), 8000)
        outs = np.asarray(jax.jit(jax.vmap(run))(rngs))     # [N, B, L]
        toks = outs[:, :, 1:L - 1].reshape(-1)  # skip [CLS] + forced-PAD
        emp = np.bincount(toks, minlength=V) / toks.size
        assert np.abs(emp - p).sum() < 0.02, (emp, p)

    def test_single_block_window_completes(self):
        """W == block_size is the catch-up-pass regime (a pass that
        finalizes nothing while the frontier catches up): the default
        max_iters must still let every row converge — the default-cap
        output must equal a generous-cap run exactly (truncation at the
        cap would silently leave unverified draft in the output)."""
        from sparse_vae_tpu.models.parallel_decode import \
            frontier_speculative_decode

        V, B, L, bs = 4, 8, 32, 4
        base = jnp.array([1.0, 0.5, 0.0, -0.5], jnp.float32)
        sampling = SamplingParams(temperature=1.0, top_p=1.0,
                                  repetition_penalty=1.0)

        def whf(win, caches, f):
            return jnp.zeros((B, win.shape[1], 1), jnp.float32), ()

        def run(rng, mi):
            return frontier_speculative_decode(
                whf, lambda h: jnp.broadcast_to(base,
                                                h.shape[:-1] + (V,)),
                lambda c, kv, off: c, (), B, L, rng, sampling,
                start_token=1, end_token=-1, window_tokens=bs,
                block_size=bs, max_iters=mi, draft_ngram=0)

        rngs = jax.random.split(jax.random.PRNGKey(1), 512)
        o1, it1 = jax.jit(jax.vmap(lambda r: run(r, None)))(rngs)
        o2, _ = jax.jit(jax.vmap(lambda r: run(r, 10 * L)))(rngs)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        assert int(np.asarray(it1).max()) < 2 * L + 2

    def test_rejects_dense_config(self, lm):
        model, params = lm
        with pytest.raises(ValueError, match="sparse"):
            model.apply({"params": params}, jax.random.PRNGKey(0), 32, 1,
                        GREEDY, method=model.speculative_generate)

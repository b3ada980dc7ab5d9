"""Chunked speculative decoding (models/spec_decode.py and the
decode_chunk/commit_chunk cache protocol).

The chunk-verification peek must equal sequential one-token decoding
exactly — both the outputs and the cache contents — and committing only an
accepted prefix must leave the cache indistinguishable from never having
seen the rejected tail (the "free rewind" the position-addressed caches
provide). Distributional exactness of the draft-model accept/resample
operator is tested on a context-free model where the marginals are known.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.models.generation import SamplingParams
from sparse_vae_tpu.models.transformer_lm import (TransformerHparams,
                                                  TransformerLanguageModel)
from sparse_vae_tpu.models.transformer_vae import (TransformerVAE,
                                                   TransformerVAEHparams)

VOCAB = 64


def lm_model(sparse: bool, **kw):
    # window 3 x block 4: chunk sizes up to (w-1)*bs+1 = 9 are legal
    # (decode_chunk's CLS-lifetime bound), and T=24 wraps the 12-slot ring
    # twice.
    cfg = dict(d_model=32, num_heads=4, num_layers=2, vocab_size=VOCAB,
               sparse_self_attention=sparse, attn_block_size=4,
               attn_window_size=3, use_pallas_kernel=False)
    cfg.update(kw)
    hp = TransformerHparams(**cfg)
    model = TransformerLanguageModel(hp)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.ones((1, 16), jnp.int32))["params"]
    return model, params


def sequential_logits(model, params, tokens, max_length):
    """Feed tokens one at a time through decode_step; return (logits
    [B, T, V], final caches)."""
    b, t = tokens.shape
    caches = model.apply({"params": params}, b, max_length,
                         method=TransformerLanguageModel.init_caches)
    outs = []
    for i in range(t):
        logits, caches = model.apply(
            {"params": params}, tokens[:, i], caches, i,
            method=TransformerLanguageModel.decode_step)
        outs.append(logits)
    return jnp.stack(outs, axis=1), caches


def chunked_logits(model, params, tokens, max_length, chunk: int):
    """Same tokens via decode_chunk + full commit_chunk per chunk."""
    b, t = tokens.shape
    assert t % chunk == 0
    caches = model.apply({"params": params}, b, max_length,
                         method=TransformerLanguageModel.init_caches)
    outs = []
    for i in range(0, t, chunk):
        logits, kvs = model.apply(
            {"params": params}, tokens[:, i:i + chunk], caches, i,
            method=TransformerLanguageModel.decode_chunk)
        caches = model.apply(
            {"params": params}, caches, kvs, i, chunk,
            method=TransformerLanguageModel.commit_chunk)
        outs.append(logits)
    return jnp.concatenate(outs, axis=1), caches


class TestDecodeChunk:
    @pytest.mark.parametrize("sparse", [True, False])
    def test_chunk_equals_sequential(self, sparse):
        """decode_chunk + full commit == one-token decode_step loop, for
        logits AND cache contents, across block boundaries and (sparse)
        multiple ring wraps (T=24 > 2 * ring_len=8)."""
        model, params = lm_model(sparse)
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 3, VOCAB)
        want, want_caches = sequential_logits(model, params, tokens, 32)
        got, got_caches = chunked_logits(model, params, tokens, 32, chunk=6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(got_caches),
                        jax.tree_util.tree_leaves(want_caches)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("sparse", [True, False])
    def test_partial_commit_is_exact_rewind(self, sparse):
        """Peek a chunk, commit only m of it, continue one-token decoding:
        every subsequent logit must equal a run that never saw the
        rejected tail."""
        model, params = lm_model(sparse)
        key = jax.random.PRNGKey(2)
        prefix = jax.random.randint(key, (1, 7), 3, VOCAB)
        chunk = jax.random.randint(jax.random.fold_in(key, 1), (1, 5), 3,
                                   VOCAB)
        cont = jax.random.randint(jax.random.fold_in(key, 2), (1, 6), 3,
                                  VOCAB)
        m = 2

        # Reference stream: prefix + accepted part of the chunk + cont.
        ref_tokens = jnp.concatenate([prefix, chunk[:, :m], cont], axis=1)
        want, _ = sequential_logits(model, params, ref_tokens, 32)

        # Speculative stream: prefix sequentially, chunk peeked, m
        # committed, then cont sequentially from position 7+m.
        caches = model.apply({"params": params}, 1, 32,
                             method=TransformerLanguageModel.init_caches)
        for i in range(7):
            logits, caches = model.apply(
                {"params": params}, ref_tokens[:, i], caches, i,
                method=TransformerLanguageModel.decode_step)
        peek, kvs = model.apply({"params": params}, chunk, caches, 7,
                                method=TransformerLanguageModel.decode_chunk)
        # The peek itself matches the reference on the accepted rows.
        np.testing.assert_allclose(np.asarray(peek[:, :m]),
                                   np.asarray(want[:, 7:7 + m]),
                                   rtol=2e-5, atol=2e-5)
        caches = model.apply({"params": params}, caches, kvs, 7, m,
                             method=TransformerLanguageModel.commit_chunk)
        for i in range(cont.shape[1]):
            logits, caches = model.apply(
                {"params": params}, cont[:, i], caches, 7 + m + i,
                method=TransformerLanguageModel.decode_step)
            np.testing.assert_allclose(
                np.asarray(logits), np.asarray(want[:, 7 + m + i]),
                rtol=2e-5, atol=2e-5,
                err_msg=f"continuation step {i} diverged after rewind")

    def test_commit_zero_is_noop(self):
        """m=0 must leave the caches bitwise identical."""
        model, params = lm_model(True)
        caches = model.apply({"params": params}, 1, 32,
                             method=TransformerLanguageModel.init_caches)
        tok = jnp.full((1,), 5, jnp.int32)
        _, caches = model.apply({"params": params}, tok, caches, 0,
                                method=TransformerLanguageModel.decode_step)
        chunk = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 3, VOCAB)
        _, kvs = model.apply({"params": params}, chunk, caches, 1,
                             method=TransformerLanguageModel.decode_chunk)
        committed = model.apply({"params": params}, caches, kvs, 1, 0,
                                method=TransformerLanguageModel.commit_chunk)
        for a, b in zip(jax.tree_util.tree_leaves(committed),
                        jax.tree_util.tree_leaves(caches)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDecodeChunkRowwise:
    """Per-row-position chunk verification (the serving-side primitive):
    every row must equal the scalar decode_chunk at that row's index, for
    outputs AND committed cache bits."""

    @pytest.mark.parametrize("sparse", [True, False])
    def test_rowwise_equals_per_row_scalar(self, sparse):
        from sparse_vae_tpu.ops.attention import Attention
        attn = Attention(d_model=32, num_heads=4, causal=True,
                         sparse=sparse, window_size=3, block_size=4,
                         use_pallas_kernel=False)
        key = jax.random.PRNGKey(0)
        params = attn.init(key, jnp.ones((1, 4, 32)), jnp.ones((1, 4, 32)),
                           method=Attention.__call__)["params"]
        C, max_len = 5, 32
        prefix_lens = [5, 9, 14]          # straddle block boundaries
        commit_ms = [0, 3, 5]

        def scalar_row(L, m, seed):
            toks = jax.random.normal(jax.random.PRNGKey(seed),
                                     (1, L + C, 32))
            cache = attn.apply({"params": params}, 1, max_len,
                               method=Attention.init_cache)
            for i in range(L):
                _, cache = attn.apply({"params": params},
                                      toks[:, i:i + 1], cache, i,
                                      method=Attention.decode)
            out, kv = attn.apply({"params": params}, toks[:, L:L + C],
                                 cache, L, method=Attention.decode_chunk)
            committed = attn.apply({"params": params}, cache, kv, L, m,
                                   method=Attention.commit_chunk)
            return toks[:, L:L + C], cache, out, committed

        rows = [scalar_row(L, m, 7 + r)
                for r, (L, m) in enumerate(zip(prefix_lens, commit_ms))]
        stack = lambda xs: jax.tree_util.tree_map(
            lambda *ls: jnp.concatenate(ls, axis=0), *xs)
        x_b = stack([r[0] for r in rows])
        cache_b = stack([r[1] for r in rows])
        idx = jnp.asarray(prefix_lens, jnp.int32)
        out_b, kv_b = attn.apply({"params": params}, x_b, cache_b, idx,
                                 method=Attention.decode_chunk_rowwise)
        want_out = stack([r[2] for r in rows])
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(want_out),
                                   rtol=2e-5, atol=2e-5)
        committed_b = attn.apply(
            {"params": params}, cache_b, kv_b, idx,
            jnp.asarray(commit_ms, jnp.int32),
            method=Attention.commit_chunk_rowwise)
        want_cache = stack([r[3] for r in rows])
        for a, b in zip(jax.tree_util.tree_leaves(committed_b),
                        jax.tree_util.tree_leaves(want_cache)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)


class TestChunkSpeculativeDecode:
    """The draft-model speculative loop (models/spec_decode.py)."""

    def _context_free_run(self, base_p, base_q, sampling, length=16, k=4,
                          n_runs=4000):
        """Constant-logits target and draft: every position's modified
        target distribution is identical and analytic."""
        from sparse_vae_tpu.models.spec_decode import chunk_speculative_decode
        v = base_p.shape[0]

        def chunk_fn(tokens, caches, index):
            return jnp.broadcast_to(base_p, (1, tokens.shape[1], v)), ()

        logq = jax.nn.log_softmax(base_q)

        def draft_propose(state, last, rng):
            toks = jax.random.categorical(
                rng, jnp.broadcast_to(logq, (k, v))).astype(jnp.int32)
            q_logp = jnp.broadcast_to(logq, (1, k, v))
            return toks[None, :], q_logp, jnp.zeros((k + 1, 1))

        def run(rng):
            out, iters, acc = chunk_speculative_decode(
                chunk_fn, lambda c, kv, i, m: c, (), draft_propose,
                jnp.zeros((1,)), length, rng, sampling,
                start_token=1, end_token=-1, draft_k=k)
            return out, iters, acc

        rngs = jax.random.split(jax.random.PRNGKey(0), n_runs)
        outs, iters, accs = jax.jit(jax.vmap(run))(rngs)
        return np.asarray(outs), np.asarray(iters), np.asarray(accs)

    def test_context_free_marginals_exact(self):
        """Pooled empirical marginals must match the analytic modified
        target — with a draft distribution DELIBERATELY different from the
        target so min(1, p/q) and the residual both do real work."""
        from sparse_vae_tpu.models.parallel_decode import _filter_logits
        base_p = jnp.array([1.0, 0.5, 0.0, -0.5], jnp.float32)
        base_q = jnp.array([-0.5, 1.0, 0.3, 0.0], jnp.float32)
        sampling = SamplingParams(temperature=1.0, top_p=1.0,
                                  repetition_penalty=1.0)
        L = 16
        outs, iters, accs = self._context_free_run(base_p, base_q, sampling,
                                                   length=L)
        toks = outs[:, 0, 1:L - 1].reshape(-1)
        emp = np.bincount(toks, minlength=4) / toks.size
        want = np.asarray(jax.nn.softmax(base_p))
        assert np.abs(emp - want).sum() < 0.02, (emp, want)
        # The mismatched draft still lands SOME accepted tokens, and the
        # loop must beat one-token-per-pass on average.
        assert accs.mean() > 0.5
        assert iters.mean() < L - 1

    def test_context_free_marginals_with_filtering(self):
        """Same, through temperature + top-p: the analytic target is the
        FILTERED distribution (the q support can exceed p's — rejections
        there must resample inside the support)."""
        from sparse_vae_tpu.models.parallel_decode import _filter_logits
        base_p = jnp.array([1.2, 0.7, 0.1, -0.8], jnp.float32)
        base_q = jnp.array([0.0, 0.0, 0.0, 0.0], jnp.float32)  # uniform q
        sampling = SamplingParams(temperature=0.8, top_p=0.7,
                                  repetition_penalty=1.0)
        L = 16
        outs, _, _ = self._context_free_run(base_p, base_q, sampling,
                                            length=L)
        toks = outs[:, 0, 1:L - 1].reshape(-1)
        emp = np.bincount(toks, minlength=4) / toks.size
        lf = _filter_logits(base_p[None, None, :], sampling)
        want = np.asarray(jax.nn.softmax(lf[0, 0]))
        assert np.abs(emp - want).sum() < 0.02, (emp, want)

    def test_perfect_draft_accepts_nearly_everything(self):
        """q == p: acceptance probability is 1, so the pass count must
        collapse to ~length/(k+1) — the accept path actually accepts."""
        base = jnp.array([1.0, 0.5, 0.0, -0.5], jnp.float32)
        sampling = SamplingParams(temperature=1.0, top_p=1.0,
                                  repetition_penalty=1.0)
        L, k = 16, 4
        outs, iters, accs = self._context_free_run(base, base, sampling,
                                                   length=L, k=k,
                                                   n_runs=256)
        assert iters.mean() < L / (k + 1) + 1.5, iters.mean()
        assert accs.mean() > 0.8 * (L - 1) * k / (k + 1) * 0.8

    def test_greedy_equals_ar_sample(self):
        """temperature=0: the spec loop accepts a draft iff it IS the
        argmax and writes the argmax otherwise — the output must equal the
        AR greedy trajectory token for token (any draft model)."""
        from sparse_vae_tpu.models.lstm_lm import (LSTMLanguageModel,
                                                   LSTMLanguageModelHparams)
        model, params = lm_model(True)
        greedy = SamplingParams(temperature=0.0, repetition_penalty=1.2)
        want = model.apply({"params": params}, jax.random.PRNGKey(7), 24, 1,
                           greedy, method=TransformerLanguageModel.sample)

        dhp = LSTMLanguageModelHparams(d_model=16, num_layers=1,
                                       vocab_size=VOCAB)
        draft = LSTMLanguageModel(dhp)
        dparams = draft.init(jax.random.PRNGKey(8),
                             jnp.ones((1, 8), jnp.int32))["params"]

        def draft_propose(state, last, rng):
            return draft.apply({"params": dparams}, state, last, rng, 4,
                               method=LSTMLanguageModel.draft_propose)

        dinit = draft.apply({"params": dparams}, 1,
                            method=LSTMLanguageModel.initial_rnn_state)
        got, iters, acc = model.apply(
            {"params": params}, jax.random.PRNGKey(7), 24, draft_propose,
            dinit, greedy, draft_k=4,
            method=TransformerLanguageModel.spec_draft_generate)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_transformer_draft_greedy_equals_ar(self):
        """A sparse-transformer draft (ring-cache state stack) through the
        same loop: greedy output must equal the AR trajectory."""
        model, params = lm_model(True)
        greedy = SamplingParams(temperature=0.0, repetition_penalty=1.2)
        want = model.apply({"params": params}, jax.random.PRNGKey(13), 24,
                           1, greedy, method=TransformerLanguageModel.sample)

        dmodel, dparams = lm_model(True, num_layers=1)

        def draft_propose(state, last, rng):
            return dmodel.apply(
                {"params": dparams}, state, last, rng, 4,
                method=TransformerLanguageModel.draft_propose)

        dinit = dmodel.apply(
            {"params": dparams}, 1, 32,
            method=TransformerLanguageModel.draft_init_state)
        got, iters, acc = model.apply(
            {"params": params}, jax.random.PRNGKey(13), 24, draft_propose,
            dinit, greedy, draft_k=4,
            method=TransformerLanguageModel.spec_draft_generate)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_vae_spec_draft_generate_runs(self):
        """End-to-end on the z-injected decoder: shapes, end masking, and
        rng determinism."""
        from sparse_vae_tpu.models.lstm_lm import (LSTMLanguageModel,
                                                   LSTMLanguageModelHparams)
        hp = TransformerVAEHparams(d_model=32, num_heads=4, num_layers=2,
                                   vocab_size=VOCAB, latent_depth=8,
                                   num_encoder_latents=4,
                                   sparse_self_attention=True,
                                   attn_block_size=4, attn_window_size=3,
                                   use_pallas_kernel=False)
        model = TransformerVAE(hp)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            jnp.ones((1, 16), jnp.int32))["params"]
        dhp = LSTMLanguageModelHparams(d_model=16, num_layers=1,
                                       vocab_size=VOCAB)
        draft = LSTMLanguageModel(dhp)
        dparams = draft.init(jax.random.PRNGKey(2),
                             jnp.ones((1, 8), jnp.int32))["params"]

        def draft_propose(state, last, rng):
            return draft.apply({"params": dparams}, state, last, rng, 4,
                               method=LSTMLanguageModel.draft_propose)

        dinit = draft.apply({"params": dparams}, 1,
                            method=LSTMLanguageModel.initial_rnn_state)

        def run():
            return model.apply(
                {"params": params}, jax.random.PRNGKey(9), 24,
                draft_propose, dinit, sampling=SamplingParams(),
                draft_k=4, method=TransformerVAE.spec_draft_generate)

        out, iters, acc = run()
        out = np.asarray(out)
        assert out.shape == (1, 23)
        assert ((out >= 0) & (out < VOCAB)).all()
        ends = np.flatnonzero(out[0] == 2)
        if len(ends):
            assert (out[0, ends[0] + 1:] == 0).all()
        out2, iters2, _ = run()
        np.testing.assert_array_equal(out, np.asarray(out2))
        assert int(iters) == int(iters2)


class TestVAEDecodeChunkZ:
    def test_chunk_z_equals_sequential_z(self):
        """decode_chunk_z == decode_step_z loop, including the z injection
        at absolute position 0 (first chunk only)."""
        hp = TransformerVAEHparams(d_model=32, num_heads=4, num_layers=2,
                                   vocab_size=VOCAB, latent_depth=8,
                                   num_encoder_latents=4,
                                   sparse_self_attention=True,
                                   attn_block_size=4, attn_window_size=2,
                                   use_pallas_kernel=False)
        model = TransformerVAE(hp)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            jnp.ones((1, 16), jnp.int32))["params"]
        z = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 8))
        tokens = jax.random.randint(jax.random.PRNGKey(5), (1, 12), 3, VOCAB)

        caches = model.apply({"params": params}, 1, 32,
                             method=TransformerVAE.init_caches)
        want = []
        for i in range(12):
            logits, caches = model.apply(
                {"params": params}, tokens[:, i], caches, i, z,
                method=TransformerVAE.decode_step_z)
            want.append(logits)
        want = jnp.stack(want, axis=1)

        caches = model.apply({"params": params}, 1, 32,
                             method=TransformerVAE.init_caches)
        got = []
        for i in range(0, 12, 4):
            logits, kvs = model.apply(
                {"params": params}, tokens[:, i:i + 4], caches, i, z,
                method=TransformerVAE.decode_chunk_z)
            caches = model.apply({"params": params}, caches, kvs, i, 4,
                                 method=TransformerVAE.commit_chunk)
            got.append(logits)
        got = jnp.concatenate(got, axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

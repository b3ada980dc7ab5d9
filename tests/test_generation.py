"""Tests for the functional decode state machine (models/generation.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.models.generation import (
    DecodeState, SamplingParams, apply_repetition_penalty, decode_loop,
    final_output, init_decode_state, prev_tokens, process_logits,
    should_continue)

END = 2
VOCAB = 16


def greedy_params():
    return SamplingParams(temperature=0.0, repetition_penalty=1.0)


class TestDecodeState:
    def test_init(self, rng):
        st = init_decode_state(3, 10, start_token=1, rng=rng)
        assert st.tokens.shape == (3, 10)
        assert (st.tokens[:, 0] == 1).all()
        assert int(st.index) == 1
        assert st.live.all()
        np.testing.assert_array_equal(prev_tokens(st), [1, 1, 1])

    def test_greedy_step_writes_argmax(self, rng):
        st = init_decode_state(2, 8, 1, rng)
        logits = jnp.zeros((2, VOCAB)).at[0, 5].set(9.0).at[1, 7].set(9.0)
        st = process_logits(logits, st, greedy_params(), END)
        np.testing.assert_array_equal(st.tokens[:, 1], [5, 7])
        assert int(st.index) == 2
        assert st.live.all()

    def test_end_token_kills_sample(self, rng):
        st = init_decode_state(2, 8, 1, rng)
        logits = jnp.zeros((2, VOCAB)).at[0, END].set(9.0).at[1, 7].set(9.0)
        st = process_logits(logits, st, greedy_params(), END)
        np.testing.assert_array_equal(np.asarray(st.live), [False, True])
        # Dead sample then writes PAD forever
        st = process_logits(jnp.full((2, VOCAB), 1.0).at[:, 3].set(9.0),
                            st, greedy_params(), END)
        assert int(st.tokens[0, 2]) == 0
        assert int(st.tokens[1, 2]) == 3

    def test_should_continue_false_when_all_dead(self, rng):
        st = init_decode_state(1, 8, 1, rng)
        assert bool(should_continue(st))
        st = st._replace(live=jnp.zeros(1, bool))
        assert not bool(should_continue(st))

    def test_buffer_full_stops(self, rng):
        st = init_decode_state(1, 3, 1, rng)
        st = process_logits(jnp.zeros((1, VOCAB)).at[0, 5].set(9.0),
                            st, greedy_params(), END)
        assert not bool(should_continue(st))

    def test_final_output_strips_start(self, rng):
        st = init_decode_state(1, 4, 1, rng)
        assert final_output(st).shape == (1, 3)


class TestLogitProcessing:
    def test_repetition_penalty_discourages_repeats(self, rng):
        st = init_decode_state(1, 16, 1, rng)
        # Generate token 5 greedily, then check its logit is penalized
        logits = jnp.zeros((1, VOCAB)).at[0, 5].set(2.0)
        st = process_logits(logits, st, greedy_params(), END)
        penalized = apply_repetition_penalty(
            logits, st.tokens, st.index, penalty=1.2, window=8)
        assert float(penalized[0, 5]) == pytest.approx(2.0 / 1.2)
        # Negative logits are multiplied (made more negative)
        neg = jnp.zeros((1, VOCAB)).at[0, 5].set(-1.0)
        pen_neg = apply_repetition_penalty(neg, st.tokens, st.index, 1.2, 8)
        assert float(pen_neg[0, 5]) == pytest.approx(-1.2)

    def test_top_k_restricts_support(self, rng):
        st = init_decode_state(256, 4, 1, rng)
        logits = jnp.tile(jnp.arange(VOCAB, dtype=jnp.float32), (256, 1))
        st = process_logits(logits, st,
                            SamplingParams(top_k=2, top_p=1.0,
                                           repetition_penalty=1.0,
                                           temperature=1.0), END)
        drawn = set(np.asarray(st.tokens[:, 1]).tolist())
        assert drawn <= {VOCAB - 1, VOCAB - 2}

    def test_top_p_restricts_support(self, rng):
        st = init_decode_state(512, 4, 1, rng)
        # One dominant token (p~0.97) => nucleus 0.9 keeps only it
        logits = jnp.zeros((512, VOCAB)).at[:, 3].set(5.0)
        st = process_logits(logits, st,
                            SamplingParams(top_p=0.9, repetition_penalty=1.0),
                            END)
        assert set(np.asarray(st.tokens[:, 1]).tolist()) == {3}

    def test_temperature_flattens(self, rng):
        st = init_decode_state(2048, 4, 1, rng)
        logits = jnp.zeros((2048, VOCAB)).at[:, 3].set(2.0)
        hot = process_logits(logits, st,
                             SamplingParams(temperature=100.0, top_p=1.0,
                                            repetition_penalty=1.0), END)
        frac_3 = float((hot.tokens[:, 1] == 3).mean())
        assert frac_3 < 0.5  # near-uniform at high temperature


class TestDecodeLoop:
    def test_loop_terminates_and_is_jittable(self, rng):
        # logits_fn emits END at step 3 deterministically
        def logits_fn(st, carry):
            logits = jnp.where(st.index >= 3,
                               jnp.zeros((2, VOCAB)).at[:, END].set(99.0),
                               jnp.zeros((2, VOCAB)).at[:, 4].set(99.0))
            return logits, carry

        @jax.jit
        def run(key):
            st = init_decode_state(2, 10, 1, key)
            st, _ = decode_loop(st, logits_fn, None, greedy_params(), END)
            return st.tokens

        tokens = np.asarray(run(rng))
        np.testing.assert_array_equal(tokens[0, :5], [1, 4, 4, END, 0])


class TestTopPBisection:
    def test_matches_sort_based_nucleus(self, rng):
        """The bisection filter must keep the same token set as the
        sort+cumsum definition (modulo exact-boundary ties)."""
        from sparse_vae_tpu.models.generation import top_p_filter
        logits = jax.random.normal(rng, (64, 333)) * 3.0
        for p in (0.5, 0.9, 0.99):
            got = np.asarray(top_p_filter(logits, p)) > -np.inf
            probs = np.asarray(jax.nn.softmax(logits, axis=-1))
            order = np.argsort(-probs, axis=-1)
            for r in range(probs.shape[0]):
                sorted_p = probs[r, order[r]]
                cum = np.cumsum(sorted_p)
                k = int(np.searchsorted(cum, p)) + 1  # minimal set size
                expect = np.zeros(probs.shape[1], bool)
                expect[order[r, :k]] = True
                # Allow the boundary token to differ (bisection keeps the
                # mass->=p set; ties at the threshold may add a token)
                diff = got[r] ^ expect
                assert diff.sum() <= 1, (r, p, diff.sum())

    def test_always_keeps_argmax(self, rng):
        from sparse_vae_tpu.models.generation import top_p_filter
        logits = jax.random.normal(rng, (8, 100))
        out = np.asarray(top_p_filter(logits, 0.01))
        arg = np.asarray(jnp.argmax(logits, -1))
        for r in range(8):
            assert np.isfinite(out[r, arg[r]])


class TestResumableSampling:
    def test_sliced_resumable_equals_one_shot(self):
        """sample_resumable driven in bounded slices must produce exactly
        the one-shot sample() output (the host-loop decode mode for pg19-
        length documents, where one device execution can't run 102k steps)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from sparse_vae_tpu.models.transformer_vae import (
            TransformerVAE, TransformerVAEHparams)
        from sparse_vae_tpu.models.generation import final_output

        hp = TransformerVAEHparams(
            d_model=32, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=128, num_encoder_latents=4,
            sparse_self_attention=True, attn_window_size=2,
            attn_block_size=8, use_pallas_kernel=False)
        model = TransformerVAE(hp)
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng, "sample": rng},
                            jnp.ones((1, 16), jnp.int32))["params"]

        key = jax.random.PRNGKey(9)
        L, B = 48, 2
        one_shot = model.apply({"params": params}, key, L, B,
                               method=TransformerVAE.sample)

        state = caches = z = None
        for _ in range(0, L, 10):
            state, caches, z = model.apply(
                {"params": params}, key, L, B, z,
                method=TransformerVAE.sample_resumable,
                state=state, caches=caches, max_steps=10)
        np.testing.assert_array_equal(np.asarray(final_output(state)),
                                      np.asarray(one_shot))

    def test_lm_sliced_resumable_equals_one_shot(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from sparse_vae_tpu.models.transformer_lm import (
            TransformerHparams, TransformerLanguageModel)
        from sparse_vae_tpu.models.generation import final_output

        hp = TransformerHparams(d_model=32, num_heads=4, num_layers=2,
                                vocab_size=128, sparse_self_attention=False,
                                use_pallas_kernel=False)
        model = TransformerLanguageModel(hp)
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, jnp.ones((1, 16), jnp.int32))["params"]

        key = jax.random.PRNGKey(4)
        one_shot = model.apply({"params": params}, key, 32, 2,
                               method=TransformerLanguageModel.sample)
        state = caches = None
        for _ in range(0, 32, 8):
            state, caches = model.apply(
                {"params": params}, key, 32, 2,
                method=TransformerLanguageModel.sample_resumable,
                state=state, caches=caches, max_steps=8)
        np.testing.assert_array_equal(np.asarray(final_output(state)),
                                      np.asarray(one_shot))


class TestFusedSelect:
    """process_logits(fused=True): the VMEM-resident nucleus selection
    kernel in the AR decode step (the mass-sampling bandwidth lever)."""

    def test_fused_step_matches_manual_gumbel_max(self, rng):
        """The fused path must equal penalty -> temperature -> top-p filter
        -> +gumbel(sample_rng) -> argmax computed with plain jnp (logits
        well-separated so the bisection epsilon cannot flip the set)."""
        from sparse_vae_tpu.models.generation import top_p_filter
        B, V = 4, 256
        params = SamplingParams(temperature=0.8, top_p=0.9,
                                repetition_penalty=1.2)
        st = init_decode_state(B, 8, 1, rng)
        logits = jax.random.normal(jax.random.PRNGKey(3), (B, V)) * 4.0

        fused = process_logits(logits, st, params, END, fused=True,
                               interpret=True)

        expect = apply_repetition_penalty(
            logits, st.tokens, st.index, params.repetition_penalty,
            params.repetition_window)
        sample_rng = jax.random.split(st.rng)[1]
        noise = jax.random.gumbel(sample_rng, (B, V), jnp.float32)
        filt = top_p_filter(expect / params.temperature, params.top_p)
        want = jnp.argmax(jnp.where(jnp.isfinite(filt), filt + noise, filt),
                          axis=-1)
        np.testing.assert_array_equal(np.asarray(fused.tokens[:, 1]),
                                      np.asarray(want))

    def test_fused_sample_loop_runs_on_tiny_model(self):
        """Model-level: sample(fused_select=True) terminates and produces
        tokens with the same live/end semantics as the plain path."""
        from sparse_vae_tpu.models.transformer_lm import (
            TransformerHparams, TransformerLanguageModel)
        hp = TransformerHparams(d_model=32, num_heads=4, num_layers=2,
                                vocab_size=128, use_pallas_kernel=False)
        model = TransformerLanguageModel(hp)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, 16), jnp.int32))["params"]
        out = model.apply({"params": params}, jax.random.PRNGKey(1), 24, 2,
                          SamplingParams(), fused_select=True,
                          interpret=True, method=model.sample)
        out = np.asarray(out)
        assert out.shape == (2, 23)
        assert ((out >= 0) & (out < 128)).all()
        for row in out:
            ends = np.flatnonzero(row == END)
            if len(ends):                 # everything after [SEP] is PAD
                assert (row[ends[0] + 1:] == 0).all()

    def test_fused_resumable_equals_fused_one_shot(self):
        """Slicing must be transparent to the fused selection path too:
        the per-step rng chain is part of DecodeState, so fused one-shot
        and fused resumable sample identical tokens."""
        from sparse_vae_tpu.models.generation import final_output
        from sparse_vae_tpu.models.transformer_lm import (
            TransformerHparams, TransformerLanguageModel)
        hp = TransformerHparams(d_model=32, num_heads=4, num_layers=2,
                                vocab_size=128, use_pallas_kernel=False)
        model = TransformerLanguageModel(hp)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, 16), jnp.int32))["params"]
        key = jax.random.PRNGKey(5)
        one_shot = model.apply({"params": params}, key, 32, 2,
                               SamplingParams(), fused_select=True,
                               interpret=True, method=model.sample)
        state = caches = None
        for _ in range(0, 32, 8):
            state, caches = model.apply(
                {"params": params}, key, 32, 2, SamplingParams(),
                state=state, caches=caches, max_steps=8,
                fused_select=True, interpret=True,
                method=model.sample_resumable)
        np.testing.assert_array_equal(np.asarray(final_output(state)),
                                      np.asarray(one_shot))

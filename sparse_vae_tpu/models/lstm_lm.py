"""LSTM/GRU autoregressive language model.

TPU re-design of /root/reference/sparse_vae/lstm_language_model.py: flax
module with a scan-based RNN (ops/rnn.py), learned c0 with h0 = tanh(c0)
(:31,55-57), optional tied logits through a d_embedding bottleneck (:33-44),
and a fully on-device sampling loop (lax.while_loop) instead of the
reference's Python token loop (:60-86). `context_depth` is the subclass hook
the LSTMVAE uses to concatenate z to every input embedding (:89-90).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.rnn import StackedRNN
from .base import LanguageModelHparams, dense_kernel_init, embed_init
from .generation import (DecodeState, SamplingParams, decode_loop,
                         final_output, init_decode_state, prev_tokens)


@dataclass
class LSTMLanguageModelHparams(LanguageModelHparams):
    d_embedding: int = 512
    d_model: int = 1024
    num_layers: int = 1
    rnn_type: str = "LSTM"
    tie_logit_weights: bool = False
    init_scale: Optional[float] = None   # LSTM presets use default init


class LSTMLanguageModel(nn.Module):
    hparams: LSTMLanguageModelHparams

    def setup(self):
        hp = self.hparams
        self.decoder_embedding = nn.Embed(
            hp.vocab_size, hp.d_embedding,
            embedding_init=embed_init(hp.init_scale))
        self.decoder = StackedRNN(
            hidden_size=hp.d_model, num_layers=hp.num_layers,
            rnn_type=hp.rnn_type)
        self.c0 = self.param("c0", nn.initializers.normal(1.0),
                             (hp.num_layers, hp.d_model))
        if hp.tie_logit_weights:
            # Bottleneck to d_embedding, then logits via the tied embedding
            # matrix (ref :33-44).
            self.logit_bottleneck = nn.Dense(
                hp.d_embedding, kernel_init=dense_kernel_init(hp.init_scale))
            self.logit_bias = self.param("logit_bias", nn.initializers.zeros,
                                         (hp.vocab_size,))
        else:
            self.output_layer = nn.Dense(
                hp.vocab_size, kernel_init=dense_kernel_init(hp.init_scale))

    def logits_from_hidden(self, h):
        if self.hparams.tie_logit_weights:
            h = self.logit_bottleneck(h)
            return h @ self.decoder_embedding.embedding.T + self.logit_bias
        return self.output_layer(h)

    def context_depth(self) -> int:
        """Width of per-step context concatenated to the input (VAE hook)."""
        return 0

    def initial_rnn_state(self, batch_size: int):
        c0 = jnp.broadcast_to(self.c0[:, None, :],
                              (self.hparams.num_layers, batch_size,
                               self.hparams.d_model))
        if self.hparams.rnn_type == "LSTM":
            return [(jnp.tanh(c0[i]), c0[i])
                    for i in range(self.hparams.num_layers)]
        return [jnp.tanh(c0[i]) for i in range(self.hparams.num_layers)]

    def __call__(self, token_ids, context=None):
        """Teacher-forced logits [B, L, V] (ref forward :50-58).

        `context` ([B, D_ctx]) is broadcast-concatenated to every embedding
        (used by LSTMVAE's z-conditioning)."""
        x = self.decoder_embedding(token_ids)
        if context is not None:
            ctx = jnp.broadcast_to(context[:, None, :],
                                   (*x.shape[:-1], context.shape[-1]))
            x = jnp.concatenate([x, ctx], axis=-1)
        init = self.initial_rnn_state(token_ids.shape[0])
        hs, _ = self.decoder(x, init)
        return self.logits_from_hidden(hs)

    def decode_step(self, token, states, context=None):
        """One sampling step: token [B] -> (logits [B, V], new states)."""
        x = self.decoder_embedding(token)
        if context is not None:
            x = jnp.concatenate([x, context], axis=-1)
        h, states = self.decoder(x, states, single_step=True)
        return self.logits_from_hidden(h), states

    def draft_propose(self, state, last_token, rng, k: int,
                      temperature: float = 1.0, context=None):
        """Draft k tokens for speculative decoding (models/spec_decode.py).

        Scans k+1 decode steps from `state` (which has consumed everything
        before `last_token`): step 0 consumes last_token, step i consumes
        draft i. Returns (drafts [B, k], q_logp [B, k, V] — the EXACT
        log-distribution each draft was sampled from, needed by the
        min(1, p/q) accept rule — and the (k+1)-entry state stack whose
        entry j is the state after consuming last_token and drafts[:j],
        i.e. the rewind point when j drafts are accepted). The extra
        (k+1)-th step exists so stack[k] covers the all-accepted case."""
        def step(carry, rng_i):
            st, tok = carry
            logits, st2 = self.decode_step(tok, st, context)
            logp = jax.nn.log_softmax(
                logits.astype(jnp.float32) / temperature)
            nxt = jax.random.categorical(rng_i, logp).astype(jnp.int32)
            return (st2, nxt), (nxt, logp, st2)

        rngs = jax.random.split(rng, k + 1)
        _, (toks, logps, states) = jax.lax.scan(
            step, (state, last_token), rngs)
        drafts = jnp.transpose(toks[:k])                     # [B, k]
        q_logp = jnp.transpose(logps[:k], (1, 0, 2))         # [B, k, V]
        return drafts, q_logp, states

    def sample(self, rng, max_length: int, batch_size: int = 1,
               sampling: SamplingParams = SamplingParams(),
               start_token: int = 1, end_token: int = 2,
               initial_state=None, context=None):
        """On-device AR sampling (ref :60-86). Returns [B, max_length-1]."""
        state = init_decode_state(batch_size, max_length, start_token, rng)
        carry = initial_state if initial_state is not None \
            else self.initial_rnn_state(batch_size)

        def logits_fn(st: DecodeState, rnn_states):
            logits, rnn_states = self.decode_step(
                prev_tokens(st), rnn_states, context)
            return logits, rnn_states

        state, _ = decode_loop(state, logits_fn, carry, sampling, end_token)
        return final_output(state)

"""LSTM variational autoencoder.

TPU re-design of /root/reference/sparse_vae/lstm_vae.py: a (bi)LSTM or
Perceiver encoder compressed to a Gaussian posterior over z, and a
unidirectional LSTM decoder that receives z concatenated to every token
embedding plus z-derived initial state (c0 = z_to_hidden(z), h0 = tanh(c0),
lstm_vae.py:149-170). The reference's broken members (train_mc_samples /
dreg_backward_pass / dropout_in/out, SURVEY §2.9) are realized as a working
single-sample ELBO path plus the IWAE evaluator in vae.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.rnn import BiLSTMEncoder, StackedRNN
from .base import dense_kernel_init, embed_init
from .conditional_gaussian import ConditionalGaussian
from .generation import (DecodeState, SamplingParams, decode_loop,
                         final_output, init_decode_state, prev_tokens)
from .vae import ContinuousVAEHparams


@dataclass
class LSTMVAEHparams(ContinuousVAEHparams):
    """lstm_vae.py:12-24 (vocab_size lives here, fixing the reference's
    undefined hparams.vocab_size, :32)."""
    latent_depth: int = 32
    num_latent_vectors: int = 1
    bidirectional_encoder: bool = False
    transformer_encoder: bool = False
    tie_embedding_weights: bool = True
    d_embedding: int = 512
    d_model: int = 1024
    num_layers: int = 1
    tie_logit_weights: bool = False
    dropout: float = 0.0
    init_scale: Optional[float] = None


class LSTMVAE(nn.Module):
    hparams: LSTMVAEHparams

    def setup(self):
        hp = self.hparams
        self.decoder_embedding = nn.Embed(
            hp.vocab_size, hp.d_embedding,
            embedding_init=embed_init(hp.init_scale))
        if not hp.tie_embedding_weights:
            self.encoder_embedding = nn.Embed(
                hp.vocab_size, hp.d_embedding,
                embedding_init=embed_init(hp.init_scale))

        if hp.transformer_encoder:
            from .perceiver import Perceiver
            self.encoder = Perceiver(
                num_layers=3, num_latents=32, d_model=hp.d_embedding,
                bottleneck_width=hp.num_latent_vectors,
                init_scale=hp.init_scale)
            enc_width = hp.d_embedding
        else:
            self.encoder = BiLSTMEncoder(
                hidden_size=hp.d_model // 4, num_layers=hp.num_layers,
                bidirectional=hp.bidirectional_encoder)
            num_directions = 2 if hp.bidirectional_encoder else 1
            enc_width = (hp.d_model // 4) * num_directions
            self.encoder_c0 = self.param(
                "encoder_c0", nn.initializers.normal(1.0),
                (num_directions, hp.d_model // 4))

        self.q_of_z_given_x = ConditionalGaussian(
            hp.latent_depth, init_scale=hp.init_scale or 0.02)
        self.z_to_hidden = nn.Dense(
            hp.d_model, kernel_init=dense_kernel_init(hp.init_scale))
        self.decoder = StackedRNN(hidden_size=hp.d_model,
                                  num_layers=hp.num_layers)
        self.drop = nn.Dropout(rate=self.hparams.dropout,
                               deterministic=self.hparams.dropout == 0.0)

        if hp.tie_logit_weights:
            self.logit_bottleneck = nn.Dense(
                hp.d_embedding, kernel_init=dense_kernel_init(hp.init_scale))
            self.logit_bias = self.param("logit_bias", nn.initializers.zeros,
                                         (hp.vocab_size,))
        else:
            self.output_layer = nn.Dense(
                hp.vocab_size, kernel_init=dense_kernel_init(hp.init_scale))

    # -- pieces -------------------------------------------------------------
    def _embed_enc(self, token_ids):
        if self.hparams.tie_embedding_weights:
            return self.decoder_embedding(token_ids)
        return self.encoder_embedding(token_ids)

    def _logits(self, h):
        if self.hparams.tie_logit_weights:
            h = self.logit_bottleneck(h)
            return h @ self.decoder_embedding.embedding.T + self.logit_bias
        return self.output_layer(h)

    def encode(self, token_ids):
        """token_ids -> encoder summary vector [B, enc_width]
        (lstm_vae.py:85-98)."""
        x = self._embed_enc(token_ids)
        mask = token_ids != 0
        if self.hparams.transformer_encoder:
            z = self.encoder(x, mask=mask)
            return z.squeeze(-2) if z.shape[-2] == 1 else z.reshape(
                z.shape[0], -1)
        return self.encoder(x, mask=mask, c0=self.encoder_c0)

    def posterior(self, token_ids, get_kl: bool = False):
        return self.q_of_z_given_x(self.encode(token_ids), get_kl=get_kl)

    def _decoder_init(self, z):
        c0 = self.z_to_hidden(z)
        return [(jnp.tanh(c0), c0)] * self.hparams.num_layers

    def reconstruct_hidden(self, token_ids, z):
        """Teacher-forced decoder states given z (lstm_vae.py:149-170): z is
        concatenated to every embedding and also initializes (h0, c0)."""
        x = self.drop(self.decoder_embedding(token_ids))
        zb = jnp.broadcast_to(z[..., None, :],
                              (*x.shape[:-1], z.shape[-1]))
        x = jnp.concatenate([x, zb], axis=-1)
        hs, _ = self.decoder(x, self._decoder_init(z))
        return self.drop(hs)

    def reconstruct(self, token_ids, z):
        """Teacher-forced logits given z."""
        return self._logits(self.reconstruct_hidden(token_ids, z))

    def reconstruct_ll(self, token_ids, z, chunk_size: int = 512):
        """Per-document log p(x|z) [B] with the next-token shift applied and
        logits never fully materialized — the IWAE evaluator's long-batch
        path (at the lstm-benchmark scale, [K, B, L, 32768] logits exceed
        HBM). chunk_size 512: the evaluator vmaps this over sample
        chunks, multiplying the per-chunk logits accordingly."""
        from ..ops.cross_entropy import chunked_sequence_log_likelihood
        hs = self.reconstruct_hidden(token_ids, z)
        labels = jnp.pad(token_ids[:, 1:], ((0, 0), (0, 1)))
        return chunked_sequence_log_likelihood(hs, self._logits, labels,
                                               chunk_size)

    # -- training forward ---------------------------------------------------
    def __call__(self, token_ids):
        """Returns (logits, raw elementwise KL, posterior, z) — the VAE
        objective's contract (vae.py)."""
        q, kl = self.posterior(token_ids, get_kl=True)
        z = q.sample(self.make_rng("sample"))
        logits = self.reconstruct(token_ids, z)
        return logits, kl, q, z

    # -- sampling -----------------------------------------------------------
    def decode_step(self, token, states, z):
        x = self.decoder_embedding(token)
        x = jnp.concatenate([x, z], axis=-1)
        h, states = self.decoder(x, states, single_step=True)
        return self._logits(h), states

    def sample(self, rng, max_length: int, batch_size: int = 1,
               z=None, sampling: SamplingParams = SamplingParams(),
               start_token: int = 1, end_token: int = 2):
        """Unconditional (z ~ N(0,I)) or conditional decode, fully on device
        (lstm_vae.py:172-198). NOTE: the reference refuses to sample while
        kl_weight < 1 (:174-176); that gate lives in the sampling callback
        here, not in the model."""
        z_rng, d_rng = jax.random.split(rng)
        if z is None:
            z = jax.random.normal(
                z_rng, (batch_size, self.hparams.latent_depth))
        state = init_decode_state(batch_size, max_length, start_token, d_rng)
        carry = self._decoder_init(z)

        def logits_fn(st: DecodeState, rnn_states):
            logits, rnn_states = self.decode_step(
                prev_tokens(st), rnn_states, z)
            return logits, rnn_states

        state, _ = decode_loop(state, logits_fn, carry, sampling, end_token)
        return final_output(state)

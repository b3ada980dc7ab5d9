"""The flagship Transformer VAE.

Flax re-design of /root/reference/sparse_vae/transformer_vae.py: a Perceiver
encoder over the shared input embedding (num_layers/2 layers, 64 latents,
bottleneck 1, :34-36) feeding a ConditionalGaussian posterior, and the causal
decoder with per-layer z-injection — each layer's input has its first ([CLS])
position replaced by a projection of z (:37-40,88-91). Evaluation uses the
IWAE estimator (100 samples x 100 iters, :71-79); sampling injects z at step
1 of every layer inside the on-device decode loop (:117-121).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .base import dense_kernel_init
from .conditional_gaussian import ConditionalGaussian
from .generation import (DecodeState, SamplingParams, decode_loop,
                         final_output, init_decode_state, prev_tokens)
from .perceiver import Perceiver
from .transformer_lm import TransformerHparams, TransformerLanguageModel
from .vae import ContinuousVAEHparams


@dataclass
class TransformerVAEHparams(TransformerHparams, ContinuousVAEHparams):
    """transformer_vae.py:16-23."""
    latent_depth: int = 64
    num_encoder_latents: int = 64
    early_stopping_metric: str = "val_nll"


def z_projection_module(hp, dtype, name=None):
    """One per-layer z-injection Dense exactly as setup() declares them —
    shared with the pipeline stage function (parallel/pp.py) so the
    projection configuration can never drift between the production and
    pipelined decoders."""
    return nn.Dense(hp.d_model, kernel_init=dense_kernel_init(hp.init_scale),
                    dtype=dtype, name=name)


class TransformerVAE(TransformerLanguageModel):
    hparams: TransformerVAEHparams

    def setup(self):
        super().setup()
        hp = self.hparams
        # Encoder shares the input embedding with the decoder (:30-31);
        # Perceiver compresses to one bottleneck vector (:34-36).
        self.encoder = Perceiver(
            num_layers=max(2, hp.num_layers // 2),
            num_latents=hp.num_encoder_latents,
            d_model=hp.d_model, bottleneck_width=1,
            init_scale=hp.init_scale, dtype=self.dtype,
            tp_size=hp.tp_size, sp_size=hp.sp_size)
        self.q_of_z_given_x = ConditionalGaussian(
            hp.latent_depth, init_scale=hp.init_scale)
        self.z_projections = [
            z_projection_module(hp, self.dtype, name=f"z_projection_{i}")
            for i in range(hp.num_layers)
        ]

    # -- encoder ------------------------------------------------------------
    def encode(self, token_ids, deterministic: bool = True):
        """token_ids -> [B, 1, d_model] encoder bottleneck (:44-46)."""
        x = self.embed(token_ids, deterministic)
        mask = token_ids != 0
        return self.encoder(x, mask=mask, deterministic=deterministic)

    def posterior(self, token_ids, get_kl: bool = False,
                  deterministic: bool = True):
        return self.q_of_z_given_x(self.encode(token_ids, deterministic),
                                   get_kl=get_kl)

    # -- decoder ------------------------------------------------------------
    def reconstruct_hidden(self, token_ids, z, deterministic: bool = True):
        """Decoder stack with z injected by replacing position 0 at every
        layer (:85-93). z: [B, 1, latent_depth]. Returns pre-head hidden.

        Under sequence parallelism absolute position 0 lives on 'seq'
        shard 0 only; the other shards still see z through the attention
        collectives (the [CLS] block broadcast carries the z-replaced
        position's K/V — and its gradient — to every shard)."""
        sp = getattr(self.hparams, "sp_size", 1) > 1
        on_first = (jax.lax.axis_index("seq") == 0) if sp else True
        x = self.embed(token_ids, deterministic)
        mask = token_ids != 0
        for i, layer in enumerate(self.decoder_layers):
            z_hidden = jnp.broadcast_to(
                self.z_projections[i](z.astype(self.dtype)),
                (x.shape[0], 1, x.shape[-1]))
            injected = jnp.concatenate([z_hidden, x[..., 1:, :]], axis=-2)
            x = injected if not sp else jnp.where(on_first, injected, x)
            x = layer(x, None, mask, None, deterministic)
        return x

    def reconstruct(self, token_ids, z, deterministic: bool = True):
        return self.project(
            self.reconstruct_hidden(token_ids, z, deterministic))

    def reconstruct_ll(self, token_ids, z, deterministic: bool = True):
        """Per-document log p(x|z) [B] with the next-token shift applied and
        logits never fully materialized — the long-document path for the
        IWAE / DReG estimators (test.py runs the pg19 preset through this).

        Under sequence parallelism each shard's row sums cover its token
        slice; one psum (true-adjoint collective, parallel/sp.py) makes the
        return the GLOBAL per-document value on every shard — which is what
        lets the multi-sample IWAE/DReG bound (nonlinear in the per-doc ll)
        run on a 'seq' mesh."""
        h = self.reconstruct_hidden(token_ids, z, deterministic)
        ll = self.sequence_ll_rows(h, self.labels_for(token_ids))
        if getattr(self.hparams, "sp_size", 1) > 1:
            from ..parallel.sp import sum_over_shards
            ll = sum_over_shards(ll, "seq")
        return ll

    def posterior_and_z(self, token_ids, deterministic: bool = True):
        """(posterior, kl, z) with z drawn from the SAME flax 'sample'
        stream (same fold: posterior first, then the module's first
        make_rng) as forward_chunked_nll/__call__ — lets the pipeline-
        parallel step (parallel/pp.py) reproduce the production step's z
        bitwise while running the encoder separately from the staged
        decoder."""
        q, kl = self.posterior(token_ids, get_kl=True,
                               deterministic=deterministic)
        return q, kl, q.sample(self.make_rng("sample"))

    # -- training forward (VAEObjective contract) ---------------------------
    def __call__(self, token_ids, deterministic: bool = True):
        q, kl = self.posterior(token_ids, get_kl=True,
                               deterministic=deterministic)
        z = q.sample(self.make_rng("sample"))
        logits = self.reconstruct(token_ids, z, deterministic)
        return logits, kl, q, z

    def forward_chunked_nll(self, token_ids, deterministic: bool = True):
        """Training forward that never materializes full logits: returns
        (nll_sum, token_count, kl, posterior, z). For long documents."""
        q, kl = self.posterior(token_ids, get_kl=True,
                               deterministic=deterministic)
        z = q.sample(self.make_rng("sample"))
        h = self.reconstruct_hidden(token_ids, z, deterministic)
        nll_sum, count = self.sequence_nll(h, self.labels_for(token_ids))
        return nll_sum, count, kl, q, z

    # -- sampling -----------------------------------------------------------
    def decode_step_z(self, token, caches, index, z):
        """decode_step with z replacing the [CLS] input at index 0 of every
        layer (:117-121)."""
        x = self.embed(token[:, None])
        # Dead rows feed [PAD]=0 — keep them out of MoE expert capacity
        # (see TransformerLanguageModel.decode_step).
        mask = (token != 0)[:, None]
        new_caches = []
        for i, (layer, cache) in enumerate(zip(self.decoder_layers, caches)):
            x = jnp.where(index == 0,
                          self.z_projections[i](z.astype(self.dtype)), x)
            x, cache = layer.decode(x, cache, index, mask=mask)
            new_caches.append(cache)
        return self.project(x[:, 0]), new_caches

    def decode_chunk_z(self, tokens, caches, index, z):
        """C-token speculative-verification peek with the z-injected input
        (see TransformerLanguageModel.decode_chunk): a chunk position at
        absolute index 0 gets its layer's z projection instead of the token
        embedding, matching decode_step_z. No cache commit — returns
        (logits [B, C, V], kvs) for commit_chunk."""
        x = self.embed(tokens)
        mask = tokens != 0
        c = tokens.shape[1]
        first = (index + jnp.arange(c) == 0)[None, :, None]
        kvs = []
        for i, (layer, cache) in enumerate(zip(self.decoder_layers, caches)):
            zh = self.z_projections[i](z.astype(self.dtype))     # [B, 1, D]
            x = jnp.where(first, zh, x)
            x, kv = layer.decode_chunk(x, cache, index, mask=mask)
            kvs.append(kv)
        return self.project(x), kvs

    def commit_chunk(self, caches, kvs, index, m):
        return [layer.commit_chunk(cache, kv, index, m)
                for layer, cache, kv in zip(self.decoder_layers, caches,
                                            kvs)]

    def decode_step_z_rowwise(self, token, caches, index, z):
        """decode_step_z with PER-ROW positions: rows at position 0 get
        their z projection as the layer input (each row carries its OWN
        document's z — continuous batching refills it per document)."""
        x = self.embed(token[:, None])
        # Rows at position 0 consume their z projection (a real input);
        # other [PAD]-fed rows are dead and stay out of MoE capacity.
        mask = ((token != 0) | (index == 0))[:, None]
        first = (index == 0)[:, None, None]
        new_caches = []
        for i, (layer, cache) in enumerate(zip(self.decoder_layers, caches)):
            zh = jnp.broadcast_to(
                self.z_projections[i](z.astype(self.dtype)),
                (x.shape[0], 1, x.shape[-1]))
            x = jnp.where(first, zh, x)
            x, cache = layer.decode_rowwise(x, cache, index, mask=mask)
            new_caches.append(cache)
        return self.project(x[:, 0]), new_caches

    def sample(self, rng, max_length: int, batch_size: int = 1, z=None,
               sampling: SamplingParams = SamplingParams(),
               start_token: int = 1, end_token: int = 2,
               fused_select: bool = False, interpret: bool = False):
        """Unconditional (z ~ N(0, I)) or conditional generation, one device
        computation (:95-128). The reference's kl_weight<1 refusal gate lives
        in the sampling callback. fused_select: see
        TransformerLanguageModel.sample."""
        z_rng, d_rng = jax.random.split(rng)
        if z is None:
            z = jax.random.normal(
                z_rng, (batch_size, 1, self.hparams.latent_depth))
        state = init_decode_state(batch_size, max_length, start_token, d_rng)
        caches = self.init_caches(batch_size, max_length)

        def logits_fn(st: DecodeState, caches):
            logits, caches = self.decode_step_z(
                prev_tokens(st), caches, st.index - 1, z)
            return logits.astype(jnp.float32), caches

        state, _ = decode_loop(state, logits_fn, caches, sampling, end_token,
                               fused_select=fused_select, interpret=interpret)
        return final_output(state)

    def sample_resumable(self, rng, max_length: int, batch_size: int = 1,
                         z=None, sampling: SamplingParams = SamplingParams(),
                         start_token: int = 1, end_token: int = 2,
                         state=None, caches=None, max_steps=None,
                         fused_select: bool = False,
                         interpret: bool = False):
        """Bounded-slice AR sampling for very long documents (the pg19
        preset's 102,400 tokens): decodes at most `max_steps` tokens and
        returns (state, caches) to pass back in. Given the same z and the
        returned state/caches, slicing is exactly equivalent to one-shot
        `sample` (tested). Memory stays O(window) via the block-ring KV
        cache. z is REQUIRED across resumed calls (pass the first call's)."""
        if z is None:
            z = jax.random.normal(
                jax.random.split(rng)[0],
                (batch_size, 1, self.hparams.latent_depth))
        if state is None:
            state = init_decode_state(batch_size, max_length, start_token,
                                      jax.random.split(rng)[1])
        if caches is None:
            caches = self.init_caches(batch_size, max_length)

        def logits_fn(st: DecodeState, caches):
            logits, caches = self.decode_step_z(
                prev_tokens(st), caches, st.index - 1, z)
            return logits.astype(jnp.float32), caches

        state, caches = decode_loop(state, logits_fn, caches, sampling,
                                    end_token, max_steps=max_steps,
                                    fused_select=fused_select,
                                    interpret=interpret)
        return state, caches, z

    def window_hidden_z(self, win_tokens, caches, start, z):
        """Active-window decoder pass with the per-layer z-injection: when
        the window still contains absolute position 0, each layer's input at
        local position 0 is replaced by its z projection (:117-121)."""
        x = self.embed(win_tokens)
        # [PAD] window guesses stay out of MoE capacity; exact at the
        # Jacobi fixed point, where every committed token is non-PAD.
        mask = win_tokens != 0
        kvs = []
        for i, (layer, cache) in enumerate(zip(self.decoder_layers, caches)):
            zh = jnp.broadcast_to(
                self.z_projections[i](z.astype(self.dtype)),
                (x.shape[0], 1, x.shape[-1]))
            x = jnp.where(start == 0,
                          jnp.concatenate([zh, x[:, 1:]], axis=1), x)
            x, kv = layer.window_decode(x, cache, start, mask=mask)
            kvs.append(kv)
        return x, tuple(kvs)

    def frontier_generate(self, rng, length: int, batch_size: int = 1,
                          z=None, sampling: SamplingParams = SamplingParams(),
                          start_token: int = 1, end_token: int = 2,
                          window_tokens: int = 512,
                          max_iters: Optional[int] = None,
                          fused_select: bool = False,
                          interpret: bool = False,
                          draft_ngram: int = 0):
        """Frontier-windowed non-AR generation from z (see
        TransformerLanguageModel.frontier_generate)."""
        if not self.hparams.sparse_self_attention:
            raise ValueError("frontier_generate requires the sparse "
                             "sliding-window attention configuration")
        from .parallel_decode import (frontier_jacobi_decode,
                                      push_window_blocks)
        z_rng, d_rng = jax.random.split(rng)
        if z is None:
            z = jax.random.normal(
                z_rng, (batch_size, 1, self.hparams.latent_depth))
        bs = self.hparams.attn_block_size

        tokens, iters = frontier_jacobi_decode(
            lambda w, c, f: self.window_hidden_z(w, c, f, z), self.project,
            lambda c, kvs, f: push_window_blocks(c, kvs, f, bs),
            self.init_window_caches(batch_size),
            batch_size, length, d_rng, sampling, start_token, end_token,
            window_tokens, bs, max_iters, fused_select, interpret,
            draft_ngram)
        return tokens[:, 1:], iters

    def speculative_generate(self, rng, length: int, batch_size: int = 1,
                             z=None,
                             sampling: SamplingParams = SamplingParams(),
                             start_token: int = 1, end_token: int = 2,
                             window_tokens: int = 512,
                             max_iters: Optional[int] = None,
                             draft_ngram: int = 3):
        """Frontier speculative SAMPLING from z (see
        TransformerLanguageModel.speculative_generate)."""
        if not self.hparams.sparse_self_attention:
            raise ValueError("speculative_generate requires the sparse "
                             "sliding-window attention configuration")
        from .parallel_decode import (frontier_speculative_decode,
                                      push_window_blocks)
        z_rng, d_rng = jax.random.split(rng)
        if z is None:
            z = jax.random.normal(
                z_rng, (batch_size, 1, self.hparams.latent_depth))
        bs = self.hparams.attn_block_size

        tokens, iters = frontier_speculative_decode(
            lambda w, c, f: self.window_hidden_z(w, c, f, z), self.project,
            lambda c, kvs, f: push_window_blocks(c, kvs, f, bs),
            self.init_window_caches(batch_size),
            batch_size, length, d_rng, sampling, start_token, end_token,
            window_tokens, bs, max_iters, draft_ngram)
        return tokens[:, 1:], iters

    def spec_draft_generate(self, rng, length: int, draft_propose,
                            draft_init_state, z=None,
                            sampling: SamplingParams = SamplingParams(),
                            start_token: int = 1, end_token: int = 2,
                            draft_k: int = 8,
                            max_iters: Optional[int] = None):
        """Draft-MODEL speculative sampling from z (models/spec_decode.py):
        a cheaper trained model proposes draft_k tokens per pass
        (draft_propose/draft_init_state — e.g. LSTMLanguageModel.
        draft_propose bound to its own checkpoint), this model verifies
        them in one chunked decode against the production ring cache.
        Distribution-exact w.r.t. THIS model's modified sampling
        distribution. Batch 1. Returns (tokens [1, length-1], passes,
        accepted_draft_tokens)."""
        from .spec_decode import chunk_speculative_decode
        z_rng, d_rng = jax.random.split(rng)
        if z is None:
            z = jax.random.normal(z_rng, (1, 1, self.hparams.latent_depth))
        caches = self.init_caches(1, length + draft_k + 2)
        tokens, iters, accepted = chunk_speculative_decode(
            lambda t, c, i: self.decode_chunk_z(t, c, i, z),
            self.commit_chunk, caches, draft_propose, draft_init_state,
            length, d_rng, sampling, start_token, end_token, draft_k,
            max_iters)
        return tokens[:, 1:], iters, accepted

    def parallel_generate(self, rng, length: int, batch_size: int = 1,
                          z=None, sampling: SamplingParams = SamplingParams(),
                          start_token: int = 1, end_token: int = 2,
                          max_iters: Optional[int] = None,
                          chunk_size: int = 2048, init_tokens=None,
                          fused_select: bool = False,
                          interpret: bool = False):
        """The north-star generation mode: full-document non-AR decoding
        from z in a handful of parallel device passes (Jacobi fixed-point on
        the z-injected decoder; models/parallel_decode.py). The AR `sample`
        is the one-token-per-iteration special case of this map.
        init_tokens ([B, length], incl. start token) resumes a previous
        partially-converged iterate."""
        from .parallel_decode import jacobi_decode

        z_rng, d_rng = jax.random.split(rng)
        if z is None:
            z = jax.random.normal(
                z_rng, (batch_size, 1, self.hparams.latent_depth))

        def hidden_fn(tokens):
            return self.reconstruct_hidden(tokens, z, deterministic=True)

        tokens, iters = jacobi_decode(
            hidden_fn, self.project, batch_size, length, d_rng, sampling,
            start_token, end_token, max_iters, chunk_size, init_tokens,
            fused_select, interpret)
        return tokens[:, 1:], iters

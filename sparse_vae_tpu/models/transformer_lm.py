"""Decoder-only causal transformer language model.

Flax re-design of /root/reference/sparse_vae/core/transformer_language_model.py:
factorized input embedding (d_embedding -> d_model projection when they
differ, :40-48), output head Dense -> GELU -> LayerNorm -> tied logits
(:55-63), causal decoder stack with optional sliding-window block-sparse
self-attention, per-layer gradient rematerialization (jax.checkpoint via
nn.remat), and a fully on-device KV-cache sampling loop replacing the
reference's Python token loop (:97-124). The debug breakpoint()s in the
reference forward (:87,92) are, naturally, not reproduced.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .base import LanguageModelHparams, dense_kernel_init, embed_init
from .generation import (DecodeState, SamplingParams, decode_loop,
                         final_output, init_decode_state, prev_tokens)
from .transformer_layer import TransformerLayer


@dataclass
class TransformerHparams(LanguageModelHparams):
    """transformer_language_model.py:15-30 (+ TPU block geometry)."""
    d_embedding: Optional[int] = None   # None => d_model
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 6
    input_dropout: float = 0.0
    tie_embedding_weights: bool = True
    cross_attention: bool = False
    grad_checkpointing: bool = False
    separate_context_embedding: bool = True
    attn_window_size: int = 2           # in block_size blocks (TPU-native)
    attn_block_size: int = 128
    sparse_self_attention: bool = True
    loss_chunk_size: int = 0            # >0: chunked fused projection+CE
    use_pallas_kernel: bool = True
    precision: str = "fp32"             # 'bf16' for TPU training
    # Rematerialization policy under grad_checkpointing — the TPU-native
    # realization of the reference's broken activation-offload intent
    # (core/__init__.py:1 imports a nonexistent .activation_offload;
    # SURVEY §2.9): 'full' recomputes everything, 'dots' saves matmul
    # outputs (recompute only elementwise), 'offload' checkpoints dot
    # outputs to host memory instead of recomputing.
    remat_policy: str = "full"  # 'full'|'dots'|'dots_attn'|'dots_attn_qkv'|'offload'
    # Tensor parallelism: set (via parallel.tp.tp_localize) ONLY on the
    # per-shard twin module that runs inside shard_map on a 2-D mesh —
    # attention heads + FFN inner dim sharded over 'model'. The global
    # module (init / eval outside shard_map / sampling) keeps tp_size=1.
    tp_size: int = 1
    # Sequence parallelism: set (via parallel.sp.sp_localize) only on the
    # per-shard twin running inside shard_map on a mesh with a 'seq' axis —
    # the LENGTH axis of every batch is sharded; sparse decoder layers
    # exchange a window-band halo + [CLS] broadcast, the Perceiver combines
    # softmax partials, labels shift across shard boundaries. The scaling
    # axis for the pg19 long-document regime (batch 1 x 102,400 tokens).
    sp_size: int = 1
    # Mixture-of-Experts decoder FFNs (models/moe.py; beyond-reference):
    # num_experts > 1 swaps every decoder layer's dense FFN for E expert
    # FFNs behind a learned top-k router, with the load-balance and router
    # z losses weighted below (0 disables a term). ep_size is set only on
    # the expert-parallel twin (parallel.ep.ep_localize) running inside
    # shard_map on a mesh with an 'expert' axis.
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 1e-2
    moe_zloss_weight: float = 1e-3
    ep_size: int = 1


def decoder_layer_module(hp, dtype, cls=TransformerLayer, name=None):
    """One decoder TransformerLayer exactly as setup() declares them —
    shared with the pipeline stage function (parallel/pp.py) so the layer
    configuration can never drift between the production and pipelined
    decoders. `cls` admits the nn.remat-wrapped class."""
    return cls(d_model=hp.d_model, num_heads=hp.num_heads, causal=True,
               sparse_self_attention=hp.sparse_self_attention,
               window_size=hp.attn_window_size,
               block_size=hp.attn_block_size,
               use_cross_attention=hp.cross_attention,
               use_pallas_kernel=hp.use_pallas_kernel, dtype=dtype,
               tp_size=hp.tp_size, sp_size=hp.sp_size,
               num_experts=getattr(hp, "num_experts", 0),
               moe_top_k=getattr(hp, "moe_top_k", 2),
               moe_capacity_factor=getattr(hp, "moe_capacity_factor", 1.25),
               ep_size=getattr(hp, "ep_size", 1), name=name)


def checkpoint_policy(name: str):
    """Named rematerialization policy for grad_checkpointing — shared by the
    model's own nn.remat decoder layers (setup below) and the pipeline-
    parallel stage function (parallel/pp.py), so `remat_policy` means the
    same thing on every execution path. See TransformerHparams.remat_policy
    for what each saves."""
    cp = jax.checkpoint_policies
    policies = {
        "full": None,  # recompute everything (jax default)
        "dots": cp.dots_saveable,
        # The Pallas attention custom calls are not dots, so 'dots'
        # recomputes them (plus their boundary layout copies) in the
        # backward pass — ~20 ms/step at the bench shape. These save
        # the named attention tensors too (ops/attention.py __call__):
        # 'dots_attn' the kernel output (~100 MB/layer at 8x12800),
        # 'dots_attn_qkv' also the head-major q/k/v (+300 MB/layer).
        "dots_attn": cp.save_from_both_policies(
            cp.dots_saveable, cp.save_only_these_names("attn_out")),
        "dots_attn_qkv": cp.save_from_both_policies(
            cp.dots_saveable,
            cp.save_only_these_names("attn_out", "attn_qkv")),
        "offload": cp.offload_dot_with_no_batch_dims(
            "device", "pinned_host"),
    }
    if name not in policies:
        raise ValueError(f"remat_policy {name!r} not in "
                         f"{sorted(policies)}")
    return policies[name]


class TransformerLanguageModel(nn.Module):
    hparams: TransformerHparams

    @property
    def dtype(self):
        return jnp.bfloat16 if self.hparams.precision == "bf16" \
            else jnp.float32

    @property
    def shard_vocab(self) -> bool:
        """Tied embedding/head sharded over the vocab dim (TP twin only;
        parallel.tp.shards_vocab)."""
        from ..parallel.tp import shards_vocab
        return shards_vocab(self.hparams, self.hparams.tp_size)

    def setup(self):
        hp = self.hparams
        d_embedding = hp.d_embedding or hp.d_model
        vocab_local = (hp.vocab_size // hp.tp_size if self.shard_vocab
                       else hp.vocab_size)
        self.input_embedding = nn.Embed(
            vocab_local, d_embedding,
            embedding_init=embed_init(hp.init_scale))
        self.embedding_projection = (
            nn.Dense(hp.d_model, kernel_init=dense_kernel_init(hp.init_scale),
                     dtype=self.dtype)
            if d_embedding != hp.d_model else None)
        self.input_dropout_layer = nn.Dropout(rate=hp.input_dropout)

        layer_cls = TransformerLayer
        if hp.grad_checkpointing:
            layer_cls = nn.remat(TransformerLayer,
                                 static_argnums=(5,),  # deterministic flag
                                 # (self is arg 0 in flax remat numbering)
                                 policy=checkpoint_policy(hp.remat_policy))
        else:
            checkpoint_policy(hp.remat_policy)  # validate the name anyway
        self.decoder_layers = [
            decoder_layer_module(hp, self.dtype, cls=layer_cls,
                                 name=f"layer_{i}")
            for i in range(hp.num_layers)
        ]

        # Context embedding for the cross-attention path. The reference
        # declared cross_attention + separate_context_embedding hparams
        # (transformer_language_model.py:28-30) but its context forward
        # raised NotImplementedError (:83); here it works: a context token
        # sequence is embedded (own table, or the shared input embedding)
        # and every layer cross-attends to it.
        if hp.cross_attention and hp.separate_context_embedding:
            self.context_embedding = nn.Embed(
                hp.vocab_size, hp.d_model,
                embedding_init=embed_init(hp.init_scale))
        else:
            self.context_embedding = None

        # Output head: Dense -> GELU -> LN -> logits (tied) (:55-63)
        self.head_dense = nn.Dense(
            hp.d_model, kernel_init=dense_kernel_init(hp.init_scale),
            dtype=self.dtype)
        self.head_norm = nn.LayerNorm(dtype=self.dtype)
        tie = hp.tie_embedding_weights and d_embedding == hp.d_model
        self.tie_output = tie
        if not tie:
            self.output_embedding = nn.Dense(
                hp.vocab_size, kernel_init=dense_kernel_init(hp.init_scale),
                dtype=self.dtype)
        else:
            self.output_bias = self.param(
                "output_bias", nn.initializers.zeros, (vocab_local,))

    # -- pieces -------------------------------------------------------------
    def embed(self, token_ids, deterministic: bool = True):
        if self.shard_vocab:
            from ..parallel.tp import vocab_parallel_embed
            x = vocab_parallel_embed(self.input_embedding.embedding,
                                     token_ids, "model").astype(self.dtype)
        else:
            x = self.input_embedding(token_ids).astype(self.dtype)
        if self.embedding_projection is not None:
            x = self.embedding_projection(x)
        return self.input_dropout_layer(x, deterministic=deterministic)

    def pre_logits(self, h):
        """The head before the vocab projection: Dense -> GELU -> LN."""
        return self.head_norm(nn.gelu(self.head_dense(h)))

    def project(self, h, logits_dtype=None):
        """Pre-logits head + output projection; [B, ..., D] -> [..., V]."""
        if self.shard_vocab:
            raise NotImplementedError(
                "full [.., V] logits are never materialized under "
                "vocab-parallel TP; use sequence_nll / sequence_ll_rows "
                "(the chunked paths the objectives already select)")
        h = self.pre_logits(h)
        if self.tie_output:
            table = self.input_embedding.embedding.astype(self.dtype)
            logits = jax.lax.dot_general(
                h, table, (((h.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=logits_dtype or self.dtype)
            return logits + self.output_bias
        out = self.output_embedding(h)
        return out.astype(logits_dtype) if logits_dtype else out

    def sequence_nll(self, hidden, labels):
        """(nll_sum, token_count) over non-pad labels, without ever
        materializing [B, L, V] logits in HBM: the fused Pallas
        projection+CE kernel on TPU (ops/pallas_ce.py), the chunked-scan
        XLA fusion elsewhere (ops/cross_entropy.py) — the TPU answer to the
        reference's robust_cross_entropy (language_model.py:161-170).

        hidden: [B, L', D] decoder states; labels: [B, L'] (0 = pad).
        """
        hp = self.hparams
        if self.shard_vocab:
            return self._vocab_parallel_chunked(hidden, labels,
                                                per_row=False)
        use_fused = (self.tie_output and hp.use_pallas_kernel
                     and jax.default_backend() == "tpu"
                     and hp.vocab_size % 1024 == 0)
        if use_fused:
            from ..ops.pallas_ce import fused_tied_cross_entropy
            b, lp, d = hidden.shape
            # Flatten before the head: keeps every tensor on this path 2-D
            # so XLA doesn't insert layout-conversion copies of the [B,L,D]
            # cotangents between the head fusions and the kernel.
            g = self.pre_logits(hidden.reshape(b * lp, d))
            table = self.input_embedding.embedding.astype(self.dtype)
            nll = fused_tied_cross_entropy(
                g, table, self.output_bias.astype(jnp.float32),
                labels.reshape(b * lp))
            mask = (labels.reshape(-1) != 0).astype(jnp.float32)
            return jnp.sum(nll * mask), jnp.sum(mask)
        from ..ops.cross_entropy import chunked_cross_entropy
        return chunked_cross_entropy(hidden, self.project, labels,
                                     hp.loss_chunk_size or 2048)

    def _vocab_parallel_chunked(self, hidden, labels, per_row: bool):
        """Chunked projection+CE under vocab-parallel TP: per chunk, each
        model shard computes its [tokens, V/tp] logits slice and only the
        softmax statistics cross shards (parallel.tp.tied_vocab_parallel_nll
        — the Megatron vocab-parallel CE). Returns (nll_sum, token_count),
        or per-row NLL sums [B] when per_row."""
        from ..parallel.tp import tied_vocab_parallel_nll
        hp = self.hparams
        b, lp, d = hidden.shape
        cs = min(hp.loss_chunk_size or 2048, lp)
        num = -(-lp // cs)
        pad = num * cs - lp
        if pad:
            hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
            labels = jnp.pad(labels, ((0, 0), (0, pad)))
        h_chunks = hidden.reshape(b, num, cs, d).swapaxes(0, 1)
        l_chunks = labels.reshape(b, num, cs).swapaxes(0, 1)
        table = self.input_embedding.embedding.astype(self.dtype)
        bias = self.output_bias.astype(jnp.float32)

        def body(carry, xs):
            h_c, lab_c = xs                       # [b, cs, d], [b, cs]
            g = self.pre_logits(h_c.reshape(b * cs, d))
            nll = tied_vocab_parallel_nll(g, table, bias,
                                          lab_c.reshape(-1), "model")
            mask = (lab_c.reshape(-1) != 0).astype(jnp.float32)
            contrib = (nll * mask).reshape(b, cs)
            if per_row:
                return carry + jnp.sum(contrib, axis=-1), None
            return (carry[0] + jnp.sum(contrib),
                    carry[1] + jnp.sum(mask)), None

        init = (jnp.zeros((b,), jnp.float32) if per_row
                else (jnp.asarray(0.0), jnp.asarray(0.0)))
        out, _ = jax.lax.scan(body, init, (h_chunks, l_chunks))
        return out

    @staticmethod
    def shifted_labels(token_ids):
        """Next-token labels aligned with the FULL-length hidden states:
        position t's label is token t+1, with [PAD]=0 at the last position
        (masked by every loss here). Passing full-length hidden + these
        labels avoids the h[:, :-1] slice, which XLA materializes as a copy
        of the whole [B, L, D] tensor at the remat boundary."""
        return jnp.pad(token_ids[:, 1:], ((0, 0), (0, 1)))

    def labels_for(self, token_ids):
        """Next-token labels for this module's parallel layout: under
        sequence parallelism each shard's last label is the RIGHT
        neighbor's first token (one ppermute of a single column); otherwise
        the static end-padded shift."""
        if getattr(self.hparams, "sp_size", 1) > 1:
            from ..parallel.sp import sp_shifted_labels
            return sp_shifted_labels(token_ids, self.hparams.sp_size)
        return self.shifted_labels(token_ids)

    def sequence_ll_rows(self, hidden, labels):
        """Per-row summed log p(labels | hidden) over non-pad labels, logits
        never fully materialized — the per-document statistic the IWAE /
        DReG estimators need at long context (continuous_autoencoder.py:83-88
        did a full-logit gather). hidden: [B, L', D]; labels: [B, L']."""
        hp = self.hparams
        if self.shard_vocab:
            return -self._vocab_parallel_chunked(hidden, labels,
                                                 per_row=True)
        use_fused = (self.tie_output and hp.use_pallas_kernel
                     and jax.default_backend() == "tpu"
                     and hp.vocab_size % 1024 == 0)
        if use_fused:
            from ..ops.pallas_ce import fused_tied_cross_entropy
            b, lp, d = hidden.shape
            g = self.pre_logits(hidden.reshape(b * lp, d))
            table = self.input_embedding.embedding.astype(self.dtype)
            nll = fused_tied_cross_entropy(
                g, table, self.output_bias.astype(jnp.float32),
                labels.reshape(b * lp)).reshape(b, lp)
            mask = (labels != 0).astype(jnp.float32)
            return -jnp.sum(nll * mask, axis=-1)
        from ..ops.cross_entropy import chunked_sequence_log_likelihood
        return chunked_sequence_log_likelihood(
            hidden, self.project, labels, self.hparams.loss_chunk_size
            or 2048)

    def embed_context(self, context_ids, deterministic: bool = True):
        """[B, Lc] context tokens -> [B, Lc, D] for cross-attention."""
        if self.context_embedding is not None:
            return self.context_embedding(context_ids).astype(self.dtype)
        return self.embed(context_ids, deterministic)

    def forward_hidden(self, token_ids, deterministic: bool = True,
                       context_ids=None):
        """Decoder stack output before the logits head — the chunked-CE
        entry point for long documents. context_ids: optional [B, Lc]
        context tokens each layer cross-attends to (requires
        cross_attention=True)."""
        x = self.embed(token_ids, deterministic)
        mask = token_ids != 0
        context, context_mask = None, None
        if context_ids is not None:
            if not self.hparams.cross_attention:
                raise ValueError("context requires cross_attention=True")
            context = self.embed_context(context_ids, deterministic)
            context_mask = context_ids != 0
        for layer in self.decoder_layers:
            x = layer(x, context, mask, context_mask, deterministic)
        return x

    def __call__(self, token_ids, deterministic: bool = True,
                 context_ids=None):
        return self.project(self.forward_hidden(token_ids, deterministic,
                                                context_ids))

    # -- sampling -----------------------------------------------------------
    def init_caches(self, batch_size: int, max_length: int):
        return [layer.init_cache(batch_size, max_length)
                for layer in self.decoder_layers]

    def decode_step(self, token, caches, index):
        x = self.embed(token[:, None])
        # Finished rows feed [PAD]=0 every remaining step; exclude them
        # from MoE dispatch so they cannot drop live rows' tokens by
        # consuming expert capacity (the mask is free for dense FFNs).
        mask = (token != 0)[:, None]
        new_caches = []
        for layer, cache in zip(self.decoder_layers, caches):
            x, cache = layer.decode(x, cache, index, mask=mask)
            new_caches.append(cache)
        return self.project(x[:, 0]), new_caches

    def decode_chunk(self, tokens, caches, index):
        """C-token speculative-verification peek: logits for every chunk
        position WITHOUT committing the caches (models/spec_decode.py).

        tokens: [B, C] at absolute positions index..index+C-1 (caches
        committed through index-1). Returns (logits [B, C, V], kvs) where
        kvs feeds commit_chunk once the accepted prefix length is known.
        Row i's logits decide the token at position index+i+1 — identical
        to C sequential decode_step calls (tested)."""
        x = self.embed(tokens)
        mask = tokens != 0
        kvs = []
        for layer, cache in zip(self.decoder_layers, caches):
            x, kv = layer.decode_chunk(x, cache, index, mask=mask)
            kvs.append(kv)
        return self.project(x), kvs

    def commit_chunk(self, caches, kvs, index, m):
        """Commit the first m tokens of a decode_chunk peek (see
        Attention.commit_chunk — rejected drafts are never written)."""
        return [layer.commit_chunk(cache, kv, index, m)
                for layer, cache, kv in zip(self.decoder_layers, caches,
                                            kvs)]

    def draft_propose(self, state, last_token, rng, k: int,
                      temperature: float = 1.0):
        """Draft k tokens for speculative decoding when THIS model is the
        cheap draft (see LSTMLanguageModel.draft_propose for the contract).

        state = (caches, index): the decode caches consumed through
        index-1. Sparse (ring-cache) configurations are the natural draft
        — the stacked rewind states are O(window) per entry; a dense-cache
        draft stacks k+1 full [B, H, max_length, Dh] copies and is only
        sensible for short lengths. Returns (drafts [B, k],
        q_logp [B, k, V], state stack with k+1 entries)."""
        def step(carry, rng_i):
            (caches, index), tok = carry[0], carry[1]
            logits, caches2 = self.decode_step(tok, caches, index)
            logp = jax.nn.log_softmax(
                logits.astype(jnp.float32) / temperature)
            nxt = jax.random.categorical(rng_i, logp).astype(jnp.int32)
            st2 = (tuple(caches2), index + 1)
            return (st2, nxt), (nxt, logp, st2)

        caches, index = state
        rngs = jax.random.split(rng, k + 1)
        _, (toks, logps, states) = jax.lax.scan(
            step, ((tuple(caches), index), last_token), rngs)
        drafts = jnp.transpose(toks[:k])
        q_logp = jnp.transpose(logps[:k], (1, 0, 2))
        return drafts, q_logp, states

    def draft_init_state(self, batch_size: int, max_length: int):
        """Initial (caches, index) draft state (draft_propose)."""
        return (tuple(self.init_caches(batch_size, max_length)),
                jnp.asarray(0, jnp.int32))

    def decode_step_rowwise(self, token, caches, index):
        """decode_step with PER-ROW positions (index: [B] int32) — the
        continuous-batching step (serving.py)."""
        x = self.embed(token[:, None])
        mask = (token != 0)[:, None]
        new_caches = []
        for layer, cache in zip(self.decoder_layers, caches):
            x, cache = layer.decode_rowwise(x, cache, index, mask=mask)
            new_caches.append(cache)
        return self.project(x[:, 0]), new_caches

    def sample(self, rng, max_length: int, batch_size: int = 1,
               sampling: SamplingParams = SamplingParams(),
               start_token: int = 1, end_token: int = 2,
               fused_select: bool = False, interpret: bool = False):
        """AR sampling with explicit KV caches inside one lax.while_loop
        (replaces Attention.kv_cache class-state, attention.py:148-162).
        fused_select=True selects nucleus-sampled tokens with the
        VMEM-resident kernel — one HBM read of the [B, V] logits per step
        instead of ~24 bisection sweeps; the lever for mass-sampling
        batch sizes (sample.py)."""
        state = init_decode_state(batch_size, max_length, start_token, rng)
        caches = self.init_caches(batch_size, max_length)

        def logits_fn(st: DecodeState, caches):
            logits, caches = self.decode_step(
                prev_tokens(st), caches, st.index - 1)
            return logits.astype(jnp.float32), caches

        state, _ = decode_loop(state, logits_fn, caches, sampling, end_token,
                               fused_select=fused_select, interpret=interpret)
        return final_output(state)

    def sample_resumable(self, rng, max_length: int, batch_size: int = 1,
                         sampling: SamplingParams = SamplingParams(),
                         start_token: int = 1, end_token: int = 2,
                         state=None, caches=None, max_steps=None,
                         fused_select: bool = False,
                         interpret: bool = False):
        """Bounded-slice AR sampling (see TransformerVAE.sample_resumable):
        decode at most max_steps tokens per device execution and pass the
        returned (state, caches) back in to continue."""
        if state is None:
            state = init_decode_state(batch_size, max_length, start_token,
                                      rng)
        if caches is None:
            caches = self.init_caches(batch_size, max_length)

        def logits_fn(st: DecodeState, caches):
            logits, caches = self.decode_step(
                prev_tokens(st), caches, st.index - 1)
            return logits.astype(jnp.float32), caches

        return decode_loop(state, logits_fn, caches, sampling, end_token,
                           max_steps=max_steps, fused_select=fused_select,
                           interpret=interpret)

    # -- frontier-windowed parallel decoding --------------------------------
    def init_window_caches(self, batch_size: int):
        return [layer.init_window_cache(batch_size)
                for layer in self.decoder_layers]

    def window_hidden(self, win_tokens, caches, start):
        """Active-window decoder pass (frontier Jacobi): [B, W] tokens at
        absolute positions start.. -> ([B, W, D] hidden, per-layer window
        (k, v))."""
        x = self.embed(win_tokens)
        # [PAD] window guesses stay out of MoE capacity; exact at the
        # Jacobi fixed point, where every committed token is non-PAD.
        mask = win_tokens != 0
        kvs = []
        for layer, cache in zip(self.decoder_layers, caches):
            x, kv = layer.window_decode(x, cache, start, mask=mask)
            kvs.append(kv)
        return x, tuple(kvs)

    def frontier_generate(self, rng, length: int, batch_size: int = 1,
                          sampling: SamplingParams = SamplingParams(),
                          start_token: int = 1, end_token: int = 2,
                          window_tokens: int = 512,
                          max_iters: Optional[int] = None,
                          fused_select: bool = False,
                          interpret: bool = False,
                          draft_ngram: int = 0):
        """Non-AR generation with per-pass cost independent of document
        length: Jacobi iteration restricted to an active window at the
        convergence frontier (models/parallel_decode.frontier_jacobi_decode).
        draft_ngram > 0 enables suffix-match (prompt-lookup) drafting of
        the window initialization. Sparse (sliding-window) models only.
        Returns (tokens [B, length-1] sans start token, iterations)."""
        if not self.hparams.sparse_self_attention:
            raise ValueError("frontier_generate requires the sparse "
                             "sliding-window attention configuration")
        from .parallel_decode import (frontier_jacobi_decode,
                                      push_window_blocks)
        bs = self.hparams.attn_block_size

        tokens, iters = frontier_jacobi_decode(
            self.window_hidden, self.project,
            lambda c, kvs, f: push_window_blocks(c, kvs, f, bs),
            self.init_window_caches(batch_size),
            batch_size, length, rng, sampling, start_token, end_token,
            window_tokens, bs, max_iters, fused_select, interpret,
            draft_ngram)
        return tokens[:, 1:], iters

    def speculative_generate(self, rng, length: int, batch_size: int = 1,
                             sampling: SamplingParams = SamplingParams(),
                             start_token: int = 1, end_token: int = 2,
                             window_tokens: int = 512,
                             max_iters: Optional[int] = None,
                             draft_ngram: int = 3):
        """SAMPLED non-AR generation: frontier speculative verification
        (models/parallel_decode.frontier_speculative_decode). The window is
        the draft; accepted tokens are free, the first rejection resamples
        from the residual — the output is an exact sample of the AR
        sampling distribution (not the AR loop's trajectory for this rng;
        at temperature 0 the two coincide and equal greedy decoding).
        Sparse (sliding-window) models only. Returns (tokens [B, length-1]
        sans start token, iterations)."""
        if not self.hparams.sparse_self_attention:
            raise ValueError("speculative_generate requires the sparse "
                             "sliding-window attention configuration")
        from .parallel_decode import (frontier_speculative_decode,
                                      push_window_blocks)
        bs = self.hparams.attn_block_size

        tokens, iters = frontier_speculative_decode(
            self.window_hidden, self.project,
            lambda c, kvs, f: push_window_blocks(c, kvs, f, bs),
            self.init_window_caches(batch_size),
            batch_size, length, rng, sampling, start_token, end_token,
            window_tokens, bs, max_iters, draft_ngram)
        return tokens[:, 1:], iters

    def spec_draft_generate(self, rng, length: int, draft_propose,
                            draft_init_state,
                            sampling: SamplingParams = SamplingParams(),
                            start_token: int = 1, end_token: int = 2,
                            draft_k: int = 8,
                            max_iters: Optional[int] = None):
        """Draft-MODEL speculative sampling (models/spec_decode.py): a
        cheaper trained model proposes draft_k tokens per pass, this model
        verifies them in one chunked decode against the production KV
        cache (ring or dense). Distribution-exact w.r.t. this model's
        modified sampling distribution. Batch 1. Returns
        (tokens [1, length-1], passes, accepted_draft_tokens)."""
        from .spec_decode import chunk_speculative_decode
        caches = self.init_caches(1, length + draft_k + 2)
        tokens, iters, accepted = chunk_speculative_decode(
            self.decode_chunk, self.commit_chunk, caches, draft_propose,
            draft_init_state, length, rng, sampling, start_token,
            end_token, draft_k, max_iters)
        return tokens[:, 1:], iters, accepted

    def parallel_generate(self, rng, length: int, batch_size: int = 1,
                          sampling: SamplingParams = SamplingParams(),
                          start_token: int = 1, end_token: int = 2,
                          max_iters: Optional[int] = None,
                          chunk_size: int = 2048, init_tokens=None,
                          fused_select: bool = False,
                          interpret: bool = False):
        """Non-AR full-document generation: Jacobi fixed-point iteration on
        the teacher-forcing forward (models/parallel_decode.py). Every
        iteration is one parallel device pass; converges to the exact AR
        sample. Returns (tokens [B, length-1] sans start token, iters).
        init_tokens ([B, length], incl. start token) resumes a previous
        partially-converged iterate."""
        from .parallel_decode import jacobi_decode

        def hidden_fn(tokens):
            return self.forward_hidden(tokens, deterministic=True)

        tokens, iters = jacobi_decode(
            hidden_fn, self.project, batch_size, length, rng, sampling,
            start_token, end_token, max_iters, chunk_size, init_tokens,
            fused_select, interpret)
        return tokens[:, 1:], iters

"""Draft-MODEL speculative decoding with chunked verification.

The measured sampled-mode ceiling (BASELINE.md "Sampled speculative: the
acceptance ceiling, measured"): history-based drafts accept ~1.004
tokens/pass on prose — draft AVAILABILITY, not verification cost, is what
starves the frontier speculative decoder. This module supplies drafts from
a second, cheaper trained model (the classic two-model scheme of
speculative sampling), and replaces the W-wide window verification pass
(2.36 ms at d512, 10.7x an AR step) with a narrow C=K+1-token chunk
verification against the production ring/dense KV caches — so the
crossover needs only a few accepted tokens per pass instead of >10.

Exactness contract: the output is an exact sample from the TARGET model's
modified sampling distribution (temperature / top-k / top-p / repetition
penalty — identical pipeline to the AR sampler). Drafted token d ~ q is
accepted with probability min(1, p(d)/q(d)); the first rejection resamples
from the residual max(p - q, 0)/Z (Leviathan et al. 2023); if the whole
chunk is accepted the bonus token is sampled from the target's last row
for free. Every pass uses FRESH randomness — unlike the window decoder
(parallel_decode.frontier_speculative_decode) nothing is ever re-verified,
so there is no coin-reuse subtlety. Cache rewind is free: the target's
position-addressed caches commit only the accepted prefix
(ops/attention.py::commit_chunk), and the draft model's state stack is
indexed at the accepted length.

No reference counterpart (/root/reference has AR generation only —
generation_utils.py); this is a TPU-native serving lever.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .generation import SamplingParams
from .parallel_decode import (_chunk_repetition_penalty, _filter_logits,
                              _mask_after_end)


class SpecModelState(NamedTuple):
    buffer: jax.Array        # [1, length + K + 2] tokens
    n: jax.Array             # scalar int32: buffer[0, :n] is FINAL
    caches: tuple            # target KV caches, committed through n-2
    draft_state: tuple       # draft-model state, consumed through n-2
    rng: jax.Array
    iteration: jax.Array     # scalar int32: verification passes
    accepted: jax.Array      # scalar int32: drafted tokens kept
    ended: jax.Array         # scalar bool: end_token finalized


def draft_select(stack, j):
    """Pick entry j of a stacked draft-state pytree (leaves [K+2, ...])."""
    return jax.tree_util.tree_map(lambda s: jnp.take(s, j, axis=0), stack)


def chunk_speculative_decode(
    chunk_logits_fn: Callable,   # (tokens [1,C], caches, index)->(logits,kvs)
    commit_fn: Callable,         # (caches, kvs, index, m) -> caches
    init_caches,
    draft_propose: Callable,     # (state, last [1], rng) ->
    #                              (drafts [1,K], q_logp [1,K,V], stack)
    draft_init_state,
    length: int,
    rng,
    sampling: SamplingParams = SamplingParams(),
    start_token: int = 1,
    end_token: int = 2,
    draft_k: int = 8,
    max_iters: Optional[int] = None,
):
    """Decode `length` tokens (incl. the start token) speculatively.

    Batch size 1 (the long-document generation shape; batched rows diverge
    in position after one pass and need the per-row chunk machinery —
    lockstep serving already has its own engine, serving.py). The caller
    must size the target caches for length + draft_k + 2 positions (the
    bonus pass can peek past `length`).

    Invariant at the top of every pass: buffer[0, :n] is final, the target
    caches hold exactly positions 0..n-2, the draft state has consumed
    exactly positions 0..n-2, and buffer[0, n-1] (the newest final token)
    has been fed to neither — the chunk [final, d_1..d_K] feeds it
    alongside the drafts, and commit_chunk(m=j+1) keeps the invariant.

    Returns (tokens [1, length], passes, accepted_draft_tokens).
    """
    k = draft_k
    greedy = sampling.temperature <= 0.0 or sampling.top_k == 1
    max_iters = max_iters or (length + 2)
    buf_len = length + k + 2
    buffer = jnp.zeros((1, buf_len), jnp.int32).at[0, 0].set(start_token)

    def cond(st: SpecModelState):
        return (~st.ended) & (st.n < length) & (st.iteration < max_iters)

    def body(st: SpecModelState):
        rng, r_draft, r_coin, r_sel = jax.random.split(st.rng, 4)
        last = jax.lax.dynamic_slice(st.buffer, (0, st.n - 1), (1, 1))[:, 0]
        drafts, q_logp, stack = draft_propose(st.draft_state, last, r_draft)
        # Drafts enter the buffer BEFORE verification so the repetition
        # penalty sees each position's true history (for every row that
        # can finalize, the preceding drafts are the accepted = final
        # tokens — AR-exact penalty semantics).
        buf = jax.lax.dynamic_update_slice(st.buffer, drafts, (0, st.n))
        chunk = jax.lax.dynamic_slice(buf, (0, st.n - 1), (1, k + 1))
        logits, kvs = chunk_logits_fn(chunk, st.caches, st.n - 1)
        logits = logits.astype(jnp.float32)              # [1, K+1, V]
        v = logits.shape[-1]
        if sampling.repetition_penalty > 1.0:
            logits = _chunk_repetition_penalty(
                logits, buf, st.n - 1, sampling.repetition_penalty,
                sampling.repetition_window)
        lf = _filter_logits(logits, sampling)
        logp = lf - jax.nn.logsumexp(lf, axis=-1, keepdims=True)

        # Row i decides position n+i; rows 0..K-1 verify drafts 1..K.
        p_d = jnp.take_along_axis(logp[:, :k], drafts[..., None],
                                  axis=-1)[..., 0]                  # [1, K]
        if greedy:
            accept = drafts == jnp.argmax(lf[:, :k], axis=-1)
        else:
            q_d = jnp.take_along_axis(q_logp, drafts[..., None],
                                      axis=-1)[..., 0]              # [1, K]
            coins = jax.random.uniform(
                r_coin, (1, k), jnp.float32,
                minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
            accept = jnp.log(coins) < jnp.minimum(p_d - q_d, 0.0)
        rejected_any = jnp.any(~accept)
        j = jnp.where(rejected_any, jnp.argmax(~accept[0]),
                      jnp.asarray(k, jnp.int32))         # scalar, 0..K

        # Selection at row j: residual resample on a rejection, target
        # (bonus) sample when the whole chunk was accepted.
        lf_j = jax.lax.dynamic_slice(lf, (0, j, 0), (1, 1, v))[:, 0]
        if greedy:
            t_star = jnp.argmax(lf_j, axis=-1).astype(jnp.int32)
        else:
            gum = jax.random.gumbel(r_sel, (1, v), jnp.float32)
            target_pick = jnp.argmax(
                jnp.where(jnp.isfinite(lf_j), lf_j + gum, lf_j), axis=-1)
            p_j = jax.nn.softmax(lf_j, axis=-1)
            q_j = jnp.exp(jax.lax.dynamic_slice(
                q_logp, (0, jnp.minimum(j, k - 1), 0), (1, 1, v))[:, 0])
            resid = jnp.clip(p_j - q_j, 0.0, None)
            r_log = jnp.where(resid > 0, jnp.log(resid), -jnp.inf)
            # All-zero residual can only arise from rounding (a rejection
            # implies p < q somewhere, hence p > q elsewhere); fall back
            # to the target sample rather than emit garbage.
            has_resid = jnp.any(resid > 0, axis=-1)
            resid_pick = jnp.argmax(r_log + gum, axis=-1)
            t_star = jnp.where(
                rejected_any & has_resid, resid_pick,
                target_pick).astype(jnp.int32)

        buf2 = jax.lax.dynamic_update_slice(buf, t_star[:, None],
                                            (0, st.n + j))
        n2 = st.n + j + 1
        caches2 = tuple(commit_fn(st.caches, kvs, st.n - 1, j + 1))
        dstate2 = draft_select(stack, j)
        hit_end = jnp.any((drafts[0] == end_token)
                          & (jnp.arange(k) < j)) | (t_star[0] == end_token)
        return SpecModelState(
            buffer=buf2, n=n2, caches=caches2, draft_state=dstate2,
            rng=rng, iteration=st.iteration + 1,
            accepted=st.accepted + j, ended=st.ended | hit_end)

    state = SpecModelState(
        buffer=buffer, n=jnp.asarray(1, jnp.int32),
        caches=tuple(init_caches), draft_state=draft_init_state,
        rng=rng, iteration=jnp.asarray(0, jnp.int32),
        accepted=jnp.asarray(0, jnp.int32),
        ended=jnp.asarray(False))
    state = jax.lax.while_loop(cond, body, state)
    out = state.buffer[:, :length]
    out = _mask_after_end(out, end_token, start_token)
    out = out.at[:, -1].set(0)      # AR exhaustion-slot parity
    return out, state.iteration, state.accepted

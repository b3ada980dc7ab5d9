"""Functional batched decoding state machine.

Pure-pytree re-design of the reference's GenerationState
(/root/reference/sparse_vae/core/generation.py): a NamedTuple carried through
`lax.while_loop`, with repetition penalty (1.2, 512-token lookback),
temperature, top-k, and nucleus top-p=0.9 logit processing — all in static
shapes. Finished samples are handled by masking (they keep flowing through
the compute but write [PAD]) instead of the reference's gather-compaction
(generation.py:74-77), which would need dynamic shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    """Static decode hyperparameters (generation.py:13-17 defaults)."""
    top_k: int = 0
    top_p: float = 0.9
    temperature: float = 1.0
    repetition_penalty: float = 1.2
    repetition_window: int = 512


class DecodeState(NamedTuple):
    tokens: jax.Array   # [B, max_len] int32 output buffer; [CLS] at pos 0
    index: jax.Array    # scalar int32 — next position to write
    live: jax.Array     # [B] bool — still-generating samples
    rng: jax.Array      # PRNG key


def init_decode_state(batch_size: int, max_length: int, start_token: int,
                      rng) -> DecodeState:
    tokens = jnp.zeros((batch_size, max_length), jnp.int32)
    tokens = tokens.at[:, 0].set(start_token)
    return DecodeState(tokens=tokens, index=jnp.asarray(1, jnp.int32),
                       live=jnp.ones(batch_size, bool), rng=rng)


def prev_tokens(state: DecodeState) -> jax.Array:
    """[B] most recently generated token (generation.py:27-28)."""
    return jax.lax.dynamic_index_in_dim(
        state.tokens, state.index - 1, axis=1, keepdims=False)


def apply_repetition_penalty(logits, tokens, index, penalty: float,
                             window: int):
    """Divide (or multiply, for negatives) the logits of recently generated
    tokens by `penalty` (generation.py:34-39). Uses a static `window`-sized
    dynamic slice ending at `index`; out-of-range slots hold [PAD]=0, whose
    logit penalization is harmless (PAD is never a valid continuation)."""
    window = min(window, tokens.shape[-1])  # buffers shorter than the window
    start = jnp.maximum(index - window, 0)
    prev = jax.lax.dynamic_slice_in_dim(tokens, start, window, axis=1)
    # Mask out slots at or beyond the write index (they are zeros anyway).
    prev_logits = jnp.take_along_axis(logits, prev, axis=-1)
    penalized = jnp.where(prev_logits < 0.0, prev_logits * penalty,
                          prev_logits / penalty)
    return jnp.put_along_axis(logits, prev, penalized, axis=-1,
                              inplace=False)


def top_p_filter(logits, top_p: float, num_iters: int = 24):
    """Nucleus filtering without a full-vocab sort.

    An O(V·log(1/ε)) threshold bisection replaces the reference's
    sort+cumsum (generation.py:55-63): find the largest probability
    threshold t whose kept mass Σ p·[p ≥ t] still reaches `top_p`, then mask
    everything below t (the most probable token always survives). A 32k-way
    sort per row is the dominant cost of sampling on TPU; ~24 masked
    reductions are an order of magnitude cheaper and vectorize over any
    number of rows.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    lo = jnp.zeros_like(pmax)

    def body(_, bounds):
        lo, hi = bounds
        mid = (lo + hi) * 0.5
        mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0), axis=-1,
                       keepdims=True)
        keep_raising = mass >= top_p
        return (jnp.where(keep_raising, mid, lo),
                jnp.where(keep_raising, hi, mid))

    lo, _ = jax.lax.fori_loop(0, num_iters, body, (lo, pmax))
    keep = (probs >= lo) | (probs == pmax)  # always keep the argmax
    return jnp.where(keep, logits, -jnp.inf)


def _select_token_rows(logits, sample_rng, params: SamplingParams,
                       overrides: dict):
    """_select_token with PER-ROW sampling parameters as traced [B] arrays
    (serving: every request picks its own temperature / top_p /
    repetition_penalty without recompiling the slice — overrides ride the
    jit as data). Static params supply anything absent from `overrides`;
    per-row temperature <= 0 means greedy for that row; per-row
    top_p >= 1 disables the nucleus filter for that row. The engine-level
    top_k stays static (lax.top_k shapes cannot vary per row)."""
    temp = overrides.get("temperature")
    if temp is None:
        temp = jnp.full(logits.shape[0], params.temperature, jnp.float32)
    top_p = overrides.get("top_p")
    if top_p is None:
        top_p = jnp.full(logits.shape[0], params.top_p, jnp.float32)

    scaled = logits / jnp.maximum(temp, 1e-6)[:, None]
    if params.top_k > 1:
        kth = jax.lax.top_k(scaled, params.top_k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    filtered = top_p_filter(scaled, top_p[:, None])
    scaled = jnp.where((top_p >= 1.0)[:, None], scaled, filtered)
    sampled = jax.random.categorical(sample_rng, scaled, axis=-1)
    greedy = (temp <= 0.0) | (params.top_k == 1)
    return jnp.where(greedy, jnp.argmax(logits, axis=-1),
                     sampled).astype(jnp.int32)


def _select_token(logits, sample_rng, params: SamplingParams,
                  fused: bool = False, interpret: bool = False):
    """Shared token selection: temperature, top-k, nucleus (bisection or
    the fused VMEM kernel), greedy. logits: [B, V] -> [B] int32."""
    greedy = params.temperature <= 0.0 or params.top_k == 1
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if fused and params.top_k == 0 and 0.0 < params.top_p < 1.0:
        from ..ops.pallas_select import nucleus_gumbel_argmax
        noise = jax.random.gumbel(sample_rng, logits.shape, jnp.float32)
        return nucleus_gumbel_argmax(
            logits.astype(jnp.float32), noise, top_p=params.top_p,
            temperature=params.temperature, interpret=interpret)
    logits = logits / params.temperature
    if params.top_k > 0:
        kth = jax.lax.top_k(logits, params.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if params.top_p < 1.0:
        logits = top_p_filter(logits, params.top_p)
    return jax.random.categorical(sample_rng, logits, axis=-1
                                  ).astype(jnp.int32)


def process_logits(logits, state: DecodeState, params: SamplingParams,
                   end_token: int, fused: bool = False,
                   interpret: bool = False) -> DecodeState:
    """One decode step: penalize/filter/sample, write the token, advance.

    logits: [B, V] for the position `state.index`. Mirrors
    GenerationState.process_logits (generation.py:30-77) with masking in
    place of live-sample compaction.

    fused=True routes the nucleus-sampled path (top_k=0, 0<top_p<1)
    through the VMEM-resident selection kernel (ops/pallas_select.py):
    temperature, top-p bisection, Gumbel-max and argmax in ONE read of the
    [B, V] logits instead of ~24 bisection re-reads — the difference that
    matters at mass-sampling batch sizes (sample.py's 1000×32k rows per
    step). Same distribution as the categorical path (Gumbel-max IS
    categorical sampling), drawn as explicit noise from the same
    per-step rng split.
    """
    rng, sample_rng = jax.random.split(state.rng)

    if params.repetition_penalty > 1.0:
        logits = apply_repetition_penalty(
            logits, state.tokens, state.index, params.repetition_penalty,
            params.repetition_window)

    token = _select_token(logits, sample_rng, params, fused, interpret)

    # Finished samples write [PAD] (the reference wrote nothing; pos stays 0)
    token = jnp.where(state.live, token, 0)
    tokens = jax.lax.dynamic_update_slice_in_dim(
        state.tokens, token[:, None], state.index, axis=1)

    max_len = state.tokens.shape[-1]
    live = state.live & (token != end_token) & (state.index + 1 < max_len)
    return DecodeState(tokens=tokens, index=state.index + 1, live=live,
                       rng=rng)


def should_continue(state: DecodeState) -> jax.Array:
    """while_loop condition (inverse of generation.py:79-80)."""
    max_len = state.tokens.shape[-1]
    return (state.index < max_len - 1) & jnp.any(state.live)


def final_output(state: DecodeState) -> jax.Array:
    """Strip the start token (generation.py:82-83)."""
    return state.tokens[:, 1:]


# -- per-row decoding (continuous batching) ----------------------------------
#
# The scalar-index DecodeState above moves the whole batch in lockstep — the
# batch finishes when its SLOWEST row does, so at mass-sampling batch sizes
# (the reference's 700k x <=512 workload, sample.py:16-17) most rows idle as
# masked [PAD] writers while the stragglers finish. The row-wise state gives
# every row its own position: finished rows freeze, and a host loop harvests
# them between bounded device slices and refills the row with a fresh
# document (sparse_vae_tpu/serving.py) — the TPU-static realization of the
# reference's live-sample compaction (generation.py:74-77) that also keeps
# utilization at ~100% for heavy-tailed document lengths.


class RowDecodeState(NamedTuple):
    tokens: jax.Array   # [B, max_len] int32 per-row output buffer
    index: jax.Array    # [B] int32 — each row's next position to write
    live: jax.Array     # [B] bool — frozen rows await host harvest/refill
    rng: jax.Array
    # Optional [B] int32 per-row position cap (serving: each request asks
    # for its own max_tokens): a row freezes once index reaches its cap,
    # exactly as it does at the shared buffer bound. None = buffer-bound
    # only (the mass-sampling path).
    row_max: Optional[jax.Array] = None
    # Optional [B] int32 per-row prompt length (in index space: positions
    # < prompt_len are FORCED from the pre-written token buffer instead of
    # sampled — serving-side prefill/teacher-forcing). The model still runs
    # on every forced token, building the KV cache exactly as if the token
    # had been sampled; its logits are simply discarded. None = no prompts.
    prompt_len: Optional[jax.Array] = None


def init_row_decode_state(batch_size: int, max_length: int, start_token: int,
                          rng) -> RowDecodeState:
    tokens = jnp.zeros((batch_size, max_length), jnp.int32)
    tokens = tokens.at[:, 0].set(start_token)
    return RowDecodeState(tokens=tokens,
                          index=jnp.ones(batch_size, jnp.int32),
                          live=jnp.ones(batch_size, bool), rng=rng)


def _row_gather(buf, idx):
    """buf[i, idx[i]] for each row, as a one-hot masked sum (parallel VPU
    sweep over [B, L]) instead of a batch-varying gather — same rationale
    as ops.attention.row_cache_write."""
    hit = jnp.arange(buf.shape[1])[None, :] == idx[:, None]
    return jnp.sum(jnp.where(hit, buf, 0), axis=1)


def _row_write(buf, idx, val):
    """buf with val[i] written at buf[i, idx[i]] (one-hot compare+where)."""
    hit = jnp.arange(buf.shape[1])[None, :] == idx[:, None]
    return jnp.where(hit, val[:, None], buf)


def prev_tokens_rowwise(state: RowDecodeState) -> jax.Array:
    """[B] token each row generated last (at its own index - 1)."""
    return _row_gather(state.tokens, state.index - 1)


def apply_repetition_penalty_rowwise(logits, tokens, index, penalty: float,
                                     window: int):
    """Per-row variant of apply_repetition_penalty: each row's lookback
    window ends at ITS index (a [B, window] gather instead of one dynamic
    slice)."""
    max_len = tokens.shape[-1]
    window = min(window, max_len)
    starts = jnp.clip(index - window, 0, max_len - window)      # [B]
    cols = starts[:, None] + jnp.arange(window)[None, :]        # [B, W]
    prev = jnp.take_along_axis(tokens, cols, axis=1)
    prev_logits = jnp.take_along_axis(logits, prev, axis=-1)
    penalized = jnp.where(prev_logits < 0.0, prev_logits * penalty,
                          prev_logits / penalty)
    return jnp.put_along_axis(logits, prev, penalized, axis=-1,
                              inplace=False)


def process_logits_rowwise(logits, state: RowDecodeState,
                           params: SamplingParams, end_token: int,
                           fused: bool = False,
                           interpret: bool = False,
                           overrides: Optional[dict] = None
                           ) -> RowDecodeState:
    """Per-row process_logits: write at each row's own index, advance only
    live rows (finished rows freeze in place for the host to harvest).
    overrides: optional per-row [B] sampling-parameter arrays
    (_select_token_rows) — traced data, so one compiled step serves any
    mix of per-request temperatures/top_p/penalties."""
    rng, sample_rng = jax.random.split(state.rng)
    if overrides is not None:
        pen = overrides.get("repetition_penalty")
        if pen is None:
            pen = jnp.full(logits.shape[0], params.repetition_penalty,
                           jnp.float32)
        # penalty 1.0 rows are an exact no-op (x*1, x/1), so the penalty
        # always applies under overrides — no static gate needed.
        logits = apply_repetition_penalty_rowwise(
            logits, state.tokens, state.index, pen[:, None],
            params.repetition_window)
        token = _select_token_rows(logits, sample_rng, params, overrides)
    else:
        if params.repetition_penalty > 1.0:
            logits = apply_repetition_penalty_rowwise(
                logits, state.tokens, state.index,
                params.repetition_penalty, params.repetition_window)
        token = _select_token(logits, sample_rng, params, fused, interpret)
    token = jnp.where(state.live, token, 0)

    max_len = state.tokens.shape[-1]
    if state.prompt_len is not None:
        # Prefill: while a row's write position is inside its prompt, the
        # token comes from the pre-written buffer, not the sampler — and a
        # forced token never ends the row (prompts may contain [SEP]).
        forced = state.live & (state.index < state.prompt_len)
        buf = _row_gather(state.tokens, state.index)
        token = jnp.where(forced, buf, token)
    tokens = _row_write(state.tokens, state.index, token)
    index = state.index + state.live.astype(jnp.int32)
    # max_len - 1: the scalar loop (should_continue) never writes the final
    # buffer position either — keeps row-wise documents identical to it.
    ended = token == end_token
    if state.prompt_len is not None:
        ended = ended & ~forced
    live = state.live & ~ended & (index < max_len - 1)
    if state.row_max is not None:
        live = live & (index < state.row_max)
    return RowDecodeState(tokens=tokens, index=index, live=live, rng=rng,
                          row_max=state.row_max,
                          prompt_len=state.prompt_len)


def decode_loop_rowwise(state: RowDecodeState, logits_fn, carry,
                        params: SamplingParams, end_token: int,
                        max_steps: int, fused_select: bool = False,
                        interpret: bool = False,
                        overrides: Optional[dict] = None):
    """Bounded per-row decode slice: at most `max_steps` tokens per live
    row, one device computation. Returns the (resumable) state and carry —
    the continuous-batching host loop harvests/refills between slices."""
    def cond(loop):
        st, _, steps = loop
        return jnp.any(st.live) & (steps < max_steps)

    def body(loop):
        st, cr, steps = loop
        logits, cr = logits_fn(st, cr)
        st = process_logits_rowwise(logits, st, params, end_token,
                                    fused=fused_select, interpret=interpret,
                                    overrides=overrides)
        return st, cr, steps + 1

    state, carry, _ = jax.lax.while_loop(
        cond, body, (state, carry, jnp.asarray(0, jnp.int32)))
    return state, carry


def decode_loop(state: DecodeState, logits_fn, carry, params: SamplingParams,
                end_token: int, max_steps=None, fused_select: bool = False,
                interpret: bool = False):
    """Generic AR decode: runs `logits_fn(state, carry) -> (logits, carry)`
    under lax.while_loop until every sample has emitted `end_token` or the
    buffer is full. The entire loop is one device computation — the TPU
    replacement for the reference's Python token-at-a-time loop
    (transformer_vae.py:109-125).

    max_steps bounds THIS call to at most that many tokens, leaving the
    returned (state, carry) resumable by calling again: very long documents
    (pg19's 102,400 tokens) decode as a host loop of bounded device
    executions, which tunneled/preemptible TPU runtimes require."""
    if max_steps is not None:
        stop = state.index + max_steps

    def cond(loop):
        ok = should_continue(loop[0])
        if max_steps is not None:
            ok = ok & (loop[0].index < stop)
        return ok

    def body(loop):
        st, cr = loop
        logits, cr = logits_fn(st, cr)
        return process_logits(logits, st, params, end_token,
                              fused=fused_select, interpret=interpret), cr

    state, carry = jax.lax.while_loop(cond, body, (state, carry))
    return state, carry

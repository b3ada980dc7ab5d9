"""Continuous-batching sampler — the serving-path upgrade of mass sampling.

The scalar decode loop (models/generation.py DecodeState) moves a batch in
lockstep: it finishes when its SLOWEST row does, so at the reference's
mass-sampling scale (700,000 samples x <=512 tokens at batch 1000,
/root/reference/sample.py:16-17) most rows sit as masked [PAD] writers while
the stragglers finish — wasted device steps proportional to the spread of
the document-length distribution. The reference compacted live samples by
gathering (generation.py:74-77), a dynamic-shape trick XLA cannot take.

This module is the TPU-static answer: PER-ROW decode state
(generation.RowDecodeState) where every row sits at its own position, plus a
host loop of bounded device slices. After each slice the host harvests rows
that finished (emitted the end token or filled the buffer) and REFILLS them
with a fresh document — new z, position reset to 0 — so utilization stays at
~live_rows/batch ~ 100% regardless of length spread. Cache state needs no
reset: ring/cache validity is derived from each row's index, and the new
document overwrites positions sequentially from 0 (ops/attention.py
decode_rowwise).
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.generation import (RowDecodeState, SamplingParams,
                                decode_loop_rowwise, init_row_decode_state,
                                prev_tokens_rowwise)


# Compiled-slice cache: flax modules are not hashable, so the jitted slice
# closures are cached explicitly by (model class, hparams repr, decode
# statics) — repeated continuous_batch_sample calls reuse the executable
# instead of re-tracing a fresh per-call closure.
_SLICE_CACHE: dict = {}


def rowwise_family(module) -> bool:
    """Whether `module` supports per-row decode (continuous batching /
    the serving engine). Returns is_vae; raises for the LSTM families."""
    is_vae = hasattr(type(module), "decode_step_z_rowwise")
    if not is_vae and not hasattr(type(module), "decode_step_rowwise"):
        raise ValueError(
            f"{type(module).__name__} has no row-wise decode step — "
            "continuous batching supports the transformer families; LSTM "
            "models use the lockstep sample loop")
    return is_vae


def _get_slice_fn(module, is_vae: bool, sampling: SamplingParams,
                  end_token: int, slice_steps: int, fused_select: bool,
                  interpret: bool):
    key = (type(module).__name__, repr(module.hparams), is_vae, sampling,
           end_token, slice_steps, fused_select, interpret)
    if key in _SLICE_CACHE:
        return _SLICE_CACHE[key]

    # state/caches are donated: the host only ever consumes the RETURNED
    # state (refills build fresh arrays), so the inputs' buffers are free —
    # without donation every slice would copy all KV caches.
    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=(1, 2))
    def slice_fn(params, state, caches, z, overrides=None):
        def logits_fn(st: RowDecodeState, caches):
            prev = prev_tokens_rowwise(st)
            pos = st.index - 1
            if is_vae:
                logits, caches = module.apply(
                    {"params": params}, prev, caches, pos, z,
                    method=type(module).decode_step_z_rowwise)
            else:
                logits, caches = module.apply(
                    {"params": params}, prev, caches, pos,
                    method=type(module).decode_step_rowwise)
            return logits.astype(jnp.float32), caches

        return decode_loop_rowwise(state, logits_fn, caches, sampling,
                                   end_token, slice_steps,
                                   fused_select=fused_select,
                                   interpret=interpret,
                                   overrides=overrides)

    _SLICE_CACHE[key] = slice_fn
    return slice_fn


def continuous_batch_sample(module, params, rng, num_samples: int,
                            max_length: int, batch_size: int,
                            sampling: SamplingParams = SamplingParams(),
                            start_token: int = 1, end_token: int = 2,
                            slice_steps: int = 256,
                            z_pool=None,
                            fused_select: bool = False,
                            interpret: bool = False,
                            progress: bool = False) -> List[np.ndarray]:
    """Generate `num_samples` documents with a continuously refilled batch.

    z_pool: optional [num_samples, 1, latent_depth] per-document latents
    (VAE models); None draws z ~ N(0, I) per document (or for an LM, which
    has no z at all). Returns a list of np.int32 token arrays (start token
    stripped; the end token kept when emitted), in document order.
    """
    is_vae = rowwise_family(module)
    latent = getattr(module.hparams, "latent_depth", 0)
    rng, z_rng, d_rng = jax.random.split(rng, 3)

    def draw_z(doc: int) -> np.ndarray:
        if z_pool is not None:
            return np.asarray(z_pool[doc], np.float32)
        return np.asarray(jax.random.normal(
            jax.random.fold_in(z_rng, doc), (1, latent)), np.float32)

    caches = module.apply({"params": params}, batch_size, max_length,
                          method=type(module).init_caches)

    slice_fn = _get_slice_fn(module, is_vae, sampling, end_token,
                             slice_steps, fused_select, interpret)

    state = init_row_decode_state(batch_size, max_length, start_token, d_rng)
    z_host = np.zeros((batch_size, 1, max(latent, 1)), np.float32)
    assigned: List[Optional[int]] = [None] * batch_size
    live_host = np.zeros(batch_size, bool)
    next_doc = 0
    for b in range(batch_size):
        if next_doc < num_samples:
            assigned[b] = next_doc
            if is_vae:
                z_host[b] = draw_z(next_doc)
            live_host[b] = True
            next_doc += 1
    state = state._replace(live=jnp.asarray(live_host))
    z = jnp.asarray(z_host)

    outputs: List[Optional[np.ndarray]] = [None] * num_samples
    pbar = None
    if progress:
        try:
            from tqdm import tqdm
            pbar = tqdm(desc="Generating samples", total=num_samples,
                        unit="samples", smoothing=0.1)
        except ImportError:
            pass

    while any(a is not None for a in assigned):
        state, caches = slice_fn(params, state, caches, z)
        tokens = np.array(state.tokens)   # writable host copies
        index = np.array(state.index)
        live = np.array(state.live)

        refills = []
        for b in range(batch_size):
            if assigned[b] is None or live[b]:
                continue
            outputs[assigned[b]] = tokens[b, 1:index[b]].astype(np.int32)
            if pbar is not None:
                pbar.update(1)
            if next_doc < num_samples:
                assigned[b] = next_doc
                if is_vae:
                    z_host[b] = draw_z(next_doc)
                next_doc += 1
                refills.append(b)
            else:
                assigned[b] = None

        if refills:
            rows = np.asarray(refills)
            new_tokens = tokens
            new_tokens[rows] = 0
            new_tokens[rows, 0] = start_token
            index[rows] = 1
            live[rows] = True
            state = RowDecodeState(tokens=jnp.asarray(new_tokens),
                                   index=jnp.asarray(index),
                                   live=jnp.asarray(live), rng=state.rng,
                                   row_max=state.row_max,
                                   prompt_len=state.prompt_len)
            if is_vae:
                z = jnp.asarray(z_host)

    if pbar is not None:
        pbar.close()
    return outputs  # type: ignore[return-value]

"""Step-indexed schedules, expressed as pure functions of the step counter.

Replaces the reference's mutable-state schedules: the LambdaLR cosine decay
(/root/reference/sparse_vae/core/language_model.py:135-158) and the KL-weight
annealing performed by mutating ``hparams.kl_weight`` every backward pass
(/root/reference/sparse_vae/core/continuous_autoencoder.py:28-39). Here both
are jit-safe ``f(step) -> value`` functions, so they live *inside* the compiled
train step and checkpoint/resume trivially (the step counter is the state).
"""
from __future__ import annotations

import jax.numpy as jnp


def cosine_decay_factor(step, decay_steps: int):
    """Cosine decay from 1 -> 0 over `decay_steps`; 0 afterwards.

    Mirrors reference `cosine_decay` (language_model.py:135-141) minus the
    KeyboardInterrupt halt — the trainer stops by checking `step >= decay_steps`
    on the host instead of raising from inside a schedule.
    """
    progress = jnp.minimum(step / max(1, decay_steps), 1.0)
    return jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))


def cosine_decay_with_warmup_factor(step, decay_steps: int, warmup_steps: int):
    """Linear warmup then cosine decay (language_model.py:144-158)."""
    warmup = step / max(1, warmup_steps)
    progress = (step - warmup_steps) / max(1, decay_steps - warmup_steps)
    progress = jnp.minimum(progress, 1.0)
    decay = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
    return jnp.where(step < warmup_steps, warmup, decay)


def kl_weight_schedule(step, start: float, end: float, annealing_steps: int):
    """Linear KL annealing from `start` to `end` over `annealing_steps`.

    Pure-function equivalent of ContinuousVAE.on_after_backward
    (continuous_autoencoder.py:28-39). annealing_steps == 0 => constant `end`.
    """
    if annealing_steps <= 0:
        return jnp.asarray(end, dtype=jnp.float32)
    progress = jnp.minimum(step / annealing_steps, 1.0)
    return jnp.asarray(start + (end - start) * progress, dtype=jnp.float32)


def scaled_lr(base_lr: float, tokens_per_step: int, base_batch_size: int) -> float:
    """Sqrt learning-rate scaling vs. a base token batch size
    (language_model.py:69-71: ``lr * (batch/base)**0.5``)."""
    return base_lr * (tokens_per_step / base_batch_size) ** 0.5

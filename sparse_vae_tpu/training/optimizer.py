"""Rectified Adam (with optional LAMB trust-ratio mode) for optax.

Re-implements the reference optimizer semantics
(/root/reference/sparse_vae/core/rectified_adam.py) as a pure optax
GradientTransformation:

- variance-rectification term rho_t with SGD-momentum fallback while
  rho_t <= 4 (rectified_adam.py:30-37,58-67);
- the rectified lr multiplier r_t * sqrt(1 - b2^t) applied to both the Adam
  update and the decoupled weight decay (:38,82);
- optional LAMB layer-wise trust-ratio normalization, clamping the parameter
  norm into [0.01, 10] (:73-80);
- a single global step counter (the reference used one step per param group).

The returned updates already include the learning rate and sign, so apply with
``optax.apply_updates`` directly.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    count: jax.Array   # int32 scalar, number of completed steps
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates


ScalarOrSchedule = Union[float, Callable]


def radam(
    learning_rate: ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    lamb: bool = False,
) -> optax.GradientTransformation:
    """RAdam/LAMB matching the reference's update rule exactly.

    Defaults mirror the reference call site (language_model.py:73:
    ``RAdam(..., weight_decay=0.01)`` with the optimizer's own
    betas=(0.9, 0.999), eps=1e-6).
    """

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return RAdamState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("radam requires params (for weight decay / LAMB)")
        step = state.count + 1  # 1-indexed like the reference (:26)
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        lr = jnp.asarray(lr, jnp.float32)

        b2_t = b2 ** step.astype(jnp.float32)
        b1_t = b1 ** step.astype(jnp.float32)
        bias_correction_v = jnp.sqrt(1.0 - b2_t)
        bias_correction_m = 1.0 - b1_t

        rho_inf = 2.0 / (1.0 - b2) - 1.0
        rho_t = rho_inf - 2.0 * step * b2_t / (1.0 - b2_t)
        rectified = rho_t > 4.0
        r_t_sq = ((rho_t - 4.0) * (rho_t - 2.0) * rho_inf) / (
            (rho_inf - 4.0) * (rho_inf - 2.0) * jnp.maximum(rho_t, 1e-6))
        # Rectified effective lr; falls back to plain lr in the SGD phase.
        lr_eff = jnp.where(rectified, lr * jnp.sqrt(jnp.abs(r_t_sq)) * bias_correction_v, lr)

        exp_avg = jax.tree.map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.exp_avg, grads)
        exp_avg_sq = jax.tree.map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.exp_avg_sq, grads)

        def adam_direction(m, v):
            denom = jnp.sqrt(v) / bias_correction_v + eps
            return jnp.where(rectified, m / denom, m) / bias_correction_m

        if lamb:
            def lamb_update(p, m, v):
                u = -weight_decay * p - adam_direction(m, v)
                p_norm = jnp.clip(jnp.linalg.norm(p), 0.01, 10.0)
                u_norm = jnp.linalg.norm(u)
                trust = p_norm / jnp.maximum(u_norm, 1e-12)
                return lr_eff * trust * u
            updates = jax.tree.map(lamb_update, params, exp_avg, exp_avg_sq)
        else:
            def radam_update(p, m, v):
                # param <- param*(1 - lr_eff*wd) - lr_eff*direction (:82-84)
                return -lr_eff * (weight_decay * p + adam_direction(m, v))
            updates = jax.tree.map(radam_update, params, exp_avg, exp_avg_sq)

        return updates, RAdamState(count=step, exp_avg=exp_avg, exp_avg_sq=exp_avg_sq)

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_norm_fn(max_norm: float, norm_fn
                    ) -> optax.GradientTransformation:
    """optax.clip_by_global_norm semantics with a caller-supplied norm.

    Inside shard_map, sharded gradient leaves hold only this shard's slice:
    optax.clip_by_global_norm would compute a different norm on every shard
    and the shards would silently diverge. Each sharded layout supplies the
    norm that psums its own slices (TP: clip_by_tp_global_norm; PP:
    parallel.pp.clip_by_pp_global_norm) over this shared scaffolding.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = norm_fn(updates)
        trigger = g_norm < max_norm
        updates = jax.tree.map(
            lambda t: jnp.where(trigger, t,
                                (t / g_norm.astype(t.dtype)) * max_norm),
            updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_tp_global_norm(max_norm: float, tp_size: int,
                           axis_name: str = "model",
                           shard_vocab: bool = False
                           ) -> optax.GradientTransformation:
    """Global-norm clip whose norm is exact under tensor parallelism: the
    model-sharded leaves' squared norms are psum'd over `axis_name`
    (parallel.tp.tp_global_norm) so every shard clips by the same, correct
    global norm."""

    def norm_fn(updates):
        from ..parallel.tp import tp_global_norm, tp_sharded_mask
        return tp_global_norm(
            updates, tp_sharded_mask(updates, tp_size, shard_vocab),
            axis_name)

    return clip_by_norm_fn(max_norm, norm_fn)


def make_optimizer(
    lr: float,
    lr_decay_steps: int | None,
    grad_clip_threshold: float,
    weight_decay: float = 0.01,
    lamb: bool = False,
    warmup_steps: int = 0,
    tp_size: int = 1,
    tp_shard_vocab: bool = False,
    ep_size: int = 1,
    clip: optax.GradientTransformation | None = None,
) -> optax.GradientTransformation:
    """Full training chain: global-norm clip -> RAdam with cosine-decayed lr.

    Matches LanguageModel.configure_optimizers + on_after_backward
    (language_model.py:68-78,120-122): clip by global norm at
    `grad_clip_threshold`, then RAdam stepping a per-step cosine schedule.

    tp_size > 1 (the update runs inside shard_map on a 2-D mesh with
    model-sharded params): the clip norm is computed with a psum over the
    'model' axis (see clip_by_tp_global_norm). LAMB's per-param trust ratio
    would need the same treatment and is not supported under TP.

    `clip` overrides the global-norm clip transformation entirely — the
    hook other sharded layouts use to make the norm exact for THEIR slices
    (parallel.pp.clip_by_pp_global_norm psums stage-sharded layer stacks
    over 'pipe').
    """
    from ..utils.schedules import cosine_decay_factor, cosine_decay_with_warmup_factor

    if lr_decay_steps:
        if warmup_steps:
            schedule = lambda step: lr * cosine_decay_with_warmup_factor(
                step, lr_decay_steps, warmup_steps)
        else:
            schedule = lambda step: lr * cosine_decay_factor(step, lr_decay_steps)
    else:
        schedule = lr

    if (tp_size > 1 or ep_size > 1) and lamb:
        raise NotImplementedError(
            "LAMB trust ratios are per-param norms and would be wrong on "
            "model- or expert-sharded params (each shard would compute a "
            "different ratio from its local slice); use lamb=False with "
            "tensor/expert parallelism")
    if clip is None:
        if tp_size > 1:
            clip = clip_by_tp_global_norm(grad_clip_threshold, tp_size,
                                          shard_vocab=tp_shard_vocab)
        elif ep_size > 1:
            from ..parallel.ep import clip_by_ep_global_norm
            clip = clip_by_ep_global_norm(grad_clip_threshold)
        else:
            clip = optax.clip_by_global_norm(grad_clip_threshold)
    return optax.chain(
        clip,
        radam(schedule, weight_decay=weight_decay, lamb=lamb),
    )

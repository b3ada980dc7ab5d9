"""Expert parallelism for the shard_map production step.

The fifth parallel axis (after data / tensor / sequence / pipeline): on a
(data, expert) mesh the MoE expert stacks (models/moe.py) are sharded over
'expert' — each device holds num_experts/ep full experts — while the batch
ROWS are sharded over BOTH axes, so the non-MoE compute is pure data
parallelism over data*expert devices (no replicated work). Inside each MoE
layer the per-shard dispatch buffer crosses the 'expert' axis with one
lax.all_to_all each way (the GShard exchange, riding ICI); everything else
in the step is untouched.

Gradient reductions (make_train_step wires these):
- replicated leaves see a slice of the global batch on every device ->
  psum over ('data', 'expert').
- expert-sharded leaves: after the all_to_all each device computes its OWN
  experts on tokens from every expert-peer in its data row, so its local
  gradient already covers the 'expert' axis -> psum over 'data' ONLY.
  (psum'ing different experts' slices together over 'expert' would be
  garbage — the same per-leaf split tensor parallelism needs, tp.py.)

The load-balance losses stay EXACT under this layout: the MoE layers sow
per-expert sums (imp) and counts (load, nv) which the objective psums over
all shards before the linear composition (models/moe.py docstring) — the
aux/z values and gradients are identical to a single device up to float
association. The only layout-dependent behavior is capacity overflow:
the token-drop pool is per (shard, expert), not global (standard GShard
semantics); with a capacity factor that avoids drops the step is exactly
equivalent to single-device (tests/test_moe.py).
"""
from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..training.optimizer import clip_by_norm_fn
from .tp import tp_global_norm

EXPERT_AXIS = "expert"

# Param leaves of MoEFFN that are stacked over experts (axis 0).
_EXPERT_STACKS = ("w_in", "b_in", "w_out")


def ep_localize(module, ep_size: int):
    """The per-shard twin: same class, hparams with ep_size set, so every
    MoE layer declares its LOCAL expert stacks ([E/ep, ...]) and the
    all_to_all exchange activates. The global module keeps ep_size=1 for
    init / eval-outside-shard_map / sampling."""
    if ep_size <= 1:
        return module
    hp = module.hparams
    if getattr(hp, "num_experts", 0) <= 1:
        raise ValueError(
            "expert parallelism requires an MoE config (num_experts > 1)")
    if hp.num_experts % ep_size:
        raise ValueError(
            f"num_experts={hp.num_experts} not divisible by "
            f"ep_size={ep_size}")
    return type(module)(dataclasses.replace(hp, ep_size=ep_size))


def _is_expert_leaf(path) -> bool:
    names = [p.key for p in path if hasattr(p, "key")]
    return (len(names) >= 2 and names[-2] == "moe"
            and names[-1] in _EXPERT_STACKS)


def ep_param_specs(tree):
    """PartitionSpec pytree: expert stacks sharded over 'expert' on their
    leading (expert) axis, everything else replicated. Works on optimizer
    states too (optax embeds the params tree whole, so leaf paths keep the
    same (moe, stack) suffix)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: (P(EXPERT_AXIS, *([None] * (v.ndim - 1)))
                         if _is_expert_leaf(path) else P()), tree)


def ep_shardings(tree, mesh: Mesh):
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        ep_param_specs(tree))


def ep_sharded_mask(tree):
    """Bool pytree: True where the leaf is sharded over 'expert'."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: _is_expert_leaf(path), tree)


def ep_global_norm(tree, axis_name: str = EXPERT_AXIS):
    """Global L2 norm with expert-sharded leaves psum'd over 'expert'
    (exact; same scaffolding as the TP norm)."""
    return tp_global_norm(tree, ep_sharded_mask(tree), axis_name)


def clip_by_ep_global_norm(max_norm: float):
    """Global-norm clip that is exact under expert parallelism — pass as
    make_optimizer(clip=...) for the EP train step."""
    return clip_by_norm_fn(max_norm, ep_global_norm)

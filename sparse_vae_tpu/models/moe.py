"""Mixture-of-Experts FFN with optional expert parallelism.

A beyond-reference capability (the reference's FFN is dense,
/root/reference/sparse_vae/core/transformer_layer.py:17-21): the
TransformerLayer's 4x GELU FFN is replaced by E expert FFNs with a learned
top-k router, GShard/Switch style, designed TPU-first:

- STATIC shapes end to end: per-(shard, expert) capacity C is a Python int
  computed from the (static) token count, dispatch is a cumsum position
  assignment + scatter-add into an [E, C, D] buffer, experts run as stacked
  [E, D, H] einsums on the MXU. No sorts, no dynamic shapes, no host sync.
- Tokens overflowing an expert's capacity get ZERO MoE output and ride the
  residual connection (standard token dropping). Priority is first-come:
  all first choices of the batch outrank all second choices (k-major
  flattening), earlier tokens outrank later ones.
- Pad tokens (mask False) are never dispatched — they consume no capacity
  and do not enter the balance statistics.
- Expert parallelism (parallel/ep.py): on a mesh with an 'expert' axis the
  expert stacks are sharded over it ([E/ep, ...] per device) and the
  dispatch buffer crosses shards with one lax.all_to_all each way — the
  classic GShard exchange, riding ICI. Everything else about the layer is
  unchanged; ep_size=1 is the single-device path exactly.
- Tensor parallelism (parallel/tp.py): on a (data, model) mesh every
  expert's HIDDEN dim is sharded over 'model' — the dense-FFN Megatron
  pattern applied per expert (w_in column-parallel, w_out row-parallel,
  one psum closes the partial expert outputs). The router and the
  dispatch/combine arithmetic stay replicated over 'model' (every shard
  sees the same activations, so routing decisions are identical by
  construction) and only the [E, C, D] buffer crosses the f/g collectives.
  ep_size and tp_size compose with 'data' individually, not with each
  other (a 3-axis data x expert x model step is unimplemented).

Load-balance statistics are SOWN (collection "losses") as per-expert SUMS
rather than composed into a scalar here, so the auxiliary losses ride the
sharded objective's linear sums/counts contract (parallel/spmd.py) exactly:

- moe_imp   [E]  sum over valid tokens of router softmax  (differentiable)
- moe_load  [E]  count of valid tokens whose FIRST choice is e  (constant)
- moe_z     []   sum over valid tokens of logsumexp(logits)^2  (diff.)
- moe_nv    []   count of valid tokens

The objective composes aux = E * sum_e (load_e/Nv) * (imp_e/Nv) with load
and Nv as psum'd COUNTS and imp as a psum'd SUM — linear in sums at fixed
counts, hence exact (and layout-independent) on any mesh. The z-loss
(ST-MoE router stabilizer) composes as z_sum / Nv, also linear.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .base import dense_kernel_init

EXPERT_AXIS = "expert"


def expert_capacity(num_tokens: int, num_experts: int, top_k: int,
                    capacity_factor: float) -> int:
    """Static per-(shard, expert) slot count: the even-routing load
    top_k * N / E, scaled by the capacity factor."""
    return max(1, int(math.ceil(
        top_k * num_tokens * capacity_factor / num_experts)))


class MoEFFN(nn.Module):
    """Drop-in replacement for the TransformerLayer FFN body (the caller
    adds the residual and dropout). Returns the combined expert outputs;
    dropped and pad tokens return zeros."""
    d_model: int
    d_hidden: int
    num_experts: int                  # GLOBAL expert count E
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32
    # Expert parallelism: set (via parallel.ep.ep_localize) only on the
    # per-shard twin running inside shard_map on a mesh with an 'expert'
    # axis. This module then declares LOCAL stacks [E/ep, ...] and the
    # dispatch buffer crosses shards with all_to_all.
    ep_size: int = 1
    ep_axis: str = EXPERT_AXIS
    # Tensor parallelism: set (via the tp_localize'd model twin) only inside
    # shard_map on a mesh with a 'model' axis. Every expert's hidden dim is
    # then declared LOCAL ([.., d_hidden/tp, ..]) and the f/g collectives
    # close the per-expert partial matmuls (module docstring).
    tp_size: int = 1
    tp_axis: str = "model"

    def setup(self):
        if self.top_k > self.num_experts:
            raise ValueError(f"top_k={self.top_k} > E={self.num_experts}")
        if self.num_experts % self.ep_size:
            raise ValueError(
                f"num_experts={self.num_experts} not divisible by "
                f"ep_size={self.ep_size}")
        if self.d_hidden % self.tp_size:
            raise ValueError(
                f"d_hidden={self.d_hidden} not divisible by "
                f"tp_size={self.tp_size}")
        if self.ep_size > 1 and self.tp_size > 1:
            raise NotImplementedError(
                "expert x tensor parallelism is not composed: shard experts "
                "over 'expert' OR their hidden dim over 'model', not both "
                "(parallel/ep.py, parallel/tp.py scope notes)")
        e_loc = self.num_experts // self.ep_size
        h_loc = self.d_hidden // self.tp_size
        init = dense_kernel_init(0.02)
        # Router in fp32: small, and its softmax statistics feed both the
        # dispatch decisions and the balance losses. Stays replicated under
        # TP — every 'model' shard must make identical routing decisions.
        self.router = nn.Dense(self.num_experts, use_bias=False,
                               kernel_init=init, dtype=jnp.float32)
        self.w_in = self.param("w_in", init,
                               (e_loc, self.d_model, h_loc))
        self.b_in = self.param("b_in", nn.initializers.zeros,
                               (e_loc, h_loc))
        self.w_out = self.param("w_out", init,
                                (e_loc, h_loc, self.d_model))

    def _experts(self, buf):
        """[E, C, D] capacity buffer -> expert FFN outputs, crossing the
        'expert' mesh axis when the experts are sharded and the 'model'
        axis when their hidden dim is."""
        if self.ep_size > 1:
            # Exchange: every shard keeps rows for its LOCAL experts from
            # all peers -> [E/ep, ep*C, D].
            buf = jax.lax.all_to_all(buf, self.ep_axis, split_axis=0,
                                     concat_axis=1, tiled=True)
        if self.tp_size > 1:
            # g: the replicated buffer feeds column-parallel w_in slices;
            # each shard's weight slice contributes a partial cotangent.
            from ..parallel.tp import replicate_gradient
            buf = replicate_gradient(buf, self.tp_axis)
        w_in = self.w_in.astype(self.dtype)
        w_out = self.w_out.astype(self.dtype)
        h = jnp.einsum("ecd,edh->ech", buf, w_in)
        h = nn.gelu(h + self.b_in.astype(self.dtype)[:, None, :])
        out = jnp.einsum("ech,ehd->ecd", h, w_out)
        if self.tp_size > 1:
            # f: close the row-parallel partial sums (w_out is bias-free
            # per expert, so one psum is exact).
            from ..parallel.tp import reduce_activations
            out = reduce_activations(out, self.tp_axis)
        if self.ep_size > 1:
            out = jax.lax.all_to_all(out, self.ep_axis, split_axis=1,
                                     concat_axis=0, tiled=True)
        return out

    def __call__(self, x, mask: Optional[jax.Array] = None):
        """x: [B, L, D] (post-LayerNorm); mask: [B, L] True = real token.
        Returns [B, L, D]."""
        b, l, d = x.shape
        n = b * l
        e, k = self.num_experts, self.top_k
        cap = expert_capacity(n, e, k, self.capacity_factor)

        x_flat = x.reshape(n, d)
        valid = (jnp.ones((n,), bool) if mask is None
                 else mask.reshape(n))

        logits = self.router(x_flat.astype(jnp.float32))       # [N, E]
        probs = jax.nn.softmax(logits, axis=-1)
        gate_vals, assign = jax.lax.top_k(probs, k)             # [N, k] each
        if k > 1:
            gate_vals = gate_vals / jnp.maximum(
                jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9)

        # Joint capacity positions, k-major: all slot-0 (first-choice)
        # dispatches outrank every slot-1 dispatch, and within a slot
        # earlier tokens outrank later ones.
        assign_kn = assign.T.reshape(k * n)                     # [kN]
        valid_kn = jnp.tile(valid, k)
        onehot = jax.nn.one_hot(assign_kn, e, dtype=jnp.int32)
        onehot = onehot * valid_kn[:, None].astype(jnp.int32)
        pos = jnp.cumsum(onehot, axis=0) - onehot               # [kN, E]
        pos_a = jnp.take_along_axis(pos, assign_kn[:, None], 1)[:, 0]
        keep = valid_kn & (pos_a < cap)
        dest = jnp.where(keep, assign_kn * cap + pos_a, 0)      # [kN]

        dest_k = dest.reshape(k, n)
        keep_k = keep.reshape(k, n)
        buf = jnp.zeros((e * cap, d), self.dtype)
        for s in range(k):
            w = keep_k[s].astype(self.dtype)[:, None]
            buf = buf.at[dest_k[s]].add(x_flat.astype(self.dtype) * w,
                                        mode="drop")

        out_buf = self._experts(buf.reshape(e, cap, d)).reshape(e * cap, d)

        y = jnp.zeros((n, d), self.dtype)
        gates = gate_vals.T                                     # [k, N]
        for s in range(k):
            g = (gates[s] * keep_k[s]).astype(self.dtype)[:, None]
            y = y + out_buf[dest_k[s]] * g

        # Balance statistics as per-expert sums over VALID tokens (module
        # docstring: the objective composes them linearly after the psum).
        vf = valid.astype(jnp.float32)
        imp = jnp.sum(probs * vf[:, None], axis=0)              # [E] diff.
        first = jax.nn.one_hot(assign[:, 0], e, dtype=jnp.float32)
        load = jnp.sum(jax.lax.stop_gradient(first) * vf[:, None], axis=0)
        lse = jax.nn.logsumexp(logits, axis=-1)
        z = jnp.sum(jnp.square(lse) * vf)
        self.sow("losses", "moe_imp", imp)
        self.sow("losses", "moe_load", load)
        self.sow("losses", "moe_z", z)
        self.sow("losses", "moe_nv", jnp.sum(vf))
        return y.reshape(b, l, d)


def collect_moe_stats(loss_vars: dict):
    """Stack the per-layer sown balance statistics out of a mutable
    "losses" collection: -> dict(imp [nL, E], load [nL, E], z [], nv [])
    or None when the model has no MoE layers."""
    found = {"moe_imp": [], "moe_load": [], "moe_z": [], "moe_nv": []}

    def walk(tree):
        if not isinstance(tree, dict):
            return
        for name, val in tree.items():
            if name in found:
                # flax sow stores a tuple per call site; the LAST entry is
                # this apply's value (earlier ones only appear when stale
                # sown variables are passed back in, e.g. a full init dict).
                found[name].append(val[-1])
            else:
                walk(val)

    walk(loss_vars)
    if not found["moe_imp"]:
        return None
    return {
        "imp": jnp.stack(found["moe_imp"]),
        "load": jnp.stack(found["moe_load"]),
        "z": sum(found["moe_z"]),
        "nv": found["moe_nv"][0],
    }


def moe_loss_terms(stats, sums: dict, counts: dict) -> None:
    """Fold collected MoE statistics into an objective's (sums, counts):
    differentiable numerators into sums, constants into counts — the split
    that keeps compose_moe_losses linear in sums (spmd contract)."""
    sums["moe_imp_sum"] = stats["imp"]
    sums["moe_z_sum"] = stats["z"]
    counts["moe_load"] = stats["load"]
    counts["moe_nv"] = stats["nv"]


def compose_moe_losses(sums: dict, counts: dict, aux_weight: float,
                       z_weight: float):
    """(aux + z losses, metrics) from psum'd global sums/counts. LINEAR in
    `sums` at fixed `counts` (the sharded-gradient contract): aux uses the
    constant load/Nv counts as coefficients on the differentiable imp sums.

    aux = mean over layers of  E * sum_e (load_e / Nv) * (imp_e / Nv)
    z   = mean over layers of  sum_n lse(logits_n)^2 / Nv
    """
    imp = sums["moe_imp_sum"]                                  # [nL, E]
    n_layers, e = imp.shape
    nv = jnp.maximum(counts["moe_nv"], 1.0)
    aux = e * jnp.sum(counts["moe_load"] * imp) / (n_layers * nv * nv)
    z = sums["moe_z_sum"] / (n_layers * nv)
    loss = aux_weight * aux + z_weight * z
    return loss, {"train_moe_aux": aux, "train_moe_z": z}

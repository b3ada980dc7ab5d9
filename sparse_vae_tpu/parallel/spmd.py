"""Explicit-SPMD training step via shard_map.

The Trainer's default multi-device path relies on GSPMD: batch sharded on
'data', params replicated, XLA inserts the gradient psum. That is correct
for pure-XLA graphs, but custom calls (the Pallas attention / CE kernels)
have no partitioning rules — GSPMD falls back to gathering their operands,
which silently serializes the hot path on real multi-chip hardware.

`sharded_train_step` instead maps the per-device step explicitly with
`jax.shard_map`: every device runs the full jitted step on its local batch
shard (Pallas kernels included, untouched), and gradients/metrics are
psum-averaged over the 'data' axis — the classic data-parallel SPMD recipe
(SURVEY.md §2.10). Params stay replicated; the optimizer update runs
identically on every device.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_train_step(loss_fn: Callable, optimizer, mesh: Mesh):
    """Build a jitted data-parallel train step over `mesh`'s 'data' axis.

    loss_fn(params, batch, step, rng) -> (loss, metrics_dict) computed on a
    LOCAL batch shard. Returns step_fn(params, opt_state, batch, step, rng)
    -> (params, opt_state, loss, metrics); `batch` may be sharded or fully
    replicated host arrays (shard_map splits on the leading axis).
    """
    data_axis = "data"

    def per_device(params, opt_state, batch, step, rng):
        def local_loss(p):
            return loss_fn(p, batch, step, rng)

        (loss, metrics), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params)
        # Average over the data axis: the explicit collective that GSPMD
        # would have inserted, now guaranteed to ride ICI around the
        # untouched per-shard Pallas kernels.
        grads = jax.lax.pmean(grads, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, data_axis),
                               metrics)
        import optax
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    replicated = P()
    batch_spec = P(data_axis)
    mapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(replicated, replicated, batch_spec, replicated,
                  replicated),
        out_specs=(replicated, replicated, replicated, replicated),
        check_vma=False,
    )
    return jax.jit(mapped)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with the leading dim sharded on 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}

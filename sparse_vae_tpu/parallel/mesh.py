"""Device mesh + sharding utilities.

The distributed layer the reference never had (SURVEY.md §2.10: single GPU,
no NCCL/MPI). TPU-native scaling is pjit/GSPMD over a `jax.sharding.Mesh`:

- axis 'data': batch sharding over ICI — the primary scaling axis. Gradient
  all-reduce is inserted by XLA because the params are replicated and the
  batch is sharded (psum under jit).
- axis 'model': optional tensor-parallel axis — large kernels are sharded on
  their output dimension by a tree heuristic; XLA/GSPMD inserts the
  all-gathers/reduce-scatters.

Multi-host would call jax.distributed.initialize() before building the mesh;
on a single host the same code drives all local devices.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host initialization: call once per host before create_mesh.

    Wraps jax.distributed.initialize — on TPU pods the arguments are
    auto-detected from the environment, so the bare call suffices; the
    explicit arguments support CPU/GPU multi-process testing. After this,
    jax.devices() spans the whole slice and the same mesh/pjit code scales
    across hosts (collectives ride ICI within a slice, DCN across slices).
    No-ops when already initialized or when running single-process.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process context


def create_mesh(num_devices: Optional[int] = None,
                model_axis: int = 1,
                devices: Optional[Sequence] = None,
                seq_axis: int = 1,
                pipe_axis: int = 1,
                expert_axis: int = 1) -> Mesh:
    """(data[, seq], model) mesh over the available devices.

    model_axis=1 => pure data parallelism (the default; the reference models
    are small enough that DP is the right first axis, SURVEY §2.10).
    seq_axis>1 adds a 'seq' axis for sequence parallelism (parallel/sp.py)
    — the scaling axis for the pg19 batch-1 long-document regime. With
    model_axis == 1, adjacent 'seq' coordinates land on adjacent devices so
    the halo ppermute rides nearest-neighbor ICI links; when both axes are
    > 1, 'model' stays innermost on purpose — the per-layer TP all-reduces
    move far more bytes than the fixed-size halos, so they get the
    nearest-neighbor links.
    pipe_axis>1 adds a 'pipe' axis for pipeline parallelism (parallel/pp.py)
    — innermost, so each stage's activation hand-off (one ppermute per
    pipeline tick) also rides nearest-neighbor links. pp currently composes
    with 'data' only.
    expert_axis>1 adds an 'expert' axis for expert parallelism
    (parallel/ep.py) — innermost, so the MoE dispatch all_to_all rides
    nearest-neighbor links; batch rows shard over ('data', 'expert')
    jointly. ep composes with 'data' only.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % (model_axis * seq_axis * pipe_axis * expert_axis) == 0, (
        n, model_axis, seq_axis, pipe_axis, expert_axis)
    if expert_axis > 1:
        if model_axis > 1 or seq_axis > 1 or pipe_axis > 1:
            raise NotImplementedError(
                "expert parallelism composes with the 'data' axis only "
                "(parallel/ep.py scope note)")
        grid = np.asarray(devices).reshape(n // expert_axis, expert_axis)
        return Mesh(grid, axis_names=("data", "expert"))
    if pipe_axis > 1:
        if model_axis > 1 or seq_axis > 1:
            raise NotImplementedError(
                "the pipeline step composes with the 'data' axis only "
                "(parallel/pp.py scope note)")
        grid = np.asarray(devices).reshape(n // pipe_axis, pipe_axis)
        return Mesh(grid, axis_names=("data", "pipe"))
    if seq_axis > 1:
        grid = np.asarray(devices).reshape(
            n // (model_axis * seq_axis), seq_axis, model_axis)
        return Mesh(grid, axis_names=("data", "seq", "model"))
    grid = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(params, mesh: Mesh, min_size: int = 2 ** 16):
    """Heuristic tensor-parallel shardings: shard the last axis of large 2-D+
    kernels over 'model' when divisible; replicate everything else.

    With model_axis == 1 this degenerates to full replication (pure DP) —
    as it does on meshes without a 'model' axis at all (the 'pipe' mesh,
    whose params shard via parallel.pp.pp_param_specs instead).
    """
    model = mesh.shape.get("model", 1)

    def rule(x):
        if (model > 1 and hasattr(x, "ndim") and x.ndim >= 2
                and x.size >= min_size and x.shape[-1] % model == 0):
            spec = [None] * (x.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_params(params, mesh: Mesh):
    shardings = param_sharding_rules(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings), shardings


def pad_batch_rows(arrays: dict, multiple: int) -> dict:
    """Pad the batch dim up to a multiple of the data-axis size with all-PAD
    rows (masked by the loss via num_tokens == 0)."""
    b = arrays["token_ids"].shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return arrays
    import jax.numpy as jnp
    out = {}
    for k, v in arrays.items():
        pad = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
        out[k] = jnp.pad(v, pad)
    return out

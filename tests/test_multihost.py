"""True MULTI-PROCESS execution of the production shard_map step.

Everything else in the suite runs single-process on a virtual 8-device mesh;
this spawns two REAL processes (Gloo collectives between them, 4 CPU devices
each), builds a global 8-device mesh spanning both, distributes the batch
with jax.make_array_from_process_local_data, runs ONE production optimizer
step (parallel.spmd.make_train_step — the exact path a TPU pod slice would
run after parallel.mesh.initialize_distributed), and checks the loss and
updated params agree with the same step executed single-process on 8
virtual devices (itself exact-equivalence-tested against single-device in
test_parallel.py / test_sp.py). Three modes:

- dp: the (8,) 'data' mesh — grad/loss psums cross the process boundary;
- sp: the (1, 8) data x seq mesh on the sequence-parallel TransformerVAE —
  the window-band halo ppermute, [CLS] psum broadcast, and label-shift
  ppermute all cross the boundary between global devices 3 and 4;
- pp: the (1, 8) data x pipe mesh on an 8-layer transformer LM — every
  GPipe tick's stage-to-stage activation ppermute crosses it.
- ep: the (1, 8) data x expert mesh on an 8-expert MoE transformer LM —
  each device owns ONE expert and every MoE layer's dispatch/return
  all_to_all crosses the process boundary.

This is the only place the multi-host claim in README/PARITY §2.10 is
actually exercised rather than asserted. The worker half lives in this same
file behind __main__.
"""
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path


def _init_params(model, init_rngs, sample):
    """Eager param init on a LOCAL device. local_devices, NOT devices:
    under multi-process, global device 0 is non-addressable on every
    process but 0 and eagerly dispatching the flax init there crashes.
    Local eager init gives identical values on every process
    (deterministic rng)."""
    import jax
    with jax.default_device(jax.local_devices()[0]):
        return model.init(init_rngs, sample)["params"]


def _dp_problem():
    """Deterministic tiny AR problem for the pure data-parallel mesh."""
    import jax
    import numpy as np
    import optax

    from sparse_vae_tpu.models.lstm_lm import (LSTMLanguageModel,
                                               LSTMLanguageModelHparams)
    from sparse_vae_tpu.training.objectives import ARObjective

    hp = LSTMLanguageModelHparams(d_embedding=16, d_model=32, vocab_size=64)
    model = LSTMLanguageModel(hp)
    rng = jax.random.PRNGKey(0)
    k, b, L = 2, 16, 48
    lengths = np.array(jax.random.randint(rng, (k, b), 8, L))
    tokens = np.array(jax.random.randint(rng, (k, b, L), 3, 64))
    tokens = tokens * (np.arange(L)[None, None, :] < lengths[:, :, None])
    batch = {"token_ids": tokens.astype(np.int32),
             "num_tokens": lengths.astype(np.int32),
             "num_bytes": (lengths * 4).astype(np.int32)}
    params = _init_params(model, rng, batch["token_ids"][0])
    return (model, ARObjective(hp), optax.sgd(1e-2), params, batch, rng,
            dict(seq_axis=1))


def _sp_problem():
    """Sequence-parallel TransformerVAE on a (data 1, seq 8) mesh: 128-token
    documents in 16-token shards (= the window span at window 2 x block 8),
    so the halo/CLS/label collectives are all live — and cross the process
    boundary."""
    import dataclasses

    import jax
    import numpy as np
    import optax

    from sparse_vae_tpu.models.transformer_vae import (TransformerVAE,
                                                       TransformerVAEHparams)
    from sparse_vae_tpu.models.vae import VAEObjective

    hp = TransformerVAEHparams(
        d_model=32, num_heads=2, num_layers=2, latent_depth=8, vocab_size=64,
        num_encoder_latents=8, sparse_self_attention=True, attn_window_size=2,
        attn_block_size=8, use_pallas_kernel=False, loss_chunk_size=16,
        sp_size=8)
    model = TransformerVAE(hp)
    rng = jax.random.PRNGKey(1)
    k, b, L = 2, 2, 128
    lengths = np.array(jax.random.randint(rng, (k, b), L // 2, L))
    tokens = np.array(jax.random.randint(rng, (k, b, L), 3, 64))
    tokens = tokens * (np.arange(L)[None, None, :] < lengths[:, :, None])
    batch = {"token_ids": tokens.astype(np.int32),
             "num_tokens": lengths.astype(np.int32),
             "num_bytes": (lengths * 4).astype(np.int32)}
    global_model = TransformerVAE(dataclasses.replace(hp, sp_size=1))
    params = _init_params(global_model, {"params": rng, "sample": rng},
                          batch["token_ids"][0][:1])
    optimizer = optax.sgd(1e-2)
    return (model, VAEObjective(hp), optimizer, params, batch, rng,
            dict(seq_axis=8))


def _pp_problem():
    """Pipeline-parallel 8-layer transformer LM on a (data 1, pipe 8) mesh:
    one layer per stage, M=4 microbatches streaming through — every tick's
    hand-off crosses the process boundary at stage 3 -> 4."""
    import jax
    import numpy as np

    from sparse_vae_tpu.models.transformer_lm import (
        TransformerHparams, TransformerLanguageModel)
    from sparse_vae_tpu.parallel.pp import make_pp_optimizer
    from sparse_vae_tpu.training.objectives import ARObjective

    hp = TransformerHparams(
        d_model=32, num_heads=2, num_layers=8, vocab_size=64,
        sparse_self_attention=True, attn_window_size=2, attn_block_size=8,
        use_pallas_kernel=False, loss_chunk_size=16)
    model = TransformerLanguageModel(hp)
    rng = jax.random.PRNGKey(2)
    k, b, L = 4, 2, 32
    lengths = np.array(jax.random.randint(rng, (k, b), L // 2, L))
    tokens = np.array(jax.random.randint(rng, (k, b, L), 3, 64))
    tokens = tokens * (np.arange(L)[None, None, :] < lengths[:, :, None])
    batch = {"token_ids": tokens.astype(np.int32),
             "num_tokens": lengths.astype(np.int32),
             "num_bytes": (lengths * 4).astype(np.int32)}
    params = _init_params(model, rng, batch["token_ids"][0])
    optimizer = make_pp_optimizer(lr=1e-2, lr_decay_steps=1000,
                                  grad_clip_threshold=5.0)
    return (model, ARObjective(hp), optimizer, params, batch, rng,
            dict(pipe_axis=8))


def _ep_problem():
    """Expert-parallel MoE transformer LM on a (data 1, expert 8) mesh:
    8 experts, one per device; batch rows shard over the joint (data,
    expert) axes; capacity generous so nothing drops (the one layout-
    dependent behavior) and the step is exactly the single-process one."""
    import dataclasses

    import jax
    import numpy as np

    from sparse_vae_tpu.models.transformer_lm import (
        TransformerHparams, TransformerLanguageModel)
    from sparse_vae_tpu.training.objectives import ARObjective
    from sparse_vae_tpu.training.optimizer import make_optimizer

    hp = TransformerHparams(
        d_model=32, num_heads=2, num_layers=2, vocab_size=64,
        sparse_self_attention=False, use_pallas_kernel=False,
        loss_chunk_size=16, num_experts=8, moe_top_k=2,
        moe_capacity_factor=8.0, ep_size=8)
    model = TransformerLanguageModel(hp)  # the ep-localized twin
    rng = jax.random.PRNGKey(3)
    k, b, L = 2, 8, 32
    lengths = np.array(jax.random.randint(rng, (k, b), L // 2, L))
    tokens = np.array(jax.random.randint(rng, (k, b, L), 3, 64))
    tokens = tokens * (np.arange(L)[None, None, :] < lengths[:, :, None])
    batch = {"token_ids": tokens.astype(np.int32),
             "num_tokens": lengths.astype(np.int32),
             "num_bytes": (lengths * 4).astype(np.int32)}
    global_model = TransformerLanguageModel(
        dataclasses.replace(hp, ep_size=1))
    params = _init_params(global_model, rng, batch["token_ids"][0])
    optimizer = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                               grad_clip_threshold=5.0, ep_size=8)
    return (model, ARObjective(hp), optimizer, params, batch, rng,
            dict(expert_axis=8))


PROBLEMS = {"dp": _dp_problem, "sp": _sp_problem, "pp": _pp_problem,
            "ep": _ep_problem}


def _pp_steps(mode, model, objective, optimizer, params, mesh):
    """(step_fn, global params pytree-with-specs) for the mode: the pp mode
    converts to the stacked layout and shards it over 'pipe'."""
    from jax.sharding import PartitionSpec as P

    from sparse_vae_tpu.parallel.pp import (make_pp_train_step,
                                            pp_param_specs, pp_split_params)
    from sparse_vae_tpu.parallel.spmd import make_train_step

    if mode != "pp":
        import jax
        step_fn = make_train_step(model, objective, optimizer, mesh=mesh)
        if mode == "ep":
            from sparse_vae_tpu.parallel.ep import ep_param_specs
            return step_fn, params, ep_param_specs(params)
        specs = jax.tree.map(lambda _: P(), params)
        return step_fn, params, specs
    ppp = pp_split_params(params, model.hparams.num_layers)
    step_fn = make_pp_train_step(model, objective, optimizer, mesh,
                                 deterministic=True)
    return step_fn, ppp, pp_param_specs(ppp)


def _worker_main(mode: str, proc_id: int, num_procs: int, port: int,
                 out_path: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    print(f"worker {proc_id}: initializing", flush=True)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_procs, process_id=proc_id)
    print(f"worker {proc_id}: init done", flush=True)
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding

    from sparse_vae_tpu.parallel.mesh import create_mesh
    from sparse_vae_tpu.parallel.spmd import batch_specs

    model, objective, optimizer, params, batch, rng, mesh_kw = \
        PROBLEMS[mode]()
    mesh = create_mesh(**mesh_kw)  # all 8 global devices
    b_specs = batch_specs(mesh, stacked=True)
    step_fn, params, p_specs = _pp_steps(mode, model, objective, optimizer,
                                         params, mesh)

    # Distribute: every process holds the full host values; each contributes
    # the slice its local devices own along whatever axes the PartitionSpec
    # shards (batch rows for 'data', token positions for 'seq', the stacked
    # layer axis for 'pipe'); spec-free values replicate.
    def put(v, spec):
        sh = NamedSharding(mesh, spec)
        v = np.asarray(v)
        axes = {ax: dim for dim, entry in enumerate(spec)
                for ax in ((entry,) if isinstance(entry, str) else entry or ())
                if mesh.shape[ax] > 1}
        local = v
        for ax, dim in axes.items():
            n = mesh.shape[ax]
            lo = proc_id * n // num_procs * v.shape[dim] // n
            hi = (proc_id + 1) * n // num_procs * v.shape[dim] // n
            local = np.take(local, range(lo, hi), axis=dim)
        return jax.make_array_from_process_local_data(sh, local, v.shape)

    g_batch = {name: put(v, b_specs[name]) for name, v in batch.items()}
    g_params = jax.tree.map(put, params, p_specs)
    opt_state = optimizer.init(params)
    if mode == "pp":
        from sparse_vae_tpu.parallel.pp import pp_param_specs
        o_specs = pp_param_specs(opt_state)
    elif mode == "ep":
        from sparse_vae_tpu.parallel.ep import ep_param_specs
        o_specs = ep_param_specs(opt_state)
    else:
        o_specs = jax.tree.map(
            lambda _: jax.sharding.PartitionSpec(), opt_state)
    g_opt = jax.tree.map(put, opt_state, o_specs)

    p1, o1, metrics = step_fn(g_params, g_opt, g_batch,
                              jax.numpy.asarray(0), rng)

    # Gather every updated leaf to host (collective: all processes join);
    # replicated leaves pass through, 'pipe'-sharded stacks reassemble.
    flat = {f"p{i}": np.asarray(
                multihost_utils.process_allgather(v, tiled=True))
            for i, v in enumerate(jax.tree.leaves(p1))}
    if proc_id == 0:
        flat["loss"] = np.asarray(metrics["loss"])
        flat["grad_norm"] = np.asarray(metrics["grad_norm"])
        np.savez(out_path, **flat)
    jax.block_until_ready(o1)
    print(f"worker {proc_id} done", flush=True)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(mode: str):
    port = _free_port()
    out = Path(tempfile.mkdtemp()) / "mh.npz"
    env = dict(os.environ)
    # Workers pin their own device count via jax_num_cpu_devices; the
    # pytest process's forced 8-device XLA flag must not leak into them.
    env.pop("XLA_FLAGS", None)
    repo_root = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p)
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "worker", mode, str(i), "2",
             str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outputs = ["", ""]
    try:
        for i, p in enumerate(procs):
            try:
                stdout, _ = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                # One worker hung (usually because the OTHER crashed and
                # it is stuck in a collective): kill both so their pipes
                # drain and the diagnosis below shows the real traceback.
                for q in procs:
                    q.kill()
                stdout, _ = p.communicate()
            outputs[i] = stdout.decode(errors="replace")
    finally:
        for q in procs:
            if q.poll() is None:
                q.kill()
                q.communicate()
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} failed:\n{outputs[i][-4000:]}\n"
            f"--- other worker:\n{outputs[1 - i][-4000:]}")
    import numpy as np
    return np.load(out)


def _single_process_reference(mode: str):
    import jax
    import jax.numpy as jnp

    from sparse_vae_tpu.parallel.mesh import create_mesh
    from sparse_vae_tpu.parallel.spmd import shard_batch

    model, objective, optimizer, params, batch, rng, mesh_kw = \
        PROBLEMS[mode]()
    mesh = create_mesh(num_devices=8, **mesh_kw)
    step_fn, params, _ = _pp_steps(mode, model, objective, optimizer,
                                   params, mesh)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    return step_fn(jax.tree.map(jnp.array, params), optimizer.init(params),
                   shard_batch(batch_j, mesh, stacked=True),
                   jnp.asarray(0), rng)


def _check(mode: str):
    import jax
    import numpy as np

    got = _run_pair(mode)
    p0, _, m0 = _single_process_reference(mode)
    np.testing.assert_allclose(got["loss"], float(m0["loss"]), rtol=1e-6)
    np.testing.assert_allclose(got["grad_norm"], float(m0["grad_norm"]),
                               rtol=1e-5)
    for i, v in enumerate(jax.tree.leaves(p0)):
        np.testing.assert_allclose(got[f"p{i}"], np.asarray(v), rtol=1e-6,
                                   atol=1e-7, err_msg=f"param leaf {i}")


def test_two_process_dp_step_matches_single_process():
    _check("dp")


def test_two_process_seq_parallel_step_matches_single_process():
    _check("sp")


def test_two_process_pipeline_step_matches_single_process():
    _check("pp")


def test_two_process_expert_parallel_step_matches_single_process():
    _check("ep")


if __name__ == "__main__":
    assert sys.argv[1] == "worker"
    _worker_main(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
                 int(sys.argv[5]), sys.argv[6])

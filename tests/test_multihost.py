"""True MULTI-PROCESS execution of the production shard_map step.

Everything else in the suite runs single-process on a virtual 8-device mesh;
this spawns two REAL processes (Gloo collectives between them, 4 CPU devices
each), builds the global (8,) 'data' mesh spanning both, distributes the
batch with jax.make_array_from_process_local_data, runs ONE production
optimizer step (parallel.spmd.make_train_step — the exact path a TPU pod
slice would run after parallel.mesh.initialize_distributed), and checks the
loss and updated params agree with the same step executed single-process on
8 virtual devices (itself exact-equivalence-tested against single-device in
test_parallel.py). This is the only place the multi-host claim in
README/PARITY §2.10 is actually exercised rather than asserted.

The worker half lives in this same file behind __main__.
"""
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

def _build_problem():
    """Deterministic tiny problem shared by workers and the reference."""
    import jax
    import numpy as np
    import optax

    from sparse_vae_tpu.models.lstm_lm import (LSTMLanguageModel,
                                               LSTMLanguageModelHparams)
    from sparse_vae_tpu.training.objectives import ARObjective

    hp = LSTMLanguageModelHparams(d_embedding=16, d_model=32, vocab_size=64)
    model = LSTMLanguageModel(hp)
    objective = ARObjective(hp)
    optimizer = optax.sgd(1e-2)

    rng = jax.random.PRNGKey(0)
    k, b, L = 2, 16, 48
    lengths = np.array(jax.random.randint(rng, (k, b), 8, L))
    tokens = np.array(jax.random.randint(rng, (k, b, L), 3, 64))
    tokens = tokens * (np.arange(L)[None, None, :] < lengths[:, :, None])
    batch = {"token_ids": tokens.astype(np.int32),
             "num_tokens": lengths.astype(np.int32),
             "num_bytes": (lengths * 4).astype(np.int32)}
    # local_devices, NOT devices: under multi-process, global device 0 is
    # non-addressable on every process but 0 and eagerly dispatching the
    # flax init there crashes. Local eager init gives identical values on
    # every process (deterministic rng).
    with jax.default_device(jax.local_devices()[0]):
        params = model.init(rng, batch["token_ids"][0])["params"]
    return model, objective, optimizer, params, batch, rng


def _worker_main(proc_id: int, num_procs: int, port: int, out_path: str):
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
    from jax.sharding import NamedSharding

    from sparse_vae_tpu.parallel.mesh import create_mesh
    from sparse_vae_tpu.parallel.spmd import batch_specs, make_train_step

    model, objective, optimizer, params, batch, rng = _build_problem()
    mesh = create_mesh()  # all 8 global devices, axis 'data'
    assert dict(mesh.shape) == {"data": 8, "model": 1}, mesh.shape

    # Distribute: every process holds the full host batch; each contributes
    # the row slice its local devices own. Params/opt-state replicate from
    # identical host values.
    specs = batch_specs(mesh, stacked=True)
    rows = batch["token_ids"].shape[1]
    lo, hi = proc_id * rows // num_procs, (proc_id + 1) * rows // num_procs

    def put_batch(name, v):
        sh = NamedSharding(mesh, specs[name])
        return jax.make_array_from_process_local_data(
            sh, v[:, lo:hi], v.shape)

    g_batch = {name: put_batch(name, v) for name, v in batch.items()}
    rep = NamedSharding(mesh, jax.sharding.PartitionSpec())
    put_rep = lambda t: jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(x), np.shape(x)), t)
    g_params = put_rep(params)
    g_opt = put_rep(optimizer.init(params))

    step_fn = make_train_step(model, objective, optimizer, mesh=mesh)
    p1, o1, metrics = step_fn(g_params, g_opt, g_batch,
                              jax.numpy.asarray(0), rng)

    # Replicated outputs are fully addressable on every process.
    if proc_id == 0:
        flat = {f"p{i}": np.asarray(v)
                for i, v in enumerate(jax.tree.leaves(p1))}
        flat["loss"] = np.asarray(metrics["loss"])
        flat["grad_norm"] = np.asarray(metrics["grad_norm"])
        np.savez(out_path, **flat)
    jax.block_until_ready(p1)
    print(f"worker {proc_id} done", flush=True)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_step_matches_single_process():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_vae_tpu.parallel.mesh import create_mesh
    from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch

    port = _free_port()
    out = Path(tempfile.mkdtemp()) / "mh.npz"
    env = dict(os.environ)
    # Workers pin their own device count via jax_num_cpu_devices; the
    # pytest process's forced 8-device XLA flag must not leak into them.
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "worker", str(i), "2", str(port),
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        outputs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outputs[i][-4000:]}"
    got = np.load(out)

    # Single-process reference on the 8-device virtual mesh (conftest).
    model, objective, optimizer, params, batch, rng = _build_problem()
    mesh = create_mesh(num_devices=8)
    step_fn = make_train_step(model, objective, optimizer, mesh=mesh)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    p0, _, m0 = step_fn(jax.tree.map(jnp.array, params),
                        optimizer.init(params),
                        shard_batch(batch_j, mesh, stacked=True),
                        jnp.asarray(0), rng)

    np.testing.assert_allclose(got["loss"], float(m0["loss"]), rtol=1e-6)
    np.testing.assert_allclose(got["grad_norm"], float(m0["grad_norm"]),
                               rtol=1e-5)
    for i, v in enumerate(jax.tree.leaves(p0)):
        np.testing.assert_allclose(got[f"p{i}"], np.asarray(v), rtol=1e-6,
                                   atol=1e-7, err_msg=f"param leaf {i}")


if __name__ == "__main__":
    assert sys.argv[1] == "worker"
    _worker_main(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                 sys.argv[5])

#!/usr/bin/env python
"""Archive / restore trained checkpoints through git (runs/<name>/).

The 2026-08-20 VM reset destroyed every trained checkpoint because
``sparse-vae-logs/`` is outside git (VERDICT r4 missing #1): the whole L7
eval layer (sample.py, test.py, serve.py, gather_latents.py — ref
`sample.py`, `test.py:30-44`, `gather_latents.py:20-39`) became
capability-without-artifact overnight. This tool makes the *params* of a
trained run a committable artifact:

- ``export <experiment> <name> [step]``: load the run's checkpoint (default
  the best-val step, else newest), flatten params to a compressed npz with
  float leaves stored as bf16 bit patterns (uint16 — numpy has no native
  bf16; ~2 bytes/param, ~45 MB for the d512x6 flagship), and write
  ``runs/<name>/ckpt_bf16.npz`` + ``runs/<name>/ckpt_meta.json`` (run
  hparams + step + per-leaf dtypes) — small enough to commit.
- ``restore <experiment> <name>``: rebuild a loadable Orbax checkpoint at
  ``sparse-vae-logs/<experiment>/<name>/checkpoints/step_<N>`` from the
  archive: params from the npz (cast back to the original leaf dtypes),
  a FRESH optimizer state (the archive is params-only — resuming training
  restarts optimizer moments; eval surfaces never read them), step from the
  archive, meta.json/best.json regenerated.

Precision note: fp32 master weights round-trip through bf16 (~3 decimal
digits). For every eval surface this is below measurement noise — the
training/serving compute path casts weights to bf16 anyway (models'
``precision=bf16``); the round-trip equals what the forward pass already
computes with.
"""
import json
import sys
from pathlib import Path

import numpy as np

# Host-side tool: ALWAYS run on the CPU backend. The JAX_PLATFORMS=cpu env
# var does not stick on this image (the axon sitecustomize re-registers the
# tunnel backend), so a caller-supplied env is not enough — observed
# 2026-08-20: the test-suite `restore` subprocess queued on the busy TPU
# tunnel behind a training job and hung the whole suite. The programmatic
# pin below is the one that works; it must land before any other jax call.
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BF16_SUFFIX = "::bf16"


def _flatten(params):
    import jax
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def export(experiment, name, step="best"):
    import jax.numpy as jnp
    from sparse_vae_tpu import load_checkpoint_for_name

    module, hparams, objective, state, meta = load_checkpoint_for_name(
        experiment, name, step=step)
    ckpt_step = int(state["step"])
    flat = _flatten(state["params"])
    arrays, dtypes = {}, {}
    for key, arr in flat.items():
        dtypes[key] = str(arr.dtype)
        if np.issubdtype(arr.dtype, np.floating):
            arrays[key + BF16_SUFFIX] = np.asarray(
                jnp.asarray(arr).astype(jnp.bfloat16)).view(np.uint16)
        else:
            arrays[key] = arr
    out = REPO / "runs" / name
    out.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out / "ckpt_bf16.npz", **arrays)
    (out / "ckpt_meta.json").write_text(json.dumps(
        {"experiment": experiment, "name": name, "step": ckpt_step,
         "dtypes": dtypes, "meta": meta}, indent=2) + "\n")
    size_mb = (out / "ckpt_bf16.npz").stat().st_size / 1e6
    print(json.dumps({"archived": str(out / "ckpt_bf16.npz"),
                      "step": ckpt_step, "leaves": len(flat),
                      "size_mb": round(size_mb, 1)}))


def restore(experiment, name):
    import jax
    import jax.numpy as jnp
    from sparse_vae_tpu import build_model
    from sparse_vae_tpu.training.checkpointing import CheckpointManager
    from sparse_vae_tpu.training.optimizer import make_optimizer
    from sparse_vae_tpu.utils.schedules import scaled_lr

    out = REPO / "runs" / name
    info = json.loads((out / "ckpt_meta.json").read_text())
    meta, step = info["meta"], int(info["step"])
    npz = np.load(out / "ckpt_bf16.npz")
    loaded = {}
    for key in npz.files:
        if key.endswith(BF16_SUFFIX):
            base = key[:-len(BF16_SUFFIX)]
            bf16 = jnp.asarray(npz[key]).view(jnp.bfloat16)
            loaded[base] = np.asarray(
                bf16.astype(jnp.dtype(info["dtypes"][base])))
        else:
            loaded[key] = npz[key]

    module, hparams, objective = build_model(experiment,
                                             meta["model_hparams"])
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 128), jnp.int32))["params"]
    flat_tpl = jax.tree_util.tree_flatten_with_path(params)
    rebuilt = []
    for path, leaf in flat_tpl[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        if key not in loaded:
            raise KeyError(f"archive missing param leaf {key!r}")
        if loaded[key].shape != leaf.shape:
            raise ValueError(f"shape mismatch at {key!r}: archive "
                             f"{loaded[key].shape} vs model {leaf.shape}")
        rebuilt.append(jnp.asarray(loaded[key], dtype=leaf.dtype))
    params = jax.tree_util.tree_unflatten(flat_tpl[1], rebuilt)

    thp = meta.get("trainer_hparams", {})
    data_hp = meta.get("data_hparams", {})
    tokens_per_step = (data_hp.get("tokens_per_batch", 50_000)
                       * thp.get("accumulate_grad_batches", 2))
    opt = make_optimizer(
        lr=scaled_lr(hparams.lr, tokens_per_step, hparams.base_batch_size),
        lr_decay_steps=hparams.lr_decay_steps,
        grad_clip_threshold=hparams.grad_clip_threshold,
        weight_decay=hparams.weight_decay, lamb=hparams.lamb)
    state = {"params": params, "opt_state": opt.init(params),
             "step": step, "rng": jax.random.PRNGKey(0)}
    mgr = CheckpointManager(experiment, name)
    mgr.save(step, state, meta=meta, best=True)
    mgr.close()
    print(json.dumps({"restored": str(mgr.dir / f"step_{step}"),
                      "step": step}))


def main(argv):
    if len(argv) < 4 or argv[1] not in ("export", "restore"):
        print(__doc__)
        return 1
    mode, experiment, name = argv[1], argv[2], argv[3]
    if mode == "export":
        export(experiment, name, argv[4] if len(argv) > 4 else "best")
    else:
        restore(experiment, name)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

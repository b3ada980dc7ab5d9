#!/usr/bin/env python
"""Train a model: ``python train.py <lstm-vae|lstm-lm|transformer-lm|
transformer-vae> [model.k=v data.k=v trainer.k=v ...] [preset=<name>]``.

TPU-native counterpart of /root/reference/train.py: same CLI shape (model
positional + dotlist + named presets + from_checkpoint resume + no_log),
with pjit data parallelism over all local devices instead of pynvml
single-GPU selection, bf16 instead of fp16 AMP, and jax_debug_nans for the
anomaly_detection flag.
"""
import sys

import jax


def main(args):
    if len(args) < 2:
        print(__doc__)
        return 1
    experiment = args[1]

    from sparse_vae_tpu import build_model
    from sparse_vae_tpu.cli import (apply_platform_env, assemble_config,
                                    build_data, make_sample_fns,
                                    seed_everything)
    from sparse_vae_tpu.parallel.mesh import create_mesh
    from sparse_vae_tpu.training.trainer import Trainer

    apply_platform_env()
    cfg = assemble_config(experiment, args[2:])
    if cfg.from_checkpoint:
        # Resume with the run's exact saved hparams as the base; CLI dotlist
        # keys still win (e.g. trainer.max_steps=8000 lifts a step cap).
        from sparse_vae_tpu.training.checkpointing import load_run_meta
        meta = load_run_meta(experiment, cfg.name)
        if meta:
            cfg = assemble_config(experiment, args[2:], base_meta=meta)
    seed_everything(cfg.trainer.seed)

    if cfg.anomaly_detection:
        jax.config.update("jax_debug_nans", True)  # ref train.py:66-67

    print(f"Training {experiment}...")
    data = build_data(cfg)
    model_overrides = dict(cfg.model_overrides)
    model_overrides.setdefault("vocab_size", cfg.data.vocab_size)
    module, hparams, objective = build_model(experiment, model_overrides)

    devices = jax.devices()
    n = cfg.trainer.num_devices or len(devices)
    mesh = create_mesh(num_devices=n, devices=devices,
                       seq_axis=cfg.trainer.seq_parallel,
                       model_axis=cfg.trainer.model_parallel,
                       expert_axis=cfg.trainer.expert_parallel) \
        if n > 1 else None
    if mesh is not None:
        print(f"Mesh: {dict(mesh.shape)} over {devices[:n]}")

    sample_fn, reconstruct_fn = make_sample_fns(experiment, objective)
    trainer = Trainer(
        module, hparams, objective, data, cfg.trainer,
        experiment=experiment, name=cfg.name,
        sample_fn=sample_fn, reconstruct_fn=reconstruct_fn,
        mesh=mesh, enable_logging=not cfg.no_log)

    outcome = trainer.fit(resume=cfg.from_checkpoint is not None)
    print(f"Done: step={outcome.step} stopped={outcome.stopped_reason} "
          f"best {hparams.early_stopping_metric}={outcome.best_metric}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

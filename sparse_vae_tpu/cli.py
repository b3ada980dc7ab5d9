"""Shared CLI plumbing for the top-level scripts.

Reproduces the reference's config assembly (train.py:16-61): code defaults ->
CLI dotlist -> named preset (the reference merges the preset AFTER the
dotlist, so preset values win — kept for parity), plus the extra top-level
flags (preset, from_checkpoint, name, no_log, anomaly_detection, bf16).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from .data.text_data_module import TextDataModule, TextDataModuleHparams
from .hparam_presets import hparam_presets
from .models.generation import SamplingParams
from .utils.config import TrainerHparams, merge_into_dataclass, parse_dotlist

TOP_LEVEL_FLAGS = ("preset", "from_checkpoint", "name", "no_log",
                   "anomaly_detection", "bf16", "max_steps")


@dataclass
class CLIConfig:
    experiment: str
    model_overrides: Dict[str, Any] = field(default_factory=dict)
    data: TextDataModuleHparams = field(default_factory=TextDataModuleHparams)
    trainer: TrainerHparams = field(default_factory=TrainerHparams)
    preset: Optional[str] = None
    from_checkpoint: Optional[str] = None
    name: str = "default"
    no_log: bool = False
    anomaly_detection: bool = False


def assemble_config(experiment: str, dotlist: List[str],
                    base_meta: Optional[Dict[str, Any]] = None) -> CLIConfig:
    """base_meta: a run's saved meta.json dict — used when resuming so the
    continued run starts from the EXACT hparams of the original (CLI dotlist
    keys still win, e.g. trainer.max_steps=8000 to lift a step cap)."""
    raw = parse_dotlist(dotlist)
    cfg = CLIConfig(experiment=experiment)

    cfg.preset = raw.pop("preset", None)
    cfg.from_checkpoint = raw.pop("from_checkpoint", None)
    cfg.name = raw.pop("name", cfg.from_checkpoint or "default")
    cfg.no_log = str(raw.pop("no_log", "false")).lower() in ("true", "1")
    cfg.anomaly_detection = str(raw.pop("anomaly_detection",
                                        "false")).lower() in ("true", "1")

    model_over = dict(raw.pop("model", {}))
    data_over = dict(raw.pop("data", {}))
    trainer_over = dict(raw.pop("trainer", {}))
    if base_meta:
        model_over = {**base_meta.get("model_hparams", {}), **model_over}
        data_over = {**base_meta.get("data_hparams", {}), **data_over}
        trainer_over = {**base_meta.get("trainer_hparams", {}),
                        **trainer_over}
    if raw:
        raise ValueError(f"Unrecognized CLI keys: {sorted(raw)} "
                         f"(prefix with model./data./trainer.)")

    # Preset merges after the dotlist (reference train.py:57-61).
    if cfg.preset:
        preset = hparam_presets.get(cfg.preset)
        assert preset, f"Preset name '{cfg.preset}' not recognized."
        model_over.update(preset.get("model", {}))
        data_over.update(preset.get("data", {}))
        trainer_over.update(preset.get("trainer", {}))

    cfg.model_overrides = model_over
    cfg.data = merge_into_dataclass(cfg.data, data_over)
    cfg.trainer = merge_into_dataclass(cfg.trainer, trainer_over)
    return cfg


def build_data(cfg: CLIConfig) -> TextDataModule:
    dm = TextDataModule(cfg.data)
    dm.prepare_data()
    return dm


def tokenizer_for_run(experiment: str, meta: dict):
    """The tokenizer a trained run used, resolved from the run's recorded
    data hparams (checkpoint meta.json) — shared by the inference scripts
    (sample.py, serve.py) so the recipe cannot drift between them."""
    cfg = assemble_config(experiment, [])
    cfg.data = type(cfg.data)(**meta.get("data_hparams", {}))
    return build_data(cfg).tokenizer


def make_sample_fns(experiment: str, objective, max_len: int = 512):
    """(sample_fn, reconstruct_fn) for the Trainer's sampling callback.

    VAEs refuse to sample while the annealed kl_weight < 1
    (transformer_vae.py:97-99, lstm_vae.py:174-176); reconstruction decodes
    from the posterior mean at temperature 0.7
    (text_sampling_callback.py:42-44).
    """
    is_vae = experiment.endswith("vae")

    def sample_fn(module, params, rng, step=0):
        if is_vae and float(objective.kl_weight(step)) < 1.0:
            return None
        return module.apply({"params": params}, rng, max_len, 1,
                            method=type(module).sample)

    def reconstruct_fn(module, params, rng, batch, step=0):
        if not is_vae:
            return None
        import jax.numpy as jnp
        tokens = jnp.asarray(batch.token_ids[:1])
        posterior = module.apply({"params": params}, tokens,
                                 method=type(module).posterior)
        length = min(max_len, int(batch.num_tokens[0]) + 16)
        return module.apply({"params": params}, rng, length, 1,
                            posterior.loc[:1],
                            SamplingParams(temperature=0.7),
                            method=type(module).sample)

    return sample_fn, reconstruct_fn


def seed_everything(seed: int = 7295):
    """train.py:15."""
    np.random.seed(seed)
    import random
    random.seed(seed)


def apply_platform_env():
    """Honor JAX_PLATFORMS even when a plugin (e.g. the axon TPU tunnel)
    registers itself as the default backend regardless of the env var, and
    enable the persistent compilation cache (bucketed batch shapes each
    trigger one compile; the cache makes every later run/resume instant)."""
    import os
    import jax
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        jax.config.update("jax_platforms", platforms)
    cache_dir = os.environ.get("SVT_COMPILE_CACHE", "/tmp/svt-jax-cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          isolate_cpu_cache(cache_dir))


def isolate_cpu_cache(cache_dir: str) -> str:
    """CPU-backend runs get a cache dir suffixed with a host-CPU-feature
    fingerprint. XLA:CPU AOT artifacts bake in the compiling machine's
    feature set but the persistent cache key does NOT include it; this
    sandbox's /tmp survives VM migrations across host generations, and
    loading a stale artifact on a host missing a feature is at best a
    loud 'machine type mismatch' warning and at worst SIGILL. TPU (and
    any non-cpu backend) keeps the shared dir — its executables are
    device-targeted, not host-targeted."""
    import hashlib
    import jax
    if jax.default_backend() != "cpu":
        return cache_dir
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):
        import platform
        flags = platform.processor() or platform.machine()
    fp = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"{cache_dir}-cpu-{fp}"

"""Layered dataclass config system.

TPU-native replacement for the reference's OmegaConf structured-config stack
(/root/reference/train.py:16-61): hparams are plain dataclasses, merged from
(1) code defaults, (2) a named preset from the preset registry
(hparam_presets.py equivalent), and (3) a CLI dotlist (``model.d_model=256``).

No OmegaConf dependency: values are coerced by the declared dataclass field
types, and unknown keys raise immediately instead of silently merging.
"""
from __future__ import annotations

import dataclasses
import json
import typing
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Union


def _strip_optional(tp):
    """Optional[T] -> T (leaves other types untouched)."""
    origin = typing.get_origin(tp)
    if origin is Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return tp


def coerce_value(raw: Any, tp) -> Any:
    """Coerce a raw (usually string) CLI value to the declared field type."""
    tp = _strip_optional(tp)
    if raw is None:
        return None
    if isinstance(raw, str):
        low = raw.strip().lower()
        if low in ("none", "null"):
            return None
        if tp is bool:
            if low in ("true", "1", "yes"):
                return True
            if low in ("false", "0", "no"):
                return False
            raise ValueError(f"Cannot parse {raw!r} as bool")
        if tp is int:
            return int(raw.replace("_", ""))
        if tp is float:
            return float(raw)
        if tp is str:
            return raw
        # Fall back to literal parsing for lists/tuples/dicts
        try:
            return json.loads(raw)
        except (json.JSONDecodeError, ValueError):
            return raw
    if tp in (int, float, bool, str):
        return tp(raw)
    return raw


def parse_dotlist(items: List[str]) -> Dict[str, Any]:
    """['a.b=1', 'c=true'] -> {'a': {'b': '1'}, 'c': 'true'} (values stay raw)."""
    out: Dict[str, Any] = {}
    for item in items:
        if "=" not in item:
            raise ValueError(f"Dotlist entry {item!r} must look like key=value")
        key, value = item.split("=", 1)
        node = out
        parts = key.strip().split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise ValueError(f"Conflicting dotlist key {key!r}")
        node[parts[-1]] = value
    return out


def merge_into_dataclass(cfg, overrides: Dict[str, Any]):
    """Return a copy of dataclass `cfg` with `overrides` applied recursively.

    Unknown keys raise ValueError (the reference's OmegaConf would merge them
    silently; we prefer loud failure).
    """
    if not overrides:
        return cfg
    valid = {f.name: f for f in fields(cfg)}
    updates = {}
    for key, value in overrides.items():
        if key not in valid:
            raise ValueError(
                f"Unknown hparam {key!r} for {type(cfg).__name__}; "
                f"valid keys: {sorted(valid)}"
            )
        current = getattr(cfg, key)
        if is_dataclass(current) and isinstance(value, dict):
            updates[key] = merge_into_dataclass(current, value)
        elif isinstance(value, dict):
            updates[key] = value
        else:
            updates[key] = coerce_value(value, valid[key].type_resolved
                                        if hasattr(valid[key], "type_resolved")
                                        else _resolve_type(cfg, key))
    return dataclasses.replace(cfg, **updates)


def _resolve_type(cfg, key):
    hints = typing.get_type_hints(type(cfg))
    return hints.get(key, str)


def to_dict(cfg) -> Dict[str, Any]:
    if is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, dict):
        return {k: to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


@dataclass
class TrainerHparams:
    """Training-harness flags (the reference's Lightning `Trainer` kwargs,
    /root/reference/train.py:16-23 and hparam_presets.py `trainer` blocks)."""
    accumulate_grad_batches: int = 2
    precision: str = "bf16"           # 'bf16' | 'fp32' (TPU-native; ref used fp16 AMP)
    max_steps: Optional[int] = None   # None => run until LR decays to zero
    val_check_interval: float = 1.0   # fraction of an epoch between val runs
    limit_val_batches: Optional[int] = None
    log_every_n_steps: int = 50
    sample_every_n_steps: int = 500   # TextSamplingCallback interval (ref :12)
    checkpoint_every_n_steps: int = 1000
    early_stopping_patience: int = 3
    # Step before which the early-stopping monitor is DISARMED (no best-
    # metric tracking, no patience countdown). None = auto: the end of the
    # model's KL-annealing window when it has one, else 0. Rationale: while
    # kl_weight is still rising the monitored val metric is not comparable
    # across steps — reconstruction NLL transiently worsens as the KL term
    # phases in, which both (a) trips patience mid-anneal (measured: the
    # round-4 flagship retrain stopped at step 1131 of a 2000-step anneal)
    # and (b) pins a low-kl_weight checkpoint (a plain autoencoder, not the
    # VAE being trained) as "best".
    early_stopping_start_step: Optional[int] = None
    num_devices: Optional[int] = None  # None => all available
    # Mesh factorization: num_devices = data x seq_parallel x model_parallel.
    # seq_parallel>1 shards the batch LENGTH axis (parallel/sp.py — the
    # scaling axis for the pg19 batch-1 long-document regime);
    # model_parallel>1 shards attention heads / FFN inner dim / tied vocab
    # (parallel/tp.py).
    # expert_parallel>1 shards MoE expert stacks over an 'expert' axis
    # (parallel/ep.py; requires a num_experts>1 model config).
    seq_parallel: int = 1
    model_parallel: int = 1
    expert_parallel: int = 1
    seed: int = 7295                   # ref train.py:15
    profile_steps: int = 0             # >0: jax.profiler trace of steps 3..3+N

"""Shared model hparams and initialization helpers.

Counterpart of /root/reference/sparse_vae/core/language_model.py's
LanguageModelHparams + BERT-style init (:20-33, :80-96), minus the Lightning
machinery — training policy lives in training/trainer.py, models are pure
flax modules.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

VOCAB_SIZE = 2 ** 15  # ref transformer_language_model.py:13


@dataclass
class LanguageModelHparams:
    grad_clip_threshold: float = 5.0
    init_scale: Optional[float] = 0.02   # None => framework default init
    base_batch_size: int = 100_000       # sqrt-lr-scaling base (ref :25)
    lr: float = 2e-4
    lr_decay_steps: Optional[int] = 250_000
    start_token: Optional[int] = None    # None => read from datamodule
    end_token: Optional[int] = None
    early_stopping_metric: str = "val_nll"
    log_samples: bool = True
    weight_decay: float = 0.01           # ref language_model.py:73
    lamb: bool = False
    vocab_size: int = VOCAB_SIZE


def dense_kernel_init(init_scale: Optional[float]):
    """BERT init: N(0, init_scale) for Linear/Embedding kernels
    (language_model.py:85-96); framework default when init_scale is None."""
    if init_scale is None:
        return nn.initializers.lecun_normal()
    return nn.initializers.normal(stddev=init_scale)


def embed_init(init_scale: Optional[float]):
    if init_scale is None:
        return nn.initializers.normal(stddev=1.0)  # flax default for Embed
    return nn.initializers.normal(stddev=init_scale)


def compute_dtype(precision: str):
    return jnp.bfloat16 if precision == "bf16" else jnp.float32

"""Metrics / observability writer.

Same metric names and layout as the reference's TensorBoardLogger setup
(/root/reference/train.py:79-86 logs under ``sparse-vae-logs/<experiment>/
<name>``; scalar names per SURVEY.md §5: train/val nll, val_bpb, kl,
val_loss, mc_mutual_info, grad_norm, lr, train_bleu, plus text artifacts for
samples and reconstructions). Falls back to a JSONL writer when TensorBoard
isn't importable.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class MetricsWriter:
    def __init__(self, log_dir: Optional[Path], enabled: bool = True):
        self.enabled = enabled and log_dir is not None
        self._tb = None
        self._jsonl = None
        if not self.enabled:
            return
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=str(log_dir))
        except Exception:
            pass
        self._jsonl = open(log_dir / "metrics.jsonl", "a")

    def scalar(self, name: str, value, step: int):
        if not self.enabled:
            return
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(name, value, global_step=step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"t": time.time(), "step": step, name: value}) + "\n")
            self._jsonl.flush()

    def scalars(self, metrics: dict, step: int):
        for k, v in metrics.items():
            self.scalar(k, v, step)

    def text(self, tag: str, content: str, step: int):
        if not self.enabled:
            return
        if self._tb is not None:
            self._tb.add_text(tag, content, global_step=step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"t": time.time(), "step": step, "text_" + tag: content}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()

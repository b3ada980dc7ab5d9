"""Orbax checkpoint/resume with the reference's on-disk layout.

Replaces Lightning's ModelCheckpoint + `from_checkpoint=<name>` resume flow
(/root/reference/train.py:70-71, sparse_vae/__init__.py:17-25): checkpoints
live under ``sparse-vae-logs/<experiment>/<name>/checkpoints/step_<N>`` with
a ``meta.json`` carrying hparams + tokenizer info, and "latest" resolution
picks the highest step (the reference used newest mtime of ``*.ckpt``).

State saved: params, optimizer state, step counter, PRNG key — everything a
bit-exact resume needs (KL-anneal weight is a pure function of step, so the
step counter IS the anneal state; SURVEY.md §5 checkpoint row).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def run_dir(experiment: str, name: str, root: Optional[Path] = None) -> Path:
    root = root or (Path.cwd() / "sparse-vae-logs")
    return Path(root) / experiment / name


def checkpoints_dir(experiment: str, name: str,
                    root: Optional[Path] = None) -> Path:
    return run_dir(experiment, name, root) / "checkpoints"


def latest_checkpoint_step(ckpt_dir: Path) -> Optional[int]:
    if not ckpt_dir.exists():
        return None
    steps = []
    for child in ckpt_dir.iterdir():
        if child.name.startswith("step_") and child.is_dir():
            try:
                steps.append(int(child.name[len("step_"):]))
            except ValueError:
                continue
    return max(steps) if steps else None


def get_checkpoint_path_for_name(experiment: str, name: str,
                                 root: Optional[Path] = None) -> Path:
    """Newest checkpoint for a run name (ref __init__.py:17-25)."""
    ckpt_dir = checkpoints_dir(experiment, name, root)
    step = latest_checkpoint_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"No checkpoints under {ckpt_dir}")
    return ckpt_dir / f"step_{step}"


class CheckpointManager:
    def __init__(self, experiment: str, name: str,
                 root: Optional[Path] = None, keep: int = 3):
        self.dir = checkpoints_dir(experiment, name, root)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, state: Dict[str, Any],
             meta: Optional[Dict[str, Any]] = None, best: bool = False):
        path = self.dir / f"step_{step}"
        self._ckptr.save(path.absolute(), state, force=True)
        if meta is not None:
            (self.dir / "meta.json").write_text(json.dumps(meta, indent=2))
        if best:
            (self.dir / "best.json").write_text(json.dumps({"step": step}))
        self._gc(keep_step=step)

    def _gc(self, keep_step: int):
        best = self.best_step()
        steps = []
        for p in self.dir.iterdir():
            if p.is_dir() and p.name.startswith("step_"):
                try:
                    steps.append(int(p.name[len("step_"):]))
                except ValueError:
                    continue  # orbax tmp dirs like step_N.orbax-checkpoint-tmp
        steps.sort()
        for s in steps[:-self.keep]:
            if s != best and s != keep_step:
                import shutil
                shutil.rmtree(self.dir / f"step_{s}", ignore_errors=True)

    def best_step(self) -> Optional[int]:
        best_file = self.dir / "best.json"
        if best_file.exists():
            return json.loads(best_file.read_text()).get("step")
        return None

    def restore(self, state_template: Dict[str, Any],
                step: Optional[int] = None) -> Dict[str, Any]:
        step = step if step is not None else latest_checkpoint_step(self.dir)
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self.dir}")
        return self._ckptr.restore(
            (self.dir / f"step_{step}").absolute(), state_template)

    def meta(self) -> Optional[Dict[str, Any]]:
        meta_file = self.dir / "meta.json"
        return json.loads(meta_file.read_text()) if meta_file.exists() else None

    def close(self):
        """Block on orbax's background commit threads — without this a
        process exiting right after save() races the async metadata write
        ('cannot schedule new futures after shutdown')."""
        self._ckptr.close()


def load_run_meta(experiment: str, name: str,
                  root: Optional[Path] = None) -> Optional[Dict[str, Any]]:
    """The run's saved hparams (meta.json), or None when absent."""
    meta_file = checkpoints_dir(experiment, name, root) / "meta.json"
    return json.loads(meta_file.read_text()) if meta_file.exists() else None


def restore_checkpoint(path: Path, state_template: Dict[str, Any]):
    """Restore a specific checkpoint directory (eval-script entry point,
    the `load_from_checkpoint` equivalent)."""
    return ocp.StandardCheckpointer().restore(Path(path).absolute(),
                                              state_template)

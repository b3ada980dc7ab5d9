"""Tracing / profiling hooks.

The reference only had a commented-out PyTorchProfiler block and an unused
`profile` flag (/root/reference/train.py:88-92). Here profiling is a
first-class subsystem: `jax.profiler` traces (viewable in TensorBoard's
profile plugin or Perfetto) plus named annotations around the training
phases so encoder/decoder/loss show up as labeled spans in the trace.
"""
from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[Path], enabled: bool = True) -> Iterator[None]:
    """Capture a device+host profile into <log_dir>/plugins/profile.

    Usage: wrap a handful of steady-state steps, not the compile step —
    traces that include compilation are dominated by it.
    """
    if not enabled or log_dir is None:
        yield
        return
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span context for trace readability (encoder/decoder/loss)."""
    return jax.profiler.TraceAnnotation(name)


def annotate_fn(name: str):
    """Decorator form: the function body shows up as `name` in traces."""
    def wrap(fn):
        def inner(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)
        return inner
    return wrap

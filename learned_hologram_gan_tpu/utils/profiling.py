"""Profiling / tracing (SURVEY.md section 5: the jax.profiler answer to the
reference's CUDA-event ``gpu_timer``, utilities.py:447-472).

* :func:`trace` — context manager writing a TensorBoard-viewable profile
  (XLA device traces + host annotations) to a directory.
* :func:`annotate` — named host-side region, visible in the trace timeline.
* :func:`profile_op` — one-shot helper: trace a callable for N steps and
  return the trace directory.
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device+host profile under ``log_dir`` (TensorBoard format)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (usable as context manager)."""
    return jax.profiler.TraceAnnotation(name)


def profile_op(
    operation: Callable[[], object],
    log_dir: str,
    steps: int = 3,
    warmup: int = 1,
) -> str:
    """Run ``operation`` under the profiler; returns the trace directory."""
    from .timer import _materialize

    for _ in range(warmup):
        _materialize(operation())
    with trace(log_dir):
        for i in range(steps):
            with annotate(f"step_{i}"):
                out = operation()
        _materialize(out)
    return log_dir

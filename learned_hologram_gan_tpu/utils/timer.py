"""Device-accurate timing (the JAX answer to reference utilities.gpu_timer).

The reference measures CUDA-event latency over N repeats
(utilities.py:447-472).  On TPU the equivalent is wall-clock around
``jax.block_until_ready`` after a warm-up/compile call.
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def device_timer(operation: Callable[[], object], repeat: int = 100, warmup: int = 2) -> float:
    """Mean latency of ``operation`` in milliseconds over ``repeat`` runs.

    ``operation`` should return a jax array (or pytree of them); each run is
    synchronized with ``block_until_ready`` so the number reflects device
    execution, not dispatch.
    """
    for _ in range(warmup):
        jax.block_until_ready(operation())
    start = time.perf_counter()
    for _ in range(repeat):
        jax.block_until_ready(operation())
    return (time.perf_counter() - start) * 1e3 / repeat

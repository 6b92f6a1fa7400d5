"""Device-accurate timing (the JAX answer to reference utilities.gpu_timer).

The reference measures CUDA-event latency over N repeats
(utilities.py:447-472).  On TPU the equivalent is wall-clock around
``jax.block_until_ready`` after a warm-up/compile call.
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def _materialize(result) -> None:
    """Force a true device->host round trip on every leaf's first element.

    ``block_until_ready`` alone is not trusted: some transports resolve the
    ready-event before execution completes.  A host fetch cannot lie — the
    bytes must exist.  Device streams execute in order, so fetching the last
    queued result synchronizes everything before it.
    """
    import jax.numpy as jnp
    import numpy as np

    for leaf in jax.tree.leaves(result):
        if hasattr(leaf, "addressable_shards"):
            elem = leaf.reshape(-1)[:1]
            if jnp.iscomplexobj(elem):
                # complex device->host transfers are not supported on every
                # transport (e.g. the axon relay); fetch the magnitude.
                elem = jnp.abs(elem)
            np.asarray(jax.device_get(elem))


def device_timer(operation: Callable[[], object], repeat: int = 100, warmup: int = 2) -> float:
    """Mean latency of ``operation`` in milliseconds over ``repeat`` runs.

    ``operation`` should return a jax array (or pytree of them); runs are
    synchronized with a real host fetch so the number reflects device
    execution, not dispatch.
    """
    for _ in range(warmup):
        _materialize(operation())
    start = time.perf_counter()
    for _ in range(repeat):
        out = operation()
    _materialize(out)
    return (time.perf_counter() - start) * 1e3 / repeat

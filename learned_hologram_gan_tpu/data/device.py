"""Device-resident datasets: upload once, gather batches on-device.

Motivation (measured on this host, 2026-08-17): every host->device transfer
through the axon TPU relay PINS its host buffer permanently (~22.5 MB leaked
per 23.6 MB batch; D2H fetches do not leak).  A 50-epoch config-of-record run
streams ~500 GB of batches, so the streaming loader OOM-killed the host at
130 GB RSS mid-run.  Independent of the leak, this is also the TPU-idiomatic
layout for datasets that fit HBM (MIT-CGH-4K at 384^2: 3.5 GB against 16 GB):
the train loop does ZERO per-step host transfers — batches are on-device
gathers of resident arrays, so the input pipeline can never be the
bottleneck and the host never touches sample bytes after startup.

Use the streaming :func:`~learned_hologram_gan_tpu.data.prefetch.epoch_loader`
instead when the dataset exceeds HBM (1080p/4K training).
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .memmap import batch_indices


def dataset_to_device(
    dataset, sharding=None, dtype=None
) -> Tuple[jnp.ndarray, ...]:
    """Materialize an entire memmap dataset on device, one field at a time.

    Uses the dataset's own ``get()`` so field semantics (RGBD assembly,
    phase 2*pi scaling) match the streaming loader exactly.  Host memory is
    transient (one copy of the dataset); device memory is permanent for
    the run.  ``sharding`` optionally places each field (e.g. replicated
    under a mesh).  ``dtype`` stores the resident arrays in a narrower type
    (``jnp.bfloat16`` halves the HBM footprint — e.g. the 384^2 config of
    record at batch 16 needs the headroom; bf16-rounded supervision targets
    are inconsequential next to bf16 training compute).
    """
    n = len(dataset)
    fields = dataset.get(0)
    if not isinstance(fields, tuple):
        fields = (fields,)
    np_dtype = np.float32 if dtype is None else np.dtype(dtype)
    bufs = [
        np.empty((n,) + np.asarray(f).shape, np_dtype) for f in fields
    ]
    for i in range(n):
        sample = dataset.get(i)
        if not isinstance(sample, tuple):
            sample = (sample,)
        for buf, f in zip(bufs, sample):
            buf[i] = f
    put = (lambda a: jax.device_put(a, sharding)) if sharding else jnp.asarray
    return tuple(put(b) for b in bufs)


@functools.partial(jax.jit, static_argnums=())
def _gather(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(arr, idx, axis=0)


def device_epoch_loader(
    arrays: Tuple[jnp.ndarray, ...],
    batch_size: int,
    *,
    shuffle: bool,
    drop_last: bool,
    seed: Optional[int] = None,
) -> Iterator[Tuple[jnp.ndarray, ...]]:
    """One epoch of on-device batches over device-resident field arrays.

    Drop-in for :func:`epoch_loader`: same batching/shuffle/drop_last
    semantics (``batch_indices``), but each batch is a device-side gather —
    the only per-batch host->device traffic is the int32 index vector
    (16 bytes at batch 4).
    """
    n = arrays[0].shape[0]
    for idx in batch_indices(n, batch_size, shuffle=shuffle,
                             drop_last=drop_last, seed=seed):
        ii = jnp.asarray(np.asarray(idx, np.int32))
        yield tuple(_gather(a, ii) for a in arrays)

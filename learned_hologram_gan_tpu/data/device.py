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


class _DatasetSlice:
    """Contiguous index-range view of a host dataset (same ``get`` field
    semantics)."""

    def __init__(self, dataset, lo: int, hi: int):
        self._dataset, self._lo, self._hi = dataset, lo, hi

    def __len__(self) -> int:
        return self._hi - self._lo

    def get(self, i: int):
        return self._dataset.get(self._lo + i)


class RotatingDeviceDataset:
    """Device residency for datasets LARGER than HBM allows resident.

    The middle ground between full residency (``dataset_to_device``: zero
    per-step host traffic, but the whole set must fit next to the train
    step) and per-step streaming (unusable on a slow or leak-prone host
    link): sample indices split into ``shards`` contiguous blocks, and at
    most ONE block is resident at a time.  Epochs are scheduled onto
    shards in ``block_epochs``-epoch runs (A,A,B,B,A,A,... for
    ``shards=2, block_epochs=2``) so upload cost amortizes over several
    epochs; each epoch is a full shuffle WITHIN its resident shard
    (block-shuffled epochs — the standard accelerator-memory pattern when
    the set exceeds device memory).  Swapping deletes the old shard's
    buffers before uploading the next, so peak residency is one shard.

    Motivating case (BASELINE.md round 5): the 3,800-sample 384^2 set is
    11.2 GB in bf16 — resident next to the WGAN-GP step it OOMs a 16 GB
    chip, and the relay link measured ~10 MB/s, pricing per-step
    streaming at ~3x the step itself.  ``shards=2`` holds 5.6 GB.
    """

    def __init__(self, dataset, shards: int = 2, dtype=None,
                 block_epochs: int = 2):
        if shards < 1:
            raise ValueError(f"shards must be >= 1, got {shards}")
        self.shards = shards
        self.block_epochs = block_epochs
        self._dtype = dtype
        n = len(dataset)
        bounds = np.linspace(0, n, shards + 1).astype(int)
        self._slices = [
            _DatasetSlice(dataset, int(lo), int(hi))
            for lo, hi in zip(bounds[:-1], bounds[1:])
        ]
        self._resident: Optional[Tuple[int, Tuple[jnp.ndarray, ...]]] = None

    def shard_for_epoch(self, epoch: int) -> int:
        return (epoch // self.block_epochs) % self.shards

    def arrays_for_epoch(self, epoch: int) -> Tuple[jnp.ndarray, ...]:
        """The resident field arrays for ``epoch``'s shard (swapping in
        as needed)."""
        s = self.shard_for_epoch(epoch)
        if self._resident is not None and self._resident[0] == s:
            return self._resident[1]
        if self._resident is not None:
            for a in self._resident[1]:
                a.delete()  # free HBM BEFORE the next upload
            self._resident = None
        arrays = dataset_to_device(self._slices[s], dtype=self._dtype)
        self._resident = (s, arrays)
        return arrays

    def epoch_loader(self, batch_size: int, epoch: int, *, shuffle: bool = True,
                     drop_last: bool = True, seed: Optional[int] = None):
        return device_epoch_loader(
            self.arrays_for_epoch(epoch), batch_size,
            shuffle=shuffle, drop_last=drop_last, seed=seed,
        )

    def evict(self) -> None:
        """Free the resident shard (e.g. before another stage needs the
        HBM); the next ``arrays_for_epoch`` re-uploads."""
        if self._resident is not None:
            for a in self._resident[1]:
                a.delete()
            self._resident = None

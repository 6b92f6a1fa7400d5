"""Memmap-backed datasets over the MIT-CGH-4K ``.bin`` files.

Rebuild of reference ``watermelon_hologram/data_loader.py:8-123``.  The
reference moves each sample host->device inside ``__getitem__``; here the
datasets stay pure-numpy (zero-copy memmap views) and batching / device
transfer is handled by :mod:`.prefetch`, which overlaps the host->HBM copy of
batch N+1 with the device compute of batch N.

``.bin`` layout: raw float32, C-order, shape (N, C, H, W) — written by
``ndarray.tofile`` (reference data_processor.py:93-106).  Phase bins store
phase normalized to [0, 1]; scaling by 2*pi happens at the consumer exactly
where the reference does it.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


def _open_bin(path: str, shape: Tuple[int, int, int, int]) -> np.memmap:
    return np.memmap(path, dtype=np.float32, mode="r", shape=shape)


class _MemmapDataset:
    """Base: indexable + length, numpy outputs."""

    def __len__(self) -> int:
        return self.num_samples

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            if idx < 0 or idx >= len(self):
                raise IndexError("Index out of range")
        return self.get(idx)


class ImgDepthAmpPhsDataset(_MemmapDataset):
    """(RGBD, amp, phs) triplets (reference data_loader.py:8-52).

    RGBD = concat(img[3ch], depth[first channel]) -> 4 channels.
    """

    def __init__(
        self,
        img_path: str,
        depth_path: str,
        amp_path: str,
        phs_path: str,
        samples_num: int = 3800,
        channels_num: int = 3,
        height: int = 192,
        width: int = 192,
    ):
        shape = (samples_num, channels_num, height, width)
        self.num_samples = samples_num
        self.img = _open_bin(img_path, shape)
        self.depth = _open_bin(depth_path, shape)
        self.amp = _open_bin(amp_path, shape)
        self.phs = _open_bin(phs_path, shape)

    def get(self, idx):
        rgbd = np.concatenate(
            [self.img[idx], self.depth[idx][..., :1, :, :]], axis=-3
        )
        return rgbd, np.asarray(self.amp[idx]), np.asarray(self.phs[idx])


class AmpPhsDataset(_MemmapDataset):
    """(amp, 2*pi*phs) pairs for AP2POH pre-training (reference :55-84)."""

    def __init__(
        self,
        amp_path: str,
        phs_path: str,
        samples_num: int = 3800,
        channels_num: int = 3,
        height: int = 192,
        width: int = 192,
    ):
        shape = (samples_num, channels_num, height, width)
        self.num_samples = samples_num
        self.amp = _open_bin(amp_path, shape)
        self.phs = _open_bin(phs_path, shape)

    def get(self, idx):
        return np.asarray(self.amp[idx]), 2.0 * np.pi * np.asarray(self.phs[idx])


class ImgDepthDataset(_MemmapDataset):
    """RGBD only, for inference (reference :87-123)."""

    def __init__(
        self,
        img_path: str,
        depth_path: str,
        samples_num: int = 3800,
        channels_num: int = 3,
        height: int = 192,
        width: int = 192,
    ):
        shape = (samples_num, channels_num, height, width)
        self.num_samples = samples_num
        self.img = _open_bin(img_path, shape)
        self.depth = _open_bin(depth_path, shape)

    def get(self, idx):
        return np.concatenate(
            [self.img[idx], self.depth[idx][..., :1, :, :]], axis=-3
        )


def batch_indices(
    num_samples: int,
    batch_size: int,
    *,
    shuffle: bool,
    drop_last: bool,
    seed: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Epoch index batches (the reference's DataLoader semantics:
    shuffle+drop_last for train, ordered for val — trainingModel.py:32-57)."""
    order = np.arange(num_samples)
    if shuffle:
        rng = np.random.default_rng(seed)
        rng.shuffle(order)
    end = (num_samples // batch_size) * batch_size if drop_last else num_samples
    for start in range(0, end, batch_size):
        yield order[start : start + batch_size]


def gather_batch(dataset: _MemmapDataset, idx: Sequence[int]):
    """Stack dataset[i] for i in idx into batched numpy arrays."""
    samples = [dataset.get(int(i)) for i in idx]
    if isinstance(samples[0], tuple):
        return tuple(np.stack(parts) for parts in zip(*samples))
    return np.stack(samples)

"""Device-resident loader (data/device.py) vs the streaming loader.

Same batching/shuffle/drop_last semantics, bitwise-identical batches — the
device path exists because the axon TPU relay pins every H2D buffer on the
host (a 130 GB leak over the 50-epoch config-of-record run; BASELINE.md
round-3 notes), so multi-hour training must gather batches on-device.
"""

import os
import tempfile

import numpy as np
import pytest

from learned_hologram_gan_tpu.data import (
    AmpPhsDataset,
    ImgDepthAmpPhsDataset,
    dataset_to_device,
    device_epoch_loader,
    epoch_loader,
)


@pytest.fixture(scope="module")
def bins():
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(1)
    for n in ("img", "depth", "amp", "phs"):
        rng.random((5, 3, 8, 8)).astype(np.float32).tofile(
            os.path.join(d, n + ".bin")
        )
    return d


def _paths(d, names):
    return {f"{n}_path": os.path.join(d, n + ".bin") for n in names}


@pytest.mark.parametrize("shuffle,drop_last,batch", [
    (True, True, 2), (False, False, 2), (True, False, 3),
])
def test_device_loader_matches_streaming(bins, shuffle, drop_last, batch):
    ds = ImgDepthAmpPhsDataset(
        **_paths(bins, ("img", "depth", "amp", "phs")),
        samples_num=5, channels_num=3, height=8, width=8,
    )
    dev = dataset_to_device(ds)
    got = list(device_epoch_loader(dev, batch, shuffle=shuffle,
                                   drop_last=drop_last, seed=7))
    want = list(epoch_loader(ds, batch, shuffle=shuffle,
                             drop_last=drop_last, seed=7))
    assert len(got) == len(want) > 0
    for ba, bb in zip(got, want):
        assert len(ba) == len(bb) == 3
        for xa, xb in zip(ba, bb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_rotating_device_dataset_schedule_coverage_and_eviction(bins):
    """RotatingDeviceDataset: 2-epoch shard blocks, at most one shard
    resident (old buffers really deleted), every sample reachable, and
    batches bitwise-equal to gathering from the full resident set."""
    from learned_hologram_gan_tpu.data import RotatingDeviceDataset

    ds = ImgDepthAmpPhsDataset(
        **_paths(bins, ("img", "depth", "amp", "phs")),
        samples_num=5, channels_num=3, height=8, width=8,
    )
    rot = RotatingDeviceDataset(ds, shards=2, block_epochs=2)
    # schedule: epochs 0,1 -> shard 0; 2,3 -> shard 1; 4,5 -> shard 0 ...
    assert [rot.shard_for_epoch(e) for e in range(6)] == [0, 0, 1, 1, 0, 0]

    full = dataset_to_device(ds)
    seen = set()
    prev_arrays = None
    for epoch in range(4):
        arrays = rot.arrays_for_epoch(epoch)
        if prev_arrays is not None and arrays is not prev_arrays:
            assert all(a.is_deleted() for a in prev_arrays)  # HBM freed
        prev_arrays = arrays
        lo = 0 if rot.shard_for_epoch(epoch) == 0 else len(rot._slices[0])
        for batch in rot.epoch_loader(2, epoch, shuffle=False,
                                      drop_last=False):
            n = np.asarray(batch[0]).shape[0]
            for field, ref in zip(batch, full):
                np.testing.assert_array_equal(
                    np.asarray(field),
                    np.asarray(ref[lo : lo + n]),
                )
            seen.update(range(lo, lo + n))
            lo += n
    assert seen == set(range(5))  # both shards covered across the schedule


def test_device_loader_amp_phs_scaling(bins):
    """dataset_to_device preserves the 2*pi phase scaling of AmpPhsDataset."""
    ds = AmpPhsDataset(
        **_paths(bins, ("amp", "phs")),
        samples_num=5, channels_num=3, height=8, width=8,
    )
    dev = dataset_to_device(ds)
    (amp, phs), = list(device_epoch_loader(dev, 5, shuffle=False,
                                           drop_last=False))
    a0, p0 = ds.get(0)
    np.testing.assert_array_equal(np.asarray(amp[0]), a0)
    np.testing.assert_array_equal(np.asarray(phs[0]), p0)
    assert float(np.max(np.asarray(phs))) > 1.0  # scaled beyond [0, 1]

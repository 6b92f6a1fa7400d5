"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.config import OpticsConfig
from learned_hologram_gan_tpu.ops import asm
from learned_hologram_gan_tpu.parallel import (
    make_mesh,
    pad_batch_to_devices,
    shard_batch,
    shard_distance_stack,
)


def test_virtual_mesh_has_8_devices():
    assert jax.device_count() == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)


def test_shard_batch_places_leading_axis():
    mesh = make_mesh()
    batch = (np.ones((8, 4, 8, 8), np.float32), np.ones((8, 3, 8, 8), np.float32))
    sharded = shard_batch(batch, mesh)
    for arr in sharded:
        assert len(arr.sharding.device_set) == 8


def test_pad_batch_to_devices():
    batch = np.arange(6 * 2, dtype=np.float32).reshape(6, 2)
    padded, orig = pad_batch_to_devices(batch, 4)
    assert padded.shape == (8, 2) and orig == 6
    np.testing.assert_array_equal(padded[6], padded[5])


def test_distance_sharded_propagation_matches_single_device():
    """Distance-plane parallelism must be bit-compatible with one device."""
    optics = OpticsConfig(rows=16, cols=16, pad_size=4,
                          filter_radius_coefficient=0.45)
    ds = np.linspace(4e-4, 1e-3, 8)
    plan = asm.make_plan(optics, distances=ds)
    rng = np.random.default_rng(3)
    amp = jnp.asarray(rng.random((1, 3, 16, 16)).astype(np.float32))
    phs = jnp.asarray(rng.random((1, 3, 16, 16)).astype(np.float32))

    want = np.asarray(asm.propagate_batch_multi(plan, amp, phs))

    mesh = make_mesh()
    plan_sharded = shard_distance_stack(plan, mesh)
    got = np.asarray(asm.propagate_batch_multi(plan_sharded, amp, phs))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dryrun_multichip_full_train_step():
    """The driver's multi-chip dry run: full GAN step on the 8-device mesh."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

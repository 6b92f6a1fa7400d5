"""Distributed pencil FFT + sharded ASM propagation vs single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.config import OpticsConfig
from learned_hologram_gan_tpu.ops import asm
from learned_hologram_gan_tpu.parallel import make_mesh
from learned_hologram_gan_tpu.parallel.fft import (
    sharded_fft2,
    sharded_propagate_batch_multi,
)

RNG = np.random.default_rng(51)


def test_sharded_fft2_matches_local():
    mesh = make_mesh()
    x = jnp.asarray(
        (RNG.random((2, 3, 32, 16)) + 1j * RNG.random((2, 3, 32, 16))).astype(np.complex64)
    )
    got = np.asarray(sharded_fft2(x, mesh))
    want = np.asarray(jnp.fft.fft2(x))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_ifft2_roundtrip():
    mesh = make_mesh()
    x = jnp.asarray(
        (RNG.random((1, 3, 64, 32)) + 1j * RNG.random((1, 3, 64, 32))).astype(np.complex64)
    )
    rt = sharded_fft2(sharded_fft2(x, mesh), mesh, inverse=True)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), atol=1e-5)


def test_sharded_propagation_matches_single_device():
    # rows padded: 16 + 2*8 = 32, divisible by the 8-device mesh
    optics = OpticsConfig(rows=16, cols=16, pad_size=8,
                          filter_radius_coefficient=0.45)
    ds = np.linspace(4e-4, 1e-3, 3)
    plan = asm.make_plan(optics, distances=ds, cache_h=False)
    amp = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))
    phs = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))

    want = np.asarray(asm.propagate_batch_multi(plan, amp, phs))
    mesh = make_mesh()
    got = np.asarray(sharded_propagate_batch_multi(plan, amp, phs, mesh))
    assert got.shape == want.shape == (6, 3, 16, 16)
    np.testing.assert_allclose(got, want, atol=2e-4)

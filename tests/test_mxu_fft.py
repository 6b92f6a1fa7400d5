"""MXU-GEMM FFT vs jnp.fft: correctness across sizes, dtypes, inverse."""

import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.ops.mxu_fft import (
    best_factor_pair,
    fft2_mxu,
    ifft2_mxu,
)

RNG = np.random.default_rng(61)


def _rand_c(*shape):
    return jnp.asarray(
        (RNG.random(shape) + 1j * RNG.random(shape)).astype(np.complex64)
    )


def test_best_factor_pair():
    assert best_factor_pair(1024) == (32, 32)
    assert best_factor_pair(1000) == (25, 40)
    assert best_factor_pair(12) == (3, 4)
    assert best_factor_pair(13) is None  # prime


@pytest.mark.parametrize("shape", [(2, 3, 32, 32), (1, 64, 48), (2, 3, 36, 100)])
def test_fft2_mxu_matches_jnp(shape):
    x = _rand_c(*shape)
    got = np.asarray(fft2_mxu(x))
    want = np.asarray(jnp.fft.fft2(x))
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


def test_ifft2_mxu_matches_jnp():
    x = _rand_c(2, 3, 40, 60)
    got = np.asarray(ifft2_mxu(x))
    want = np.asarray(jnp.fft.ifft2(x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_roundtrip():
    x = _rand_c(1, 3, 48, 48)
    rt = np.asarray(ifft2_mxu(fft2_mxu(x)))
    np.testing.assert_allclose(rt, np.asarray(x), atol=1e-5)


def test_prime_size_falls_back():
    x = _rand_c(1, 13, 13)
    got = np.asarray(fft2_mxu(x))
    want = np.asarray(jnp.fft.fft2(x))
    np.testing.assert_allclose(got, want, atol=1e-4)

"""Unit tests for the mask factories against independent numpy math."""

import numpy as np
import pytest

from learned_hologram_gan_tpu.ops import masks


def _numpy_radial(rows, cols):
    shorter = min(rows, cols)
    u = np.fft.fftfreq(rows)[:, None]
    v = np.fft.fftfreq(cols)[None, :]
    return np.sqrt(u**2 + v**2) * shorter


def test_radial_grid_matches_numpy():
    got = np.asarray(masks.radial_frequency_grid(24, 36))
    want = _numpy_radial(24, 36)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_circular_mask_hard_edge():
    rows, cols, radius = 32, 32, 10.0
    got = np.asarray(masks.circular_frequency_mask(rows, cols, radius))
    d = _numpy_radial(rows, cols)
    want = np.where(d > radius, 0.0, 1.0)
    np.testing.assert_array_equal(got, want)
    # DC always passes; strict > keeps D == radius inside the band.
    assert got[0, 0] == 1.0


def test_circular_mask_decay():
    rows, cols, radius, decay = 32, 32, 8.0, 0.3
    got = np.asarray(masks.circular_frequency_mask(rows, cols, radius, decay_rate=decay))
    d = _numpy_radial(rows, cols)
    want = np.where(d > radius, np.exp(-decay * (d - radius)), 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_circular_mask_radius_validation():
    with pytest.raises(ValueError):
        masks.circular_frequency_mask(32, 32, 17.0)


def test_differentiable_mask_is_sigmoid_edge():
    grid = masks.radial_frequency_grid(16, 16)
    m = np.asarray(masks.differentiable_circular_mask(grid, 4.0))
    d = _numpy_radial(16, 16)
    want = 1.0 / (1.0 + np.exp(-(4.0 - d)))
    np.testing.assert_allclose(m, want, rtol=1e-5, atol=1e-6)


def test_square_mask_shape_and_shift():
    m = np.asarray(masks.square_frequency_mask(16, 16, 2, 3))
    assert m.shape == (16, 16)
    # ifftshift puts the center of the square at the DC corner.
    assert m[0, 0] == 1.0
    assert m.sum() == (2 * 2 + 1) * (2 * 3 + 1)
    with pytest.raises(ValueError):
        masks.square_frequency_mask(16, 16, 9, 0)


def test_band_limit_mask_monotone_in_distance():
    m = np.asarray(
        masks.band_limit_mask(64, 64, 3.74e-6, [638e-9, 520e-9, 450e-9], np.array([1e-4, 1e-3]))
    )
    assert m.shape == (2, 3, 64, 64)
    # Larger distance -> tighter band -> fewer passed frequencies.
    assert m[1].sum() <= m[0].sum()
    # Shorter wavelength -> wider band.
    assert m[0, 2].sum() >= m[0, 0].sum()


def test_checkerboard_complementary():
    a = np.asarray(masks.checkerboard_mask(8, 10, cell_size=1, invert=False))
    b = np.asarray(masks.checkerboard_mask(8, 10, cell_size=1, invert=True))
    np.testing.assert_array_equal(a + b, np.ones((8, 10)))
    assert a[0, 0] == 0.0 and a[0, 1] == 1.0 and a[1, 0] == 1.0


def test_checkerboard_cell_size():
    a = np.asarray(masks.checkerboard_mask(8, 8, cell_size=2))
    assert a[0, 0] == a[0, 1] == a[1, 0] == a[1, 1]
    assert a[0, 2] == 1.0 - a[0, 0]

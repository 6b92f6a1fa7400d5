"""Frequency- and spatial-domain mask factories.

Pure-jnp rebuild of the mask helpers in the reference ``utilities.py``:
circular low-pass (utilities.py:206-273), differentiable radial grid
(utilities.py:276-296), square mask (utilities.py:299-324), band-limit mask
(utilities.py:327-351 / angular_spectrum_method.py:173-193) and checkerboard
(utilities.py:354-382).  All functions are shape-static and trace-free so they
can be precomputed once into a propagator plan and live in HBM.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def radial_frequency_grid(rows: int, cols: int) -> jnp.ndarray:
    """Radial distance (in units of the shorter edge) on the fftfreq grid.

    Equivalent to reference utilities.prepare_circular_frequency_mask_grid
    (utilities.py:276-296): ``D = sqrt(u^2 + v^2) * min(rows, cols)`` with
    ``u = fftfreq(rows)`` down the rows and ``v = fftfreq(cols)`` across the
    columns.
    """
    shorter = min(rows, cols)
    u = np.fft.fftfreq(rows).astype(np.float32)[:, None]
    v = np.fft.fftfreq(cols).astype(np.float32)[None, :]
    return jnp.asarray(np.sqrt(u * u + v * v) * shorter, dtype=jnp.float32)


def circular_frequency_mask(
    rows: int,
    cols: int,
    radius: float,
    decay_rate: Optional[float] = None,
    validate: bool = True,
) -> jnp.ndarray:
    """Hard (or exponentially decaying) circular low-pass mask.

    Matches reference utilities.generate_circular_frequency_mask
    (utilities.py:206-243): 1 inside ``D <= radius`` (strict ``>`` zeroes), and
    optionally ``exp(-decay * (D - radius))`` outside.
    """
    shorter = min(rows, cols)
    if validate and radius > shorter / 2:
        raise ValueError(
            f"The radius {radius} is larger than the half of the sample size "
            f"{shorter / 2}"
        )
    d = radial_frequency_grid(rows, cols)
    if decay_rate is not None:
        outside = jnp.exp(-decay_rate * (d - radius))
    else:
        outside = jnp.zeros_like(d)
    return jnp.where(d > radius, outside, jnp.ones_like(d))


def differentiable_circular_mask(
    radial_grid: jnp.ndarray, radius: jnp.ndarray | float
) -> jnp.ndarray:
    """Sigmoid-edged circular low-pass, differentiable w.r.t. ``radius``.

    Matches reference angular_spectrum_method.py:426-436:
    ``sigmoid(radius - D)``.
    """
    from jax.nn import sigmoid

    return sigmoid(1.0 * (radius - radial_grid))


def square_frequency_mask(rows: int, cols: int, x: int = 0, y: int = 0) -> jnp.ndarray:
    """Centered square pass-band of half-extent (x, y), ifftshifted.

    Matches reference utilities.generate_square_frequency_mask
    (utilities.py:299-324).
    """
    if 2 * x > rows or 2 * y > cols:
        raise ValueError("The mask size is too large.")
    mask = np.zeros((rows, cols), dtype=np.float32)
    mask[rows // 2 - x : rows // 2 + 1 + x, cols // 2 - y : cols // 2 + 1 + y] = 1.0
    return jnp.asarray(np.fft.ifftshift(mask))


def band_limit_mask(
    rows: int,
    cols: int,
    pixel_pitch: float,
    wavelengths: Sequence[float],
    distances: jnp.ndarray,
) -> jnp.ndarray:
    """Matsushima-style band limit per (distance, wavelength).

    Matches reference angular_spectrum_method.generate_band_limited_mask
    (angular_spectrum_method.py:173-193):
    ``u_limit = 1 / (sqrt((2*du*z)^2 + 1) * lambda)`` with
    ``du = 1/(rows*pitch)``, ``dv = 1/(cols*pitch)``; mask is the outer AND of
    the |fx| < u_limit and |fy| < v_limit bands.  Returns a float mask of
    shape (D, C, rows, cols).  (Note: the reference computes but never applies
    this mask — its ``band_limit`` flag is a no-op; here it is a usable op.)
    """
    wl = jnp.asarray(wavelengths, dtype=jnp.float32)  # (C,)
    z = jnp.atleast_1d(jnp.asarray(distances, dtype=jnp.float32))  # (D,)
    freq_x = jnp.asarray(np.fft.fftfreq(rows, pixel_pitch), dtype=jnp.float32)
    freq_y = jnp.asarray(np.fft.fftfreq(cols, pixel_pitch), dtype=jnp.float32)

    d_u = 1.0 / (rows * pixel_pitch)
    d_v = 1.0 / (cols * pixel_pitch)
    u_limit = 1.0 / (jnp.sqrt((2.0 * d_u * z[:, None]) ** 2 + 1.0) * wl[None, :])
    v_limit = 1.0 / (jnp.sqrt((2.0 * d_v * z[:, None]) ** 2 + 1.0) * wl[None, :])

    mask_u = jnp.abs(freq_x)[None, None, :, None] < u_limit[:, :, None, None]
    mask_v = jnp.abs(freq_y)[None, None, None, :] < v_limit[:, :, None, None]
    return (mask_u & mask_v).astype(jnp.float32)


def checkerboard_mask(
    height: int, width: int, cell_size: int = 4, invert: bool = False
) -> jnp.ndarray:
    """(x//cell + y//cell) % 2 checkerboard, optionally inverted.

    Matches reference utilities.generate_checkerboard_mask
    (utilities.py:354-382; its ``reserve`` flag == ``invert`` here).  Used by
    the double-phase encoder with cell_size=1 (reference AP2POH.py:37-49).
    """
    x = np.arange(width).reshape(1, -1) // cell_size
    y = np.arange(height).reshape(-1, 1) // cell_size
    board = ((x + y) % 2).astype(np.float32)
    if invert:
        board = 1.0 - board
    return jnp.asarray(board)

"""2-D FFT computed as batched MXU matmuls (four-step Cooley–Tukey).

XLA's native TPU FFT is a VPU/memory kernel that reaches only a fraction of
HBM bandwidth (~0.5 ms for a 1024^2 complex64 transform — ~70 GB/s effective,
measured in BASELINE.md).  The systolic array is idle during that time.  This
module reformulates the length-N DFT with the four-step algorithm

    N = N1 * N2,  x viewed as A[n1, n2]   (n = n1*N2 + n2)
    B = DFT_{N1} @ A            (columns transform — a batched GEMM)
    C = B * twiddle             (omega_N^{k1*n2}, elementwise)
    X = C @ DFT_{N2}^T          (rows transform — a batched GEMM)
    X[k1, k2] == FFT(x)[k2*N1 + k1]  (transposed digit order, fixed by a
                                      gather-free reshape/transpose)

so the whole transform becomes two (N1 x N1)/(N2 x N2) GEMMs over a large
batch — exactly what the MXU is built for.  Complex arithmetic is carried as
separate float32 planes (4 real GEMMs per complex GEMM, f32 accumulation), so
accuracy is FFT-grade (~1e-6 relative; validated against jnp.fft in
tests/test_mxu_fft.py).

Supports any N whose factor pair (N1, N2) exists with both factors >= 2 —
use 5-smooth padded sizes (utils/fftlen.py) so near-square factorizations
exist.  Falls back to ``jnp.fft`` for primes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def best_factor_pair(n: int) -> Optional[Tuple[int, int]]:
    """(N1, N2) with N1*N2 == n, both > 1, as near-square as possible."""
    best = None
    for n1 in range(int(math.isqrt(n)), 1, -1):
        if n % n1 == 0:
            best = (n1, n // n1)
            break
    return best


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(re, im) of the n-point DFT matrix W[j, k] = exp(-+2*pi*i*j*k/n)."""
    j = np.arange(n)[:, None].astype(np.float64)
    k = np.arange(n)[None, :].astype(np.float64)
    sign = 2.0 * np.pi / n * (1.0 if inverse else -1.0)
    theta = sign * j * k
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _twiddle(n1: int, n2: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(re, im) of omega_N^{+-k1*n2}, shape (n1, n2)."""
    n = n1 * n2
    k1 = np.arange(n1)[:, None].astype(np.float64)
    m2 = np.arange(n2)[None, :].astype(np.float64)
    sign = 2.0 * np.pi / n * (1.0 if inverse else -1.0)
    theta = sign * k1 * m2
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)


def _cmatmul(ar, ai, br, bi, transpose_b=False):
    """(ar + i*ai) @ (br + i*bi) with f32 MXU GEMMs.

    Precision.HIGHEST forces true-f32 accumulation (6-pass bf16 on the MXU)
    — the TPU default bf16 matmul precision costs ~1e-2 absolute error at
    1024-point transforms, blowing the 1e-3 parity budget.
    """
    dn = (((ar.ndim - 1,), (1 if transpose_b else 0,)), ((), ()))

    def mm(x, w):
        return jax.lax.dot_general(
            x, w, dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    rr = mm(ar, br) - mm(ai, bi)
    ri = mm(ar, bi) + mm(ai, br)
    return rr, ri


def _fft1_last(xr, xi, n1: int, n2: int, inverse: bool):
    """Length-(n1*n2) DFT along the LAST axis of (..., N) via four-step."""
    n = n1 * n2
    batch = xr.shape[:-1]
    # A[n1, n2]: n = n1*N2 + n2 -> reshape puts n1 on the slower axis.
    ar = xr.reshape(*batch, n1, n2)
    ai = xi.reshape(*batch, n1, n2)

    w1r, w1i = (jnp.asarray(m) for m in _dft_mats(n1, inverse))
    w2r, w2i = (jnp.asarray(m) for m in _dft_mats(n2, inverse))
    twr, twi = (jnp.asarray(m) for m in _twiddle(n1, n2, inverse))

    # B[k1, n2] = sum_{n1} W1[k1, n1] * A[n1, n2]  ==  (A^T @ W1^T)^T;
    # implement by contracting A's n1 axis with W1's second axis.
    at_r = jnp.swapaxes(ar, -1, -2)  # (..., n2, n1)
    at_i = jnp.swapaxes(ai, -1, -2)
    br, bi = _cmatmul(at_r, at_i, w1r, w1i, transpose_b=True)  # (..., n2, k1)
    br = jnp.swapaxes(br, -1, -2)  # (..., k1, n2)
    bi = jnp.swapaxes(bi, -1, -2)

    # C = B * twiddle
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr

    # X[k1, k2] = sum_{n2} C[k1, n2] * W2[n2, k2]
    dr, di = _cmatmul(cr, ci, w2r, w2i)  # (..., k1, k2)

    # output index k = k2*n1 + k1 -> transpose (k1, k2) -> (k2, k1) and flatten
    dr = jnp.swapaxes(dr, -1, -2).reshape(*batch, n)
    di = jnp.swapaxes(di, -1, -2).reshape(*batch, n)
    if inverse:
        dr = dr / n
        di = di / n
    return dr, di


def _axis_plan(n: int) -> Optional[Tuple[int, int]]:
    if n < 4:
        return None
    return best_factor_pair(n)


def fft2_mxu(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """2-D (i)FFT over the last two axes as MXU GEMMs.

    complex64 in/out.  Falls back to jnp.fft for axes with no usable
    factorization (primes).
    """
    rows, cols = x.shape[-2], x.shape[-1]
    plan_c = _axis_plan(cols)
    plan_r = _axis_plan(rows)
    if plan_c is None or plan_r is None:
        return jnp.fft.ifft2(x) if inverse else jnp.fft.fft2(x)

    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)

    # transform along the last axis (cols)
    xr, xi = _fft1_last(xr, xi, *plan_c, inverse)
    # transform along rows: swap, transform, swap back
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    xr, xi = _fft1_last(xr, xi, *plan_r, inverse)
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    return jax.lax.complex(xr, xi)


def ifft2_mxu(x: jnp.ndarray) -> jnp.ndarray:
    return fft2_mxu(x, inverse=True)

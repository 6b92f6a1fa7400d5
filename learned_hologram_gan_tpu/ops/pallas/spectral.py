"""Pallas four-step FFT: the bandwidth-optimal spectral path.

XLA's TPU FFT is a VPU kernel measured at ~70 GB/s effective (~10% of v5e
HBM bandwidth, docs/tpu_performance.md) and the ASM propagation pipeline
(reference angular_spectrum_method.py:68-94) is ~75% FFT time.  The
ops/mxu_fft.py GEMM formulation moved the arithmetic to the MXU but left the
four-step's digit transposes as HBM round-trips — measured flat across GEMM
precision, i.e. bandwidth-bound.

This module keeps an entire 1-D transform stage *in VMEM*: each
``pallas_call`` reads a block once from HBM, runs the full four-step
(GEMM -> twiddle -> transpose -> GEMM, all on-chip), and writes the result
once.  A 2-D FFT is two such passes (the second transposes lane/sublane
in-VMEM instead of materializing a transposed copy in HBM), so the whole
transform costs ~2 read+write passes over the array — the bandwidth lower
bound for a row/column-separated FFT.

Math (same digit convention as ops/mxu_fft.py, validated there):

    n = n1*N2 + n2, k = k2*N1 + k1, W = exp(-+2*pi*i/N)
    B[k1, n2] = sum_n1 W1[k1, n1] * A[n1, n2]          (left GEMM)
    C = B * twiddle[k1, n2]
    D[k2, k1] = sum_n2 W2T[k2, n2] * C'[n2, k1]        (left GEMM, C transposed)
    flatten (k2, k1) -> k  (digit reversal is a reshape, not a gather)

Complex arithmetic is carried as separate f32 planes.  GEMM precision is
selectable: "highest" (6-pass bf16, ~1e-7 relative) or "split3" —
error-compensated bf16 (hi/lo operand split, 3 bf16 GEMMs per real GEMM,
~1e-6 relative at 1024 points) which runs the MXU at 2x the HIGHEST rate.
The inverse transform folds its 1/N scale into W2T (no extra pass).

Works on any (rows, cols) where each axis factors as N1*N2 (both >= 2) and
the other axis is divisible by a usable tile; callers fall back to jnp.fft
otherwise (see :func:`supported`).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# GEMM precision inside the kernels: "highest" | "split3"
_PRECISION = "split3"


def set_precision(name: str) -> None:
    global _PRECISION
    if name not in ("highest", "split3"):
        raise ValueError(f"unknown spectral precision {name!r}")
    _PRECISION = name


def _interpret() -> bool:
    """Interpret mode off-TPU so the CPU test mesh exercises the same code."""
    return jax.default_backend() != "tpu"


def best_factor_pair(n: int) -> Optional[Tuple[int, int]]:
    """(N1, N2) with N1*N2 == n, both > 1, as near-square as possible."""
    best = None
    for n1 in range(int(math.isqrt(n)), 1, -1):
        if n % n1 == 0:
            best = (n1, n // n1)
            break
    return best


def _pick_tile(n: int, other: int = 1024) -> Optional[int]:
    """Tile width for the non-transformed axis of a (other, tile) block.

    Prefers the smallest divisor of ``n`` that is >= 128 and a multiple of
    128 (full lanes, minimal VMEM); falls back to any divisor >= 8, largest
    first, under a ~2 MB-per-plane VMEM budget (in+out+temps for re & im
    must fit the ~16 MB scoped VMEM with double buffering).
    """
    budget = max(8, (2 * 1024 * 1024) // (4 * max(other, 1)))
    aligned = [t for t in range(128, min(n, budget) + 1, 128) if n % t == 0]
    if aligned:
        return aligned[0]
    divisors = [t for t in range(min(n, budget), 7, -1) if n % t == 0]
    return divisors[0] if divisors else None


def supported(rows: int, cols: int) -> bool:
    """True if the Pallas path can transform a (rows, cols) grid."""
    return (
        best_factor_pair(rows) is not None
        and best_factor_pair(cols) is not None
        and _pick_tile(cols, other=rows) is not None
        and _pick_tile(rows, other=cols) is not None
    )


@functools.lru_cache(maxsize=None)
def _stage_consts(n: int, inverse: bool):
    """Host-side f32 constants for a length-n four-step stage.

    Returns (n1, n2, W1re, W1im, TWre, TWim, W2Tre, W2Tim); the inverse
    stage's 1/n normalization is folded into W2T.
    """
    pair = best_factor_pair(n)
    if pair is None:
        raise ValueError(f"no factorization for {n}")
    n1, n2 = pair
    sign = 1.0 if inverse else -1.0

    j = np.arange(n1)[:, None].astype(np.float64)
    k = np.arange(n1)[None, :].astype(np.float64)
    th1 = sign * 2.0 * np.pi / n1 * j * k  # W1[k1, n1] (symmetric)
    w1re = np.cos(th1).astype(np.float32)
    w1im = np.sin(th1).astype(np.float32)

    k1 = np.arange(n1)[:, None].astype(np.float64)
    m2 = np.arange(n2)[None, :].astype(np.float64)
    tht = sign * 2.0 * np.pi / n * k1 * m2  # twiddle[k1, n2]
    twre = np.cos(tht).astype(np.float32)
    twim = np.sin(tht).astype(np.float32)

    j2 = np.arange(n2)[:, None].astype(np.float64)
    k2 = np.arange(n2)[None, :].astype(np.float64)
    th2 = sign * 2.0 * np.pi / n2 * j2 * k2  # W2[n2, k2] == W2T[k2, n2]
    scale = (1.0 / n) if inverse else 1.0
    w2tre = (np.cos(th2) * scale).astype(np.float32)
    w2tim = (np.sin(th2) * scale).astype(np.float32)

    return n1, n2, w1re, w1im, twre, twim, w2tre, w2tim


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f32 GEMM at the configured in-kernel precision."""
    if _PRECISION == "highest":
        return jax.lax.dot(
            a, b,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    # split3: error-compensated bf16 — a = ahi + alo with ahi = bf16(a);
    # a@b ~= ahi@bhi + ahi@blo + alo@bhi (the alo@blo term is O(eps^2)).
    ahi = a.astype(jnp.bfloat16)
    alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
    bhi = b.astype(jnp.bfloat16)
    blo = (b - bhi.astype(jnp.float32)).astype(jnp.bfloat16)

    def mm(x, y):
        return jax.lax.dot(x, y, preferred_element_type=jnp.float32)

    return mm(ahi, bhi) + mm(ahi, blo) + mm(alo, bhi)


def _cgemm(ar, ai, br, bi):
    """(ar + i*ai) @ (br + i*bi) -> (re, im), 4 real GEMMs."""
    rr = _dot(ar, br) - _dot(ai, bi)
    ri = _dot(ar, bi) + _dot(ai, br)
    return rr, ri


def _stage_body(xr, xi, w1r, w1i, twr, twi, w2tr, w2ti, n1, n2, tc):
    """Four-step DFT along axis 0 of a (n1*n2, tc) block, all in VMEM."""
    ar = xr.reshape(n1, n2 * tc)
    ai = xi.reshape(n1, n2 * tc)
    br, bi = _cgemm(w1r, w1i, ar, ai)  # (n1=k1, n2*tc)

    b3r = br.reshape(n1, n2, tc)
    b3i = bi.reshape(n1, n2, tc)
    t3r = twr[:, :, None]
    t3i = twi[:, :, None]
    cr = b3r * t3r - b3i * t3i
    ci = b3r * t3i + b3i * t3r

    c2r = jnp.transpose(cr, (1, 0, 2)).reshape(n2, n1 * tc)
    c2i = jnp.transpose(ci, (1, 0, 2)).reshape(n2, n1 * tc)
    dr, di = _cgemm(w2tr, w2ti, c2r, c2i)  # (k2, n1*tc)
    return dr.reshape(n1 * n2, tc), di.reshape(n1 * n2, tc)


def _dft_cols_pass(xr, xi, inverse: bool):
    """DFT along axis -2 of (B, R, C): grid over (batch, C tiles)."""
    b, r, c = xr.shape
    tc = _pick_tile(c, other=r)
    n1, n2, w1r, w1i, twr, twi, w2tr, w2ti = _stage_consts(r, inverse)

    def kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, twr_ref, twi_ref,
               w2tr_ref, w2ti_ref, or_ref, oi_ref):
        dr, di = _stage_body(
            xr_ref[:], xi_ref[:],
            w1r_ref[:], w1i_ref[:], twr_ref[:], twi_ref[:],
            w2tr_ref[:], w2ti_ref[:], n1, n2, tc,
        )
        or_ref[:] = dr
        oi_ref[:] = di

    const = lambda shape: pl.BlockSpec(  # noqa: E731 — replicated constant
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.ANY
        if False else pltpu.VMEM,
    )
    data = pl.BlockSpec((None, r, tc), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, r, c), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b, c // tc),
        in_specs=[data, data,
                  const((n1, n1)), const((n1, n1)),
                  const((n1, n2)), const((n1, n2)),
                  const((n2, n2)), const((n2, n2))],
        out_specs=(data, data),
        out_shape=(out_shape, out_shape),
        interpret=_interpret(),
    )(xr, xi, w1r, w1i, twr, twi, w2tr, w2ti)


def _dft_rows_pass(xr, xi, inverse: bool):
    """DFT along axis -1 of (B, R, C): in-VMEM lane/sublane transpose, then
    the same stage body, then transpose back — no HBM transpose pass."""
    b, r, c = xr.shape
    tr = _pick_tile(r, other=c)
    n1, n2, w1r, w1i, twr, twi, w2tr, w2ti = _stage_consts(c, inverse)

    def kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, twr_ref, twi_ref,
               w2tr_ref, w2ti_ref, or_ref, oi_ref):
        xt_r = xr_ref[:].T  # (c, tr), stays in VMEM
        xt_i = xi_ref[:].T
        dr, di = _stage_body(
            xt_r, xt_i,
            w1r_ref[:], w1i_ref[:], twr_ref[:], twi_ref[:],
            w2tr_ref[:], w2ti_ref[:], n1, n2, tr,
        )
        or_ref[:] = dr.T
        oi_ref[:] = di.T

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM,
    )
    data = pl.BlockSpec((None, tr, c), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, r, c), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b, r // tr),
        in_specs=[data, data,
                  const((n1, n1)), const((n1, n1)),
                  const((n1, n2)), const((n1, n2)),
                  const((n2, n2)), const((n2, n2))],
        out_specs=(data, data),
        out_shape=(out_shape, out_shape),
        interpret=_interpret(),
    )(xr, xi, w1r, w1i, twr, twi, w2tr, w2ti)


def _fft2_impl(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """2-D (i)FFT over the last two axes; complex64 in/out.

    Falls back to jnp.fft when the shape has no usable factorization/tiling.
    """
    r, c = x.shape[-2], x.shape[-1]
    if not supported(r, c):
        return jnp.fft.ifft2(x) if inverse else jnp.fft.fft2(x)

    batch = x.shape[:-2]
    xr = jnp.real(x).astype(jnp.float32).reshape(-1, r, c)
    xi = jnp.imag(x).astype(jnp.float32).reshape(-1, r, c)
    xr, xi = _dft_rows_pass(xr, xi, inverse)   # along cols (last axis)
    xr, xi = _dft_cols_pass(xr, xi, inverse)   # along rows (axis -2)
    out = jax.lax.complex(xr, xi)
    return out.reshape(*batch, r, c)


# Autodiff: pallas_call has no AD rule, but the DFT is linear with a
# *symmetric* matrix (F_jk = w^{jk}), so transpose(fft2) == fft2 and
# transpose(ifft2) == ifft2 applied to the raw cotangent — verified
# numerically against jnp.fft gradients (tests/test_pallas_spectral.py).


@jax.custom_vjp
def fft2_pallas(x: jnp.ndarray) -> jnp.ndarray:
    return _fft2_impl(x, inverse=False)


def _fft2_fwd(x):
    return fft2_pallas(x), None


def _fft2_bwd(_, g):
    return (fft2_pallas(g),)


fft2_pallas.defvjp(_fft2_fwd, _fft2_bwd)


@jax.custom_vjp
def ifft2_pallas(x: jnp.ndarray) -> jnp.ndarray:
    return _fft2_impl(x, inverse=True)


def _ifft2_fwd(x):
    return ifft2_pallas(x), None


def _ifft2_bwd(_, g):
    return (ifft2_pallas(g),)


ifft2_pallas.defvjp(_ifft2_fwd, _ifft2_bwd)

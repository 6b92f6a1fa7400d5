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
    """True if the Pallas path can transform a (rows, cols) grid.

    On a real TPU, Mosaic's vector-layout inference rejects some in-kernel
    reshapes/transposes on non-lane-aligned shapes ("unsupported shape
    cast"), so compiled mode additionally requires 128-aligned tiles and
    8-aligned GEMM factors; odd grids fall back to jnp.fft.  Interpret mode
    (CPU tests) exercises any factorizable shape.
    """
    tc = _pick_tile(cols, other=rows)
    tr = _pick_tile(rows, other=cols)
    if (best_factor_pair(rows) is None or best_factor_pair(cols) is None
            or tc is None or tr is None):
        return False
    if _interpret():
        return True
    if tc % 128 or tr % 128:
        return False
    for n in (rows, cols):
        n1, _, _ = _choose_factors(n)
        if n1 % 8:
            return False
    return True


def _choose_factors(n: int) -> Tuple[int, int, bool]:
    """(n1, n2, unroll_stage2): pick factors for MXU efficiency.

    The stage-1 GEMM contracts n1 with an (n1 x n1) DFT matrix — the MXU
    runs at ~(min(n1,128)/128)^2 utilization, so a near-square split like
    1024 = 32*32 wastes 15/16 of the systolic array.  Prefer a big MXU-shaped
    n1 (ideally a multiple of 128) with a small n2 handled by an *unrolled
    constant-coefficient sum on the VPU* (stage 2's (n2 x n2) GEMM would run
    at ~(n2/128)^2 utilization — far slower than the VPU for n2 <= 16).
    Falls back to the near-square GEMM+GEMM split.
    """
    best = None
    for n2 in (8, 16, 4, 2):
        if n % n2:
            continue
        n1 = n // n2
        if not (64 <= n1 <= 384):
            continue
        score = (0 if n1 % 128 == 0 else 1, abs(n1 - 128), n2)
        if best is None or score < best[0]:
            best = (score, n1, n2)
    if best is not None:
        return best[1], best[2], True
    pair = best_factor_pair(n)
    if pair is None:
        raise ValueError(f"no factorization for {n}")
    # near-square: put the larger factor in the GEMM stage
    n1, n2 = max(pair), min(pair)
    return n1, n2, n2 <= 16


@functools.lru_cache(maxsize=None)
def _stage_consts(n: int, inverse: bool):
    """Host-side f32 constants for a length-n four-step stage.

    Returns (n1, n2, unroll, W1re, W1im, TWre, TWim, W2Tre, W2Tim); the
    inverse stage's 1/n normalization is folded into W2T.  When ``unroll``
    the W2T entries are baked into the kernel as Python scalars.
    """
    n1, n2, unroll = _choose_factors(n)
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

    return n1, n2, unroll, w1re, w1im, twre, twim, w2tre, w2tim


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


def _unrolled_small_dft(c2r, c2i, w2tre, w2tim, n2):
    """(n2 x n2) DFT along axis 0 of (n2, W) as unrolled VPU MAC chains.

    ``w2tre/w2tim`` are host numpy — each coefficient is baked into the
    kernel as a Python scalar, so +-1/0 entries cost nothing and the MXU is
    never invoked at (n2/128)^2 utilization.  Full f32 accuracy.
    """
    outs_r, outs_i = [], []
    for k in range(n2):
        accr = None
        acci = None
        for j in range(n2):
            wr = float(w2tre[k, j])
            wi = float(w2tim[k, j])
            tr_ = None
            ti_ = None
            if abs(wr) > 1e-30:
                tr_ = wr * c2r[j : j + 1]
                ti_ = wr * c2i[j : j + 1]
            if abs(wi) > 1e-30:
                tr_ = (-wi) * c2i[j : j + 1] if tr_ is None else tr_ - wi * c2i[j : j + 1]
                ti_ = wi * c2r[j : j + 1] if ti_ is None else ti_ + wi * c2r[j : j + 1]
            if tr_ is None:
                continue
            accr = tr_ if accr is None else accr + tr_
            acci = ti_ if acci is None else acci + ti_
        outs_r.append(accr)
        outs_i.append(acci)
    return jnp.concatenate(outs_r, axis=0), jnp.concatenate(outs_i, axis=0)


def _stage_body(xr, xi, w1r, w1i, twr, twi, w2t_np, w2t_refs, n1, n2, tc, unroll):
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
    if unroll:
        dr, di = _unrolled_small_dft(c2r, c2i, w2t_np[0], w2t_np[1], n2)
    else:
        dr, di = _cgemm(w2t_refs[0], w2t_refs[1], c2r, c2i)  # (k2, n1*tc)
    return dr.reshape(n1 * n2, tc), di.reshape(n1 * n2, tc)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _dft_pass(xr, xi, inverse: bool, axis: int):
    """DFT along ``axis`` (-2 or -1) of (B, R, C).

    axis=-2: grid over (batch, C tiles), blocks (R, tc), direct stage body.
    axis=-1: grid over (batch, R tiles), blocks (tr, C); the block is
    transposed lane<->sublane *in VMEM* (no HBM transpose pass), transformed,
    and transposed back.
    """
    b, r, c = xr.shape
    if axis == -2:
        n, tile = r, _pick_tile(c, other=r)
    else:
        n, tile = c, _pick_tile(r, other=c)
    n1, n2, unroll, w1r, w1i, twr, twi, w2tre, w2tim = _stage_consts(n, inverse)
    w2t_np = (w2tre, w2tim)

    def kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, twr_ref, twi_ref,
               *rest):
        w2t_refs = None if unroll else (rest[0][:], rest[1][:])
        or_ref, oi_ref = rest[-2], rest[-1]
        if axis == -2:
            br_, bi_ = xr_ref[:], xi_ref[:]
        else:
            br_, bi_ = xr_ref[:].T, xi_ref[:].T
        dr, di = _stage_body(
            br_, bi_,
            w1r_ref[:], w1i_ref[:], twr_ref[:], twi_ref[:],
            w2t_np, w2t_refs, n1, n2, tile, unroll,
        )
        if axis == -2:
            or_ref[:] = dr
            oi_ref[:] = di
        else:
            or_ref[:] = dr.T
            oi_ref[:] = di.T

    if axis == -2:
        data = pl.BlockSpec((None, r, tile), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
        grid = (b, c // tile)
    else:
        data = pl.BlockSpec((None, tile, c), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
        grid = (b, r // tile)

    in_specs = [data, data,
                _const_spec((n1, n1)), _const_spec((n1, n1)),
                _const_spec((n1, n2)), _const_spec((n1, n2))]
    args = [xr, xi, w1r, w1i, twr, twi]
    if not unroll:
        in_specs += [_const_spec((n2, n2)), _const_spec((n2, n2))]
        args += [w2tre, w2tim]

    out_shape = jax.ShapeDtypeStruct((b, r, c), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(data, data),
        out_shape=(out_shape, out_shape),
        interpret=_interpret(),
    )(*args)


def _dft_cols_pass(xr, xi, inverse: bool):
    return _dft_pass(xr, xi, inverse, axis=-2)


def _dft_rows_pass(xr, xi, inverse: bool):
    return _dft_pass(xr, xi, inverse, axis=-1)


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


# ===========================================================================
# Fused ASM propagation: cols-FFT -> on-the-fly H*mask -> crop-aware inverse
# in ONE VMEM residency (the "middle" pass).  A full propagate is:
#
#   rows-FFT (four-step pallas pass)
#   middle   (pallas: cols four-step fwd -> H*mask from iota -> DIRECT
#             inverse-DFT GEMM restricted to the cropped output rows)
#   rows-inv (plain-XLA split3 GEMM with the inverse-DFT submatrix
#             restricted to the cropped output cols)
#
# The crop restriction matters as much as the fusion: the composable path
# materializes D full padded planes per sample that are immediately cropped
# (1024^2 -> 384^2 is 7x the bytes at the bench config); here nothing wider
# than the crop window is ever written after the H multiply.  H itself is
# computed per-tile from iota + wavelength/distance scalars (reference
# angular_spectrum_method.py:155-171,195-213) — no H stack in HBM, and the
# cols-forward transform is computed once per tile into scratch and reused
# across the distance grid dimension.  Differentiable via custom VJP: every
# factor is a (symmetric) DFT matrix or a diagonal, so the real adjoint is
# the conjugate-sandwiched transpose pipeline with crop transposed to
# zero-padded embedding.
# ===========================================================================


def _h_tile(rp, cp, tc, j, wl2, z, pitch, conj_h):
    """Transfer-function tile H[fx, fy-strip] computed in-kernel.

    Bit-compatible with asm._w_grid/_transfer_function: same f32 operation
    order (k * f32(1/(n*pitch)), fx^2+fy^2, clamp, sqrt, ((-2pi)*z)*w).
    """
    ir = jax.lax.broadcasted_iota(jnp.int32, (rp, tc), 0)
    kr = ir - rp * (ir >= (rp + 1) // 2).astype(jnp.int32)
    fx = kr.astype(jnp.float32) * np.float32(1.0 / (rp * pitch))
    ic = jax.lax.broadcasted_iota(jnp.int32, (rp, tc), 1) + j * tc
    kc = ic - cp * (ic >= (cp + 1) // 2).astype(jnp.int32)
    fy = kc.astype(jnp.float32) * np.float32(1.0 / (cp * pitch))
    sq = fx * fx + fy * fy
    w = jnp.sqrt(jnp.maximum(wl2 - sq, 0.0))
    sign = np.float32(2.0 * np.pi) if conj_h else np.float32(-2.0 * np.pi)
    theta = (sign * z) * w
    return jnp.cos(theta), jnp.sin(theta)


@functools.lru_cache(maxsize=None)
def _crop_dft_consts(n: int, n_out: int, offset: int, inverse: bool,
                     transpose: bool):
    """Direct (inverse-)DFT submatrix restricted to ``n_out`` outputs.

    W[k, j] = s * exp(sign*2pi*i*(k+offset)*j/n), s = 1/n for inverse.
    ``transpose=True`` returns W^T (n, n_out) — the adjoint embeds the
    cropped cotangent back into the full grid.
    """
    sign = 1.0 if inverse else -1.0
    k = (np.arange(n_out, dtype=np.float64) + offset)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    th = sign * 2.0 * np.pi / n * k * j
    scale = (1.0 / n) if inverse else 1.0
    wre = (np.cos(th) * scale).astype(np.float32)
    wim = (np.sin(th) * scale).astype(np.float32)
    if transpose:
        wre, wim = np.ascontiguousarray(wre.T), np.ascontiguousarray(wim.T)
    return wre, wim


# ---- stage descriptors for the middle kernel -------------------------------
# ("four", inverse)                     — full four-step DFT along axis 0
# ("direct", n, n_out, offset, inverse, transpose) — direct DFT GEMM
# None                                  — skip

@functools.lru_cache(maxsize=None)
def _crop_dft_presplit(n, n_out, offset, inverse, transpose):
    """Karatsuba + error-compensated pre-split weights for a direct stage.

    Host-side hi/lo bf16 split of (Wre, Wim, Wre+Wim) — 6 arrays.  The
    in-kernel complex GEMM is then 3 Karatsuba products x 3 compensated
    passes = 9 bf16 GEMMs with no in-kernel weight conversion at all.
    """
    import ml_dtypes

    wre, wim = _crop_dft_consts(n, n_out, offset, inverse, transpose)
    wsum = (wre.astype(np.float64) + wim.astype(np.float64)).astype(np.float32)
    out = []
    for w in (wre, wim, wsum):
        # numpy-only (ml_dtypes bf16): jnp ops here would be STAGED when this
        # runs under an outer jit trace (omnistaging), and the lru_cache
        # would capture per-trace tracers — an UnexpectedTracerError for the
        # next trace that hits the cache.
        hi = w.astype(ml_dtypes.bfloat16)
        lo = (w - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        out += [hi, lo]
    return tuple(out)


def _stage_arrays(desc, n_full):
    """(meta, host_arrays, specs) for one stage descriptor."""
    if desc is None:
        return None, [], []
    if desc[0] == "four":
        n1, n2, unroll, w1r, w1i, twr, twi, w2tre, w2tim = _stage_consts(
            n_full, desc[1]
        )
        args = [w1r, w1i, twr, twi]
        specs = [_mid_const((n1, n1)), _mid_const((n1, n1)),
                 _mid_const((n1, n2)), _mid_const((n1, n2))]
        if not unroll:
            args += [w2tre, w2tim]
            specs += [_mid_const((n2, n2)), _mid_const((n2, n2))]
        meta = ("four", n1, n2, unroll, (w2tre, w2tim))
        return meta, args, specs
    _, n, n_out, offset, inverse, transpose = desc
    packs = _crop_dft_presplit(n, n_out, offset, inverse, transpose)
    meta = ("direct",)
    return meta, list(packs), [_mid_const(tuple(w.shape)) for w in packs]


def _mid_const(shape):
    return pl.BlockSpec(shape, lambda p, j, d: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _cgemm_karatsuba(refs, xr, xi):
    """W @ x complex GEMM with pre-split Karatsuba weights (see
    _crop_dft_presplit): 9 bf16 MXU passes, ~1e-6 relative accuracy."""
    wre_h, wre_l, wim_h, wim_l, ws_h, ws_l = (r[:] for r in refs)
    xs = xr + xi
    xrh, xrl = _split_bf16(xr)
    xih, xil = _split_bf16(xi)
    xsh, xsl = _split_bf16(xs)

    def mm(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    def g(wh, wl, xh, xl):
        return mm(wh, xh) + mm(wh, xl) + mm(wl, xh)

    p1 = g(wre_h, wre_l, xrh, xrl)
    p2 = g(wim_h, wim_l, xih, xil)
    p3 = g(ws_h, ws_l, xsh, xsl)
    return p1 - p2, p3 - p1 - p2


def _run_stage(xr, xi, meta, refs, tc):
    if meta[0] == "four":
        _, n1, n2, unroll, w2t_np = meta
        w2t_refs = None if unroll else (refs[4][:], refs[5][:])
        return _stage_body(xr, xi, refs[0][:], refs[1][:], refs[2][:],
                           refs[3][:], w2t_np, w2t_refs, n1, n2, tc, unroll)
    return _cgemm_karatsuba(refs, xr, xi)  # direct: W @ x


def _n_stage_refs(meta):
    if meta is None:
        return 0
    if meta[0] == "four":
        return 4 if meta[3] else 6
    return 6


def _middle_pass(xr, xi, wl2, dists, mask, *, pitch, conj_h,
                 s1, s2, in_rows, h_rows, out_rows, reduce_d, num_d,
                 per_plane):
    """The fused H pass along axis -2 (see module section comment).

    Layouts:
      reduce_d=False: in (P, in_rows, C) -> out (P, D, out_rows, C)
      reduce_d=True:  in (P, D, in_rows, C) -> out (P, out_rows, C)  [sum d]
    ``dists`` is (D, 1) (stack mode) or (P, 1) (per_plane); ``wl2`` is (P, 1).
    The H grid has the kernel's full padded row count = the row count at the
    point H applies: after s1 (s1 output rows) — callers guarantee that is
    the padded grid size.
    """
    p = xr.shape[0]
    c = xr.shape[-1]
    tc = _pick_tile(c, other=in_rows + h_rows + out_rows)
    d = num_d

    meta1, args1, specs1 = _stage_arrays(s1, in_rows)
    meta2, args2, specs2 = _stage_arrays(s2, h_rows)

    scalar = pl.BlockSpec(wl2.shape, lambda p_, j_, d_: (0, 0),
                          memory_space=pltpu.SMEM)
    dist_spec = pl.BlockSpec(dists.shape, lambda p_, j_, d_: (0, 0),
                             memory_space=pltpu.SMEM)

    if reduce_d:
        data_in = pl.BlockSpec((None, None, in_rows, tc),
                               lambda p_, j_, d_: (p_, d_, 0, j_),
                               memory_space=pltpu.VMEM)
        data_out = pl.BlockSpec((None, out_rows, tc),
                                lambda p_, j_, d_: (p_, 0, j_),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((p, out_rows, c), jnp.float32)
    else:
        data_in = pl.BlockSpec((None, in_rows, tc),
                               lambda p_, j_, d_: (p_, 0, j_),
                               memory_space=pltpu.VMEM)
        data_out = pl.BlockSpec((None, None, out_rows, tc),
                                lambda p_, j_, d_: (p_, d_, 0, j_),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((p, d, out_rows, c), jnp.float32)

    mask_specs, mask_args = [], []
    if mask is not None:
        mask_specs = [pl.BlockSpec((h_rows, tc), lambda p_, j_, d_: (0, j_),
                                   memory_space=pltpu.VMEM)]
        mask_args = [mask]

    n1refs = _n_stage_refs(meta1)
    # s1's result is distance-independent: cache it in scratch and reuse it
    # across the d grid dimension (innermost) — for a D-plane focal stack the
    # forward cols transform is computed once per tile, not D times.
    use_scratch = (not reduce_d) and d > 1 and meta1 is not None

    def kernel(*refs):
        xr_ref, xi_ref, wl2_ref, z_ref = refs[0], refs[1], refs[2], refs[3]
        pos = 4
        mask_ref = None
        if mask is not None:
            mask_ref = refs[pos]
            pos += 1
        s1_refs = refs[pos : pos + n1refs]
        pos += n1refs
        if use_scratch:
            s2_refs = refs[pos : len(refs) - 4]
            or_ref, oi_ref = refs[-4], refs[-3]
            sc_r, sc_i = refs[-2], refs[-1]
        else:
            s2_refs = refs[pos : len(refs) - 2]
            or_ref, oi_ref = refs[-2], refs[-1]

        p_idx = pl.program_id(0)
        j = pl.program_id(1)
        d_idx = pl.program_id(2)

        def stage1():
            ar = xr_ref[:]
            ai = xi_ref[:]
            if meta1 is not None:
                ar, ai = _run_stage(ar, ai, meta1, s1_refs, tc)
            return ar, ai

        if use_scratch:
            @pl.when(d_idx == 0)
            def _():
                ar, ai = stage1()
                sc_r[:] = ar
                sc_i[:] = ai

            ar, ai = sc_r[:], sc_i[:]
        else:
            ar, ai = stage1()

        wl2_v = wl2_ref[p_idx, 0]
        z_v = z_ref[p_idx, 0] if per_plane else z_ref[d_idx, 0]
        hr, hi = _h_tile(h_rows, c, tc, j, wl2_v, z_v, pitch, conj_h)
        if mask_ref is not None:
            m = mask_ref[:]
            hr = hr * m
            hi = hi * m
        gr = ar * hr - ai * hi
        gi = ar * hi + ai * hr

        if meta2 is not None:
            gr, gi = _run_stage(gr, gi, meta2, s2_refs, tc)

        if reduce_d:
            @pl.when(d_idx == 0)
            def _():
                or_ref[:] = gr
                oi_ref[:] = gi

            @pl.when(d_idx > 0)
            def _():
                or_ref[:] = or_ref[:] + gr
                oi_ref[:] = oi_ref[:] + gi
        else:
            or_ref[:] = gr
            oi_ref[:] = gi

    in_specs = ([data_in, data_in, scalar, dist_spec] + mask_specs
                + specs1 + specs2)
    args = [xr, xi, wl2, dists] + mask_args + args1 + args2
    scratch = (
        [pltpu.VMEM((h_rows, tc), jnp.float32)] * 2 if use_scratch else []
    )

    return pl.pallas_call(
        kernel,
        grid=(p, c // tc, d),
        in_specs=in_specs,
        out_specs=(data_out, data_out),
        out_shape=(out_shape, out_shape),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*args)


def _dot3_general(a, w, contract_a):
    """split3 dot_general in plain XLA: contract a's axis with w's dim 1."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((contract_a,), (1,)), ((), ()))

    def mm(x, y):
        return jax.lax.dot_general(x, y, dn, preferred_element_type=jnp.float32)

    return mm(ah, wh) + mm(ah, wl) + mm(al, wh)


def _xla_crop_lastaxis(xr, xi, wre, wim):
    """out[..., k] = sum_c x[..., c] * W[k, c] — complex, split3, plain XLA."""
    rr = _dot3_general(xr, wre, xr.ndim - 1) - _dot3_general(xi, wim, xi.ndim - 1)
    ri = _dot3_general(xr, wim, xr.ndim - 1) + _dot3_general(xi, wre, xi.ndim - 1)
    return rr, ri


def _planes_fwd_impl(fr, fi, wl2, dists, mask, cfg):
    """Forward fused pipeline, pad- and crop-aware end to end.

    cfg: (pitch, conj_h, from_spectrum, per_plane, num_d, rp, cp, crop)
    with crop = (row_off, rows_in_out, col_off, cols_in_out) or None.

    Full mode input is the UNPADDED field (P, rows, cols): zero-padding is
    never materialized — the forward rows DFT is a (cp x cols) input-
    restricted GEMM and the middle stage-1 likewise contracts only the
    ``rows`` nonzero spectrum rows.  from_spectrum input is the full padded
    spectrum (P, rp, cp).  Output: (P, D, rows, cols) complex pair, cropped.
    """
    pitch, conj_h, from_spectrum, per_plane, num_d, rp, cp, crop = cfg
    p = fr.shape[0]
    r0, rows, c0, cols = crop if crop is not None else (0, rp, 0, cp)

    if not from_spectrum:
        # rows forward DFT restricted to the nonzero (unpadded) input cols
        wre, wim = _crop_dft_consts(cp, cols, c0, False, True)  # (cp, cols)
        fr, fi = _xla_crop_lastaxis(fr, fi, jnp.asarray(wre), jnp.asarray(wim))
        s1 = ("direct", rp, rows, r0, False, True)  # (rp, rows) fwd cols
        in_rows = rows
    else:
        s1 = None
        in_rows = rp
    s2 = ("direct", rp, rows, r0, True, False)  # (rows, rp) inv cols, cropped
    mr, mi = _middle_pass(
        fr, fi, wl2, dists, mask, pitch=pitch, conj_h=conj_h,
        s1=s1, s2=s2, in_rows=in_rows, h_rows=rp, out_rows=rows,
        reduce_d=False, num_d=num_d, per_plane=per_plane,
    )
    d = mr.shape[1]
    mr = mr.reshape(p * d, rows, cp)
    mi = mi.reshape(p * d, rows, cp)
    wre, wim = _crop_dft_consts(cp, cols, c0, True, False)  # (cols, cp) inv
    outr, outi = _xla_crop_lastaxis(mr, mi, jnp.asarray(wre), jnp.asarray(wim))
    return (outr.reshape(p, d, rows, cols), outi.reshape(p, d, rows, cols))


def _planes_bwd_impl(gr, gi, wl2, dists, mask, cfg):
    """Transpose of :func:`_planes_fwd_impl` (every factor is a DFT
    submatrix or a diagonal): crop transposes to zero-padded embedding,
    pad-restriction transposes to output-restriction, and the cotangent's
    distance axis is summed back into the single field plane."""
    pitch, conj_h, from_spectrum, per_plane, num_d, rp, cp, crop = cfg
    p, d, rows, cols = gr.shape
    r0, _, c0, _ = crop if crop is not None else (0, rp, 0, cp)

    # transpose of the cols crop-inverse: embed cols -> cp (plain XLA)
    wre, wim = _crop_dft_consts(cp, cols, c0, True, True)  # (cp, cols)
    gr2 = gr.reshape(p * d, rows, cols)
    gi2 = gi.reshape(p * d, rows, cols)
    mr, mi = _xla_crop_lastaxis(gr2, gi2, jnp.asarray(wre), jnp.asarray(wim))

    # middle transpose: embed rows -> rp, H, then the transposed stage-1
    s1 = ("direct", rp, rows, r0, True, True)  # (rp, rows) embed
    if from_spectrum:
        s2, out_rows = None, rp
    else:
        s2 = ("direct", rp, rows, r0, False, False)  # (rows, rp) fwd restr.
        out_rows = rows
    mr, mi = _middle_pass(
        mr.reshape(p, d, rows, cp), mi.reshape(p, d, rows, cp),
        wl2, dists, mask, pitch=pitch, conj_h=conj_h,
        s1=s1, s2=s2, in_rows=rows, h_rows=rp, out_rows=out_rows,
        reduce_d=True, num_d=num_d, per_plane=per_plane,
    )
    if not from_spectrum:
        # transpose of the input-restricted rows DFT: output-restricted
        wre, wim = _crop_dft_consts(cp, cols, c0, False, False)  # (cols, cp)
        mr, mi = _xla_crop_lastaxis(mr, mi, jnp.asarray(wre), jnp.asarray(wim))
    return mr, mi


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def propagate_planes(fr, fi, wl2, dists, mask, cfg):
    """Differentiable fused ASM application (linear in the field planes).

    fr/fi: (P, rp, cp) f32 field (cfg.from_spectrum: already the 2-D
    spectrum).  wl2: (P, 1) f32 = 1/lambda^2 per plane.  dists: (D, 1) f32
    (or (P, 1) when cfg.per_plane).  mask: (rp, cp) f32 or None.  Returns a
    (P, D, rows_out, cols_out) complex-as-pair result, already cropped.
    cfg = (pitch, conj_h, from_spectrum, per_plane, num_d, rp, cp, crop) —
    a hashable tuple (jit-static).
    """
    return _planes_fwd_impl(fr, fi, wl2, dists, mask, cfg)


def _pp_fwd(fr, fi, wl2, dists, mask, cfg):
    out = _planes_fwd_impl(fr, fi, wl2, dists, mask, cfg)
    return out, (wl2, dists, mask)


def _pp_bwd(cfg, res, g):
    # The op is an R-linear map on (re, im) pairs; its real transpose is the
    # complex *conjugate*-transpose M^H = conj . M^T . conj — hence the sign
    # flips on the imaginary planes around the transpose pipeline.
    wl2, dists, mask = res
    gr, gi = g
    dr, di = _planes_bwd_impl(gr, -gi, wl2, dists, mask, cfg)
    return (dr, -di, jnp.zeros_like(wl2), jnp.zeros_like(dists),
            None if mask is None else jnp.zeros_like(mask))


propagate_planes.defvjp(_pp_fwd, _pp_bwd)

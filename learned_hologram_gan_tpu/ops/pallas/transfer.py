"""Pallas TPU kernel: fused on-the-fly transfer-function apply.

The focal-stack hot loop broadcasts a batch spectrum G0 over a stack of D
transfer functions ``H(z_d) = exp(-2*pi*i * z_d * w)`` and the aperture mask
(reference angular_spectrum_method.py:524-531).  The baseline jnp path reads
a *cached* complex64 H stack from HBM — D*C*Rp*Cp*8 bytes per step (e.g.
480 MB at 20 distances x 3 colors x 1024^2), plus that much permanent HBM
residency.  This kernel instead computes H in-VMEM from the float32 w-grid
(12 MB), fusing the sin/cos, the complex multiply, and the mask into one
bandwidth-optimal pass:

    read  G0 (B*C*S*8) + w (C*S*4) + mask (S*4)
    write Gz (B*D*C*S*8)

w is re-read once per distance from HBM->VMEM but never materialized as H.
The kernel grid is (B, D, C, row-tiles); each program handles a
(TILE_R, Cp) block on the VPU (sin/cos are transcendentals — VPU work, which
overlaps with the surrounding FFTs' MXU/memory phases under XLA scheduling).

Numerics are identical to the jnp path (same f32 theta -> cos/sin), verified
by tests/test_pallas.py against the cached-H reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; tests use interpret mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    _MEMSPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMSPACE = None


def _kernel(dist_ref, g0r_ref, g0i_ref, w_ref, mask_ref, outr_ref, outi_ref):
    """One (TILE_R, Cp) tile: out = G0 * exp(-2*pi*i*z*w) * mask."""
    z = dist_ref[pl.program_id(1), 0]  # whole distance stack lives in SMEM
    theta = (-2.0 * np.pi) * z * w_ref[0]          # (TILE_R, Cp)
    hr = jnp.cos(theta)
    hi = jnp.sin(theta)
    m = mask_ref[...]                               # (TILE_R, Cp)
    g0r = g0r_ref[0, 0]                             # (TILE_R, Cp)
    g0i = g0i_ref[0, 0]
    outr_ref[0, 0, 0] = (g0r * hr - g0i * hi) * m
    outi_ref[0, 0, 0] = (g0r * hi + g0i * hr) * m


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def apply_transfer_stack(
    g0: jnp.ndarray,
    w_grid: jnp.ndarray,
    mask: jnp.ndarray,
    distances: jnp.ndarray,
    tile_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, C, Rp, Cp) spectrum x (D,) distances -> (B, D, C, Rp, Cp) spectra.

    Equivalent to ``g0[:, None] * (exp(-2i*pi*z*w) * mask)`` with H computed
    in-kernel.  complex64 in/out; internally split into f32 planes (TPU
    Pallas is real-typed).
    """
    b, c, rp, cp = g0.shape
    d = distances.shape[0]
    tile_rows = min(tile_rows, rp)
    assert rp % tile_rows == 0, (rp, tile_rows)
    n_tiles = rp // tile_rows

    g0r = jnp.real(g0)
    g0i = jnp.imag(g0)
    dist_f32 = distances.astype(jnp.float32).reshape(d, 1)

    grid = (b, d, c, n_tiles)

    def dist_map(ib, id_, ic, ir):
        return (0, 0)

    def g0_map(ib, id_, ic, ir):
        return (ib, ic, ir, 0)

    def w_map(ib, id_, ic, ir):
        return (ic, ir, 0)

    def mask_map(ib, id_, ic, ir):
        return (ir, 0)

    def out_map(ib, id_, ic, ir):
        return (ib, id_, ic, ir, 0)

    common = {} if _MEMSPACE is None else {"memory_space": _MEMSPACE}
    smem = {} if pltpu is None else {"memory_space": pltpu.SMEM}
    out_shape = [
        jax.ShapeDtypeStruct((b, d, c, rp, cp), jnp.float32),
        jax.ShapeDtypeStruct((b, d, c, rp, cp), jnp.float32),
    ]
    outr, outi = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, 1), dist_map, **smem),
            pl.BlockSpec((1, 1, tile_rows, cp), g0_map, **common),
            pl.BlockSpec((1, 1, tile_rows, cp), g0_map, **common),
            pl.BlockSpec((1, tile_rows, cp), w_map, **common),
            pl.BlockSpec((tile_rows, cp), mask_map, **common),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, tile_rows, cp), out_map, **common),
            pl.BlockSpec((1, 1, 1, tile_rows, cp), out_map, **common),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(dist_f32, g0r, g0i, w_grid, mask)
    return jax.lax.complex(outr, outi)


def apply_transfer_stack_reference(
    g0: jnp.ndarray,
    w_grid: jnp.ndarray,
    mask: jnp.ndarray,
    distances: jnp.ndarray,
) -> jnp.ndarray:
    """Pure-jnp on-the-fly equivalent (also H-cache-free); XLA-fused."""
    theta = (-2.0 * np.pi) * distances[:, None, None, None] * w_grid[None]
    h = jax.lax.complex(jnp.cos(theta), jnp.sin(theta)) * mask
    return g0[:, None] * h[None]

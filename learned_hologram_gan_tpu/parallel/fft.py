"""Spatially-sharded 2-D FFT + sharded ASM propagation.

The reference needs >=30 GB host RAM for 4K holograms (reference README.md:9)
because the padded spectrum (2160+2p) x (3840+2p') x 3 wavelengths x D planes
must live on one device.  Here the *row* axis is sharded over the mesh and
the 2-D FFT runs as the classic 1-D-decomposition pencil algorithm:

    fft along columns (local)  ->  all-to-all transpose (ICI)  ->
    fft along rows (local)     ->  all-to-all back to row sharding

Each ``all_to_all`` moves 1/p of the array per device over ICI — the same
communication volume as the textbook distributed FFT.  Composed with the
on-the-fly transfer function (``make_plan(cache_h=False)``) and per-distance
``lax.map``, a 4K focal stack never materializes more than one padded plane
per device.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exports shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import asm


def _fft2_local_kernel(x: jnp.ndarray, axis_name: str, inverse: bool) -> jnp.ndarray:
    """Local block (..., R/p, C) -> 2-D (i)FFT block of the global array."""
    fft1 = jnp.fft.ifft if inverse else jnp.fft.fft
    nd = x.ndim
    # 1) transform the locally-complete column axis
    y = fft1(x, axis=nd - 1)
    # 2) transpose: rows become local, columns sharded
    y = jax.lax.all_to_all(
        y, axis_name, split_axis=nd - 1, concat_axis=nd - 2, tiled=True
    )
    # 3) transform the now-complete row axis
    y = fft1(y, axis=nd - 2)
    # 4) back to row sharding
    y = jax.lax.all_to_all(
        y, axis_name, split_axis=nd - 2, concat_axis=nd - 1, tiled=True
    )
    return y


def sharded_fft2(
    x: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
    inverse: bool = False,
) -> jnp.ndarray:
    """2-D FFT over the last two axes with axis -2 sharded across ``mesh``.

    Bit-compatible with ``jnp.fft.fft2`` / ``ifft2`` (up to FFT rounding).
    Both spatial dims must be divisible by the mesh size.
    """
    nd = x.ndim
    spec = P(*([None] * (nd - 2)), axis_name, None)
    fn = shard_map(
        functools.partial(_fft2_local_kernel, axis_name=axis_name, inverse=inverse),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
    )
    return fn(x)


def sharded_propagate_batch_multi(
    plan: asm.PropagatorPlan,
    amp: jnp.ndarray,
    phs: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
    distances: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Row-sharded batch x multi-distance propagation -> (B*D, C, rows, cols).

    The sharded equivalent of :func:`...ops.asm.propagate_batch_multi`: the
    padded field's row axis lives split across the mesh; the forward FFT, the
    per-distance transfer multiply (H computed on the fly from the local
    w-grid rows — no H stack in memory), and the inverse FFT all happen in
    that layout.  Distances are processed sequentially with ``lax.map`` so
    peak memory is one padded plane per device regardless of D.
    """
    if distances is None:
        if plan.distances is None:
            raise ValueError("plan has no distance stack and none was passed")
        distances = plan.distances
    distances = jnp.atleast_1d(jnp.asarray(distances, dtype=jnp.float32))

    spec_field = P(None, None, axis_name, None)  # (B, C, Rp, Cp)
    spec_w = P(None, axis_name, None)  # (C, Rp, Cp)
    spec_mask = P(axis_name, None)  # (Rp, Cp)
    out_spec = P(None, None, axis_name, None)  # (D*B, C, rows?, ...) rows stay padded

    def kernel(field, w, mask, ds):
        # field: (B, C, Rp/p, Cp) local block
        g0 = _fft2_local_kernel(field, axis_name, inverse=False)

        def one_distance(z):
            theta = (-2.0 * jnp.pi) * z * w
            h = jax.lax.complex(jnp.cos(theta), jnp.sin(theta))
            gz = g0 * (h * mask)
            return jnp.abs(_fft2_local_kernel(gz, axis_name, inverse=True))

        # (D, B, C, Rp/p, Cp) -> flatten distance-major like the reference
        stack = jax.lax.map(one_distance, ds)
        d, b = stack.shape[0], stack.shape[1]
        return stack.transpose(1, 0, 2, 3, 4).reshape(
            b * d, *stack.shape[2:]
        )

    field = asm.pad(plan, asm.field(amp, phs))
    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(spec_field, spec_w, spec_mask, P()),
        out_specs=out_spec,
    )
    out_padded = fn(field, plan.w_grid, plan.mask, distances)
    return asm.crop(plan, out_padded)

"""Field normalizers (reference utilities.py:53-84)."""

from __future__ import annotations

import jax.numpy as jnp


def amplitude_normalizor(amp: jnp.ndarray) -> jnp.ndarray:
    """Scale each channel to strictly < 1 by its spatial max * 1.01.

    Matches reference utilities.amplitude_normalizor (utilities.py:53-66);
    the 1.01 headroom keeps acos(amp) well-defined in the double-phase
    encoder.
    """
    m = jnp.max(amp, axis=(-2, -1), keepdims=True)
    return amp / (m * 1.01)


def tensor_normalizor_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel min-max normalization over the last two axes.

    Matches reference utilities.tensor_normalizor_2D (utilities.py:69-84).
    """
    mx = jnp.max(x, axis=(-2, -1), keepdims=True)
    mn = jnp.min(x, axis=(-2, -1), keepdims=True)
    return (x - mn) / (mx - mn)

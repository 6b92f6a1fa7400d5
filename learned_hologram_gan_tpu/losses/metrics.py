"""PSNR / SSIM in pure JAX (the reference uses torchmetrics, watermelon.py:25-28).

Conventions match torchmetrics defaults with ``data_range=None``: the dynamic
range is estimated from the data itself as ``max(target) - min(target)`` over
the union of both inputs, and SSIM uses a gaussian 11x11 window with sigma
1.5, k1=0.01, k2=0.03, averaged over batch and channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _data_range(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    both_max = jnp.maximum(jnp.max(preds), jnp.max(target))
    both_min = jnp.minimum(jnp.min(preds), jnp.min(target))
    return both_max - both_min


def psnr(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB over the whole batch."""
    rng = _data_range(preds, target)
    mse = jnp.mean((preds - target) ** 2)
    return 10.0 * jnp.log10(rng**2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    k = np.outer(g, g)
    return jnp.asarray(k, dtype=jnp.float32)


def ssim(
    preds: jnp.ndarray,
    target: jnp.ndarray,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity, NCHW inputs, mean over batch/channels/pixels."""
    rng = _data_range(preds, target)
    c1 = (k1 * rng) ** 2
    c2 = (k2 * rng) ** 2

    kern = _gaussian_kernel(kernel_size, sigma)[:, :, None, None]  # HWIO 1->1

    b, c = preds.shape[0], preds.shape[1]
    x = preds.reshape(b * c, 1, *preds.shape[2:]).transpose(0, 2, 3, 1)
    y = target.reshape(b * c, 1, *target.shape[2:]).transpose(0, 2, 3, 1)

    def blur(t):
        return jax.lax.conv_general_dilated(
            t, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    mu_x, mu_y = blur(x), blur(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = blur(x * x) - mu_x2
    sig_y = blur(y * y) - mu_y2
    sig_xy = blur(x * y) - mu_xy

    num = (2 * mu_xy + c1) * (2 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    return jnp.mean(num / den)

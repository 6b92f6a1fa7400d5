"""PSNR / SSIM in pure JAX (the reference uses torchmetrics, watermelon.py:25-28).

Conventions match torchmetrics defaults with ``data_range=None``: the dynamic
range is estimated from the data itself as ``max(target) - min(target)`` over
the union of both inputs, and SSIM uses a gaussian 11x11 window with sigma
1.5, k1=0.01, k2=0.03, averaged over batch and channels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _data_range(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    both_max = jnp.maximum(jnp.max(preds), jnp.max(target))
    both_min = jnp.minimum(jnp.min(preds), jnp.min(target))
    return both_max - both_min


def psnr(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB over the whole batch."""
    preds = preds.astype(jnp.float32)
    target = target.astype(jnp.float32)
    rng = _data_range(preds, target)
    mse = jnp.mean((preds - target) ** 2)
    return 10.0 * jnp.log10(rng**2 / mse)


def _gaussian_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def ssim(
    preds: jnp.ndarray,
    target: jnp.ndarray,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    plane_chunk: int | None = None,
) -> jnp.ndarray:
    """Structural similarity, NCHW inputs, mean over batch/channels/pixels.

    The 11x11 gaussian window is exactly separable (outer product), so the
    five blurred moment maps [x, y, x^2, y^2, xy] are computed with ONE pair
    of depthwise row/col convolutions over a channel-stacked tensor instead
    of five dense single-channel 11x11 convs — single-channel convs leave
    the TPU's vector lanes idle, and 2x11 taps replace 121.

    ``plane_chunk`` bounds peak memory for huge images (the moment stack is
    5 x (b*c) x H x W f32 — ~12 GB for a 24-plane 4K focal stack, an OOM on
    one 16 GB chip): the global data range and moment shift are computed
    once over everything, then the blurred-moment pass runs ``plane_chunk``
    (b, c) planes at a time and the per-plane SSIM means are combined with
    plane-count weights.  Every plane's SSIM map has the same spatial shape,
    so the weighted combination is algebraically the unchunked mean.
    """
    # max/min commute with the monotone f32 cast, so reducing first is exact
    rng = _data_range(preds, target).astype(jnp.float32)
    # the 1e-30 floor only matters when rng == 0 (bit-identical inputs,
    # where num == den and SSIM is exactly 1 instead of 0/0 = nan)
    c1 = (k1 * rng) ** 2 + 1e-30
    c2 = (k2 * rng) ** 2 + 1e-30

    b, c = preds.shape[0], preds.shape[1]
    x_all = preds.reshape(b * c, *preds.shape[2:])
    y_all = target.reshape(b * c, *target.shape[2:])

    # Shifted moments: sig = E[x^2] - mu^2 is catastrophically ill-conditioned
    # when mean^2 >> variance (f32 error ~eps*mu^2 exceeds the c2 stabilizer,
    # so `den` crosses zero and the map goes inf / >1 — observed at 1080p
    # validation).  Subtracting a global constant leaves every variance and
    # covariance algebraically unchanged while shrinking the cancelling
    # terms to O(x - shift)^2; the shift is added back for the luminance
    # (mu) terms only.  dtype=f32 reductions avoid materializing full f32
    # copies of bf16 inputs.
    shift = 0.5 * (jnp.mean(x_all, dtype=jnp.float32)
                   + jnp.mean(y_all, dtype=jnp.float32))

    n = b * c
    if plane_chunk is None or plane_chunk >= n:
        return _ssim_planes(x_all, y_all, shift, c1, c2, kernel_size, sigma)
    total = jnp.zeros((), jnp.float32)
    for start in range(0, n, plane_chunk):
        xc = x_all[start:start + plane_chunk]
        yc = y_all[start:start + plane_chunk]
        total = total + xc.shape[0] * _ssim_planes(
            xc, yc, shift, c1, c2, kernel_size, sigma)
    return total / n


@partial(jax.jit, static_argnames=("kernel_size", "sigma"))
def _ssim_planes(x, y, shift, c1, c2, kernel_size, sigma):
    """Mean SSIM over a stack of (H, W) plane pairs, given global stats.

    jitted (scalar output) so the eager per-chunk call chain doesn't
    materialize the moment stack + two blur passes as four separate ~0.8 GB
    HBM buffers at 4K — XLA fuses the moment construction into the first
    conv and the SSIM map into the final reduction.
    """
    x = x.astype(jnp.float32) - shift
    y = y.astype(jnp.float32) - shift

    planes = jnp.concatenate([x, y, x * x, y * y, x * y], axis=0)
    nch = planes.shape[0]
    planes = planes[None].transpose(0, 2, 3, 1)  # (1, H, W, 5*b*c)

    g = _gaussian_1d(kernel_size, sigma)
    krow = jnp.asarray(np.tile(g[:, None, None, None], (1, 1, 1, nch)))
    kcol = jnp.asarray(np.tile(g[None, :, None, None], (1, 1, 1, nch)))

    def blur1d(t, kern):
        # HIGHEST: TPU convs default to bf16 multiply passes, and the
        # moment-map cancellation sig_x = E[x^2] - mu_x^2 then carries
        # ~0.8%-of-m^2 error — larger than c2, so `den` can cross zero at
        # some pixel and the mean goes inf (seen sporadically at 1080p
        # validation, where 49M pixels get sampled per batch).  True-f32
        # passes bound the error at ~6e-8*m^2 << c2.  The depthwise 11-tap
        # blur is a negligible cost at HIGHEST.
        return jax.lax.conv_general_dilated(
            t, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=nch,
            precision=jax.lax.Precision.HIGHEST,
        )

    blurred = blur1d(blur1d(planes, krow), kcol)[0]  # (H', W', 5*n_planes)
    blurred = blurred.transpose(2, 0, 1).reshape(5, x.shape[0], *blurred.shape[:2])
    mu_xs, mu_ys = blurred[0], blurred[1]  # shifted means
    sig_x = blurred[2] - mu_xs * mu_xs
    sig_y = blurred[3] - mu_ys * mu_ys
    sig_xy = blurred[4] - mu_xs * mu_ys
    mu_x, mu_y = mu_xs + shift, mu_ys + shift  # luminance uses true means
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y

    num = (2 * mu_xy + c1) * (2 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    return jnp.mean(num / den)

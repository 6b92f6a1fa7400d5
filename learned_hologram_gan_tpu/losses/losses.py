"""Loss functions (pure jnp rebuild of reference loss_func.py:66-208).

Every function takes/returns float32 jnp arrays in NCHW layout.  The "focal"
variants self-weight the error map by its own detached, max-normalized
magnitude — gradients flow through the raw difference only
(``stop_gradient`` replaces the reference's ``torch.no_grad`` blocks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def total_variation(x: jnp.ndarray) -> jnp.ndarray:
    """Mean |dx| + mean |dy| (reference loss_func.py:66-77)."""
    d1 = x[:, :, :, 1:] - x[:, :, :, :-1]
    d2 = x[:, :, 1:, :] - x[:, :, :-1, :]
    return jnp.mean(jnp.abs(d1)) + jnp.mean(jnp.abs(d2))


def total_variation_for_poh(x: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 TV, designed for checkerboard-encoded POHs (reference :80-91)."""
    d1 = x[:, :, :, 2:] - x[:, :, :, :-2]
    d2 = x[:, :, 2:, :] - x[:, :, :-2, :]
    return jnp.mean(jnp.abs(d1)) + jnp.mean(jnp.abs(d2))


def total_variation_loss(y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """| TV(y_hat) - TV(y) | (reference :94-98)."""
    return jnp.abs(total_variation(y_hat) - total_variation(y))


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def amp_loss(amp_hat: jnp.ndarray, amp: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    """MSE + alpha * TV-difference (reference :101-104)."""
    return mse(amp_hat, amp) + alpha * total_variation_loss(amp_hat, amp)


def amp_phs_loss(
    amp_hat: jnp.ndarray,
    phs_hat: jnp.ndarray,
    amp: jnp.ndarray,
    phs: jnp.ndarray,
    alpha: float = 1.0,
) -> jnp.ndarray:
    """MSE + alpha*TV on the (amp, sin phs, cos phs) channel stack.

    Reference :107-120; phases are expected in radians.  (The reference's
    stage-1 ``train_model`` accidentally scales the target phase by 2*pi
    twice — RGBD2AP.py:99 then :139-153; this implementation takes the phase
    as given, i.e. the single-scaling reading.)
    """
    hat = jnp.concatenate([amp_hat, jnp.sin(phs_hat), jnp.cos(phs_hat)], axis=1)
    tgt = jnp.concatenate([amp, jnp.sin(phs), jnp.cos(phs)], axis=1)
    return mse(hat, tgt) + alpha * total_variation_loss(hat, tgt)


def focal_freq_loss(fake_freq: jnp.ndarray, real_freq: jnp.ndarray) -> jnp.ndarray:
    """Self-weighted frequency L2 (reference :123-132; defined but unused)."""
    diff = jnp.abs(fake_freq - real_freq)
    w = jax.lax.stop_gradient(diff / jnp.max(diff))
    return jnp.mean((diff * w) ** 2)


def _sincos(phase: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([jnp.sin(phase), jnp.cos(phase)], axis=1)


def focal_sincos_phase_gradient_loss(
    fake_phase: jnp.ndarray, real_phase: jnp.ndarray
) -> jnp.ndarray:
    """Self-weighted L1 on spatial gradients of (sin, cos) phase (reference :135-163)."""
    f, r = _sincos(fake_phase), _sincos(real_phase)
    d1 = jnp.abs((f[:, :, :, 1:] - f[:, :, :, :-1]) - (r[:, :, :, 1:] - r[:, :, :, :-1]))
    d2 = jnp.abs((f[:, :, 1:, :] - f[:, :, :-1, :]) - (r[:, :, 1:, :] - r[:, :, :-1, :]))
    w1 = jax.lax.stop_gradient(d1 / jnp.max(d1))
    w2 = jax.lax.stop_gradient(d2 / jnp.max(d2))
    return jnp.mean(d1 * w1) + jnp.mean(d2 * w2)


def phase_sincos_gradient_loss(
    fake_phase: jnp.ndarray, real_phase: jnp.ndarray
) -> jnp.ndarray:
    """Unweighted variant (reference :166-184)."""
    f, r = _sincos(fake_phase), _sincos(real_phase)
    d1 = jnp.abs((f[:, :, :, 1:] - f[:, :, :, :-1]) - (r[:, :, :, 1:] - r[:, :, :, :-1]))
    d2 = jnp.abs((f[:, :, 1:, :] - f[:, :, :-1, :]) - (r[:, :, 1:, :] - r[:, :, :-1, :]))
    return jnp.mean(d1) + jnp.mean(d2)


def focal_sincos_phase_loss(
    fake_phase: jnp.ndarray, real_phase: jnp.ndarray
) -> jnp.ndarray:
    """Self-weighted L1 directly on (sin, cos) phase (reference :187-203)."""
    d = jnp.abs(_sincos(fake_phase) - _sincos(real_phase))
    w = jax.lax.stop_gradient(d / jnp.max(d))
    return jnp.mean(d * w)


def plain_phase_loss(fake_phase: jnp.ndarray, real_phase: jnp.ndarray) -> jnp.ndarray:
    """Mean |difference| (reference :206-208)."""
    return jnp.mean(jnp.abs(fake_phase - real_phase))


PHASE_LOSSES = {
    "focal_sincos_gradient": focal_sincos_phase_gradient_loss,
    "sincos_gradient": phase_sincos_gradient_loss,
    "focal_sincos": focal_sincos_phase_loss,
    "plain": plain_phase_loss,
}

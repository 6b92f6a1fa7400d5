"""WGAN-GP patch critic (reference discriminator.py:5-67).

conv3x3 + LeakyReLU(0.2) stem, then 5 conv-BN-LeakyReLU blocks with strides
1/2 alternating and channels feature_d * (1, 2, 4, 8, 16, 32), final 1-channel
conv + flatten to per-patch Wasserstein scores (no sigmoid).  NCHW public
layout, NHWC internal.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class WGANGPDiscriminator192(nn.Module):
    """Patch critic for ~192px inputs (reference discriminator.py:5-51)."""

    feature_d: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_nchw: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        x = nn.Conv(self.feature_d, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        for i, stride in enumerate([2, 1, 2, 1, 2]):
            x = nn.Conv(
                self.feature_d * (2 ** (i + 1)),
                (3, 3),
                strides=(stride, stride),
                padding="SAME",
                dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.leaky_relu(x.astype(self.dtype), 0.2)
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return x.astype(jnp.float32).reshape(x.shape[0], -1)


class FakeDiscriminator(nn.Module):
    """Constant-zero critic with one dummy parameter (reference :54-67).

    Keeps the non-GAN ablation trainers structurally identical to the full
    GAN loop (the optimizer still has a parameter to hold).
    """

    feature_d: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_nchw: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        _ = self.param("a", nn.initializers.ones, (1,))
        return jnp.zeros((1,), dtype=jnp.float32)

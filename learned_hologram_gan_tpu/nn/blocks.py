"""Flax (linen) neural-net building blocks.

TPU-first rebuild of the reference ``neural_network_components.py`` (353 LoC,
torch Lazy modules): explicit shapes replace the Lazy/dummy-forward idiom, all
convs run NHWC (TPU-native layout; the model layer converts from the
reference's NCHW at its boundary), and normalization statistics are computed
over the *global* batch automatically when the batch axis is sharded under
jit (GSPMD inserts the collectives).

Component map (reference file:line):
  ResidualBlock              neural_network_components.py:6-32
  SymmetricConv2d            neural_network_components.py:35-75
  ChannelWiseSymmetricConv   neural_network_components.py:78-95
  fakeChannelWiseSymmetricConv  :98-103 (ablation identity)
  miniResNet / ResNet        :106-138 / :141-177
  ResNetPOH                  :180-185
  miniUNet / UNet            :188-238 / :241-315
  RGBD_UNet                  :318-333
  FourierBlock / UNetFourier :336-353
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# Reference init scheme (RGBD2AP.py:155-176 / AP2POH.py:232-253): Xavier
# normal for convs, Kaiming normal (fan_out, relu) for transposed convs,
# zeros for biases, ones/zeros for norm scale/bias.
conv_init = nn.initializers.xavier_normal()
conv_transpose_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _conv(features: int, kernel: int, strides: int = 1, dtype: Dtype = jnp.float32):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(strides, strides),
        padding="SAME" if kernel > 1 else "VALID",
        kernel_init=conv_init,
        dtype=dtype,
    )


class ResidualBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN (+1x1 shortcut) -> add -> ReLU.

    Reference neural_network_components.py:6-32.  BatchNorm runs in the
    block compute dtype (bf16 on TPU) — flax computes the mean/var
    reductions in f32 regardless (force_float32_reductions), so statistics
    stay stable while the normalized activations avoid a full f32
    materialize-and-cast round trip per BN (the dominant HBM traffic of the
    UNet at 384^2+).
    """

    features: int
    use_1x1conv: bool = False
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        y = _conv(self.features, 3, self.strides, self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.use_1x1conv:
            x = _conv(self.features, 1, self.strides, self.dtype)(x)
        return nn.relu(y + x)


class _ConvParams(nn.Module):
    """Raw conv parameters with ``nn.Conv``'s tree layout ({kernel, bias}).

    Lets the polyphase level-0 path declare parameters that are bit-identical
    (same names, shapes, initializers, RNG fold path) to the standard
    modules', so checkpoints interchange between the two compute paths.
    """

    features: int
    in_features: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            conv_init,
            (self.kernel_size, self.kernel_size, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _PolyBatchNorm(nn.Module):
    """BatchNorm over phase-major (N, h, w, 4C) input, per ORIGINAL channel.

    Statistics reduce over the phase axis as well, so they equal the
    standard-domain (N, 2h, 2w, C) statistics exactly (the phases partition
    the pixels).  Mirrors ``nn.BatchNorm`` semantics: f32 fast-variance
    stats, momentum 0.99 running averages (skipped at init), scale/bias cast
    to the compute dtype before use.
    """

    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x4: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        from .polyphase import tile4

        c = x4.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,)
        )
        # "at least f32" like flax._compute_stats (keeps f64 under x64)
        stat_dtype = jnp.promote_types(x4.dtype, jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x4.astype(stat_dtype).reshape(*x4.shape[:3], 4, c)
            mean = jnp.mean(xf, axis=(0, 1, 2, 3))
            mean2 = jnp.mean(xf * xf, axis=(0, 1, 2, 3))
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        mul = jax.lax.rsqrt(
            var.astype(stat_dtype) + self.epsilon
        ) * scale.astype(self.dtype).astype(stat_dtype)
        y = (x4.astype(stat_dtype) - tile4(mean.astype(stat_dtype))) * tile4(
            mul
        ) + tile4(bias.astype(self.dtype).astype(stat_dtype))
        return y.astype(self.dtype)


class PolyResidualBlock(nn.Module):
    """ResidualBlock computed in the space-to-depth phase domain (exact).

    Same parameter tree as :class:`ResidualBlock` (Conv_0/BatchNorm_0/Conv_1/
    BatchNorm_1/Conv_2); input and output are phase-major (N, h, w, 4C).
    Differentiable — this is the TRAINING form of the level-0 fix; see
    nn/polyphase.py for the derivation and measurements.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x4: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        from .polyphase import poly_conv1x1, poly_conv3x3

        cin = x4.shape[-1] // 4
        k0, b0 = _ConvParams(self.features, cin, 3, name="Conv_0")()
        k1, b1 = _ConvParams(self.features, self.features, 3, name="Conv_1")()
        k2, b2 = _ConvParams(self.features, cin, 1, name="Conv_2")()
        x4 = x4.astype(self.dtype)
        y = poly_conv3x3(x4, k0.astype(self.dtype), b0)
        y = _PolyBatchNorm(dtype=self.dtype, name="BatchNorm_0")(y, not train)
        y = nn.relu(y)
        y = poly_conv3x3(y, k1.astype(self.dtype), b1)
        y = _PolyBatchNorm(dtype=self.dtype, name="BatchNorm_1")(y, not train)
        sc = poly_conv1x1(x4, k2.astype(self.dtype), b2)
        return nn.relu(y + sc)


class _PolyUpConv(nn.Module):
    """PixelShuffleConvTranspose with the output kept phase-major.

    Same parameter tree (kernel (2, 2, Cin, Cout) HWIO + bias); the GEMM's
    columns are already phase-major so the shuffle transpose is dropped.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from .polyphase import poly_upconv_gemm

        cin = x.shape[-1]
        kernel = self.param("kernel", conv_transpose_init, (2, 2, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return poly_upconv_gemm(
            x.astype(self.dtype), kernel.astype(self.dtype), bias
        )


class SymmetricConv2d(nn.Module):
    """Radially-symmetric single-channel conv: one learnable scalar per unique
    squared distance from the kernel center, expanded via a static index map.

    Models an isotropic optical point-spread function (reference
    neural_network_components.py:35-75; |N(0,1)| init, scalar bias).  Expects
    NHWC input with a single channel.
    """

    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @staticmethod
    def distance_map(kernel_size: int) -> Tuple[np.ndarray, int]:
        c = kernel_size // 2
        ii, jj = np.meshgrid(np.arange(kernel_size), np.arange(kernel_size), indexing="ij")
        d = (ii - c) ** 2 + (jj - c) ** 2
        uniq = np.unique(d)
        idx = np.searchsorted(uniq, d)
        return idx.astype(np.int32), len(uniq)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        idx_map, n_uniq = self.distance_map(self.kernel_size)
        params = self.param(
            "radial_weights",
            lambda key: jnp.abs(nn.initializers.normal(1.0)(key, (n_uniq,))),
        )
        bias = self.param("bias", nn.initializers.zeros, (1,))
        kernel = params[jnp.asarray(idx_map)]  # (k, k)
        kernel = kernel[:, :, None, None].astype(self.dtype)  # HWIO, 1->1 channel
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(self.dtype)


class ChannelWiseSymmetricConv(nn.Module):
    """Three independent SymmetricConv2d, one per R/G/B channel.

    Reference neural_network_components.py:78-95.  NHWC in/out, 3 channels.
    """

    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        outs = [
            SymmetricConv2d(self.kernel_size, dtype=self.dtype, name=f"conv_{c}")(
                x[..., i : i + 1]
            )
            for i, c in enumerate("rgb")
        ]
        return jnp.concatenate(outs, axis=-1)


class FakeChannelWiseSymmetricConv(nn.Module):
    """Identity stub (ablation stand-in, reference :98-103)."""

    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x


class PixelShuffleConvTranspose(nn.Module):
    """2x2/stride-2 transposed conv (two bit-equal implementations).

    ``impl="conv_transpose"`` (default) lowers through
    ``lax.conv_transpose``; ``impl="gemm"`` computes the identical op as a
    plain (N*H*W, Cin) x (Cin, 4*Cout) GEMM + pixel shuffle: with kernel ==
    stride each output pixel receives exactly one tap, so ``out[n, 2i+di,
    2j+dj, co] = sum_ci x[n, i, j, ci] * kernel[1-di, 1-dj, ci, co] +
    bias[co]`` (``lax.conv_transpose`` spatially flips the kernel; verified
    by delta-input probe).

    Measurement history (this chip/XLA): round 3 adopted the GEMM form on a
    per-stage roofline argument, but the headline bench regressed 225 -> 196
    POH/s at exactly that commit (round-4 bisect) and the per-geometry A/B
    (tools/probe_upconv.py) shows ``lax.conv_transpose`` equal or faster at
    every decoder size — the shuffle's (n,h,2,w,2,c) transpose is
    lane-hostile at 64/128 output channels.  The default follows the
    end-to-end number; the GEMM form stays as an opt-in for chips/compilers
    that price the dilated-conv lowering worse.

    Parameter names/shapes match ``nn.ConvTranspose`` (``kernel`` HWIO
    (2, 2, Cin, Cout), ``bias`` (Cout,)) so checkpoints interchange across
    both impls (tools/convert_reference_weights.py pins this layout).

    Reference op being reproduced: torch ``nn.ConvTranspose2d(.., 2,
    stride=2)``, neural_network_components.py:252-257,274-289.
    """

    features: int
    dtype: Dtype = jnp.float32
    impl: str = "conv_transpose"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, cin = x.shape
        kernel = self.param(
            "kernel", conv_transpose_init, (2, 2, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.impl == "conv_transpose":
            y = jax.lax.conv_transpose(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                (2, 2),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype)
        # flip spatial taps, then (2, 2, Cin, Cout) -> (Cin, 2, 2, Cout)
        # -> (Cin, 4*Cout)
        wmat = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3)).reshape(
            cin, 4 * self.features
        )
        y = jnp.dot(x.astype(self.dtype), wmat.astype(self.dtype))
        y = y.reshape(n, h, w, 2, 2, self.features)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            n, 2 * h, 2 * w, self.features
        )
        return y + bias.astype(self.dtype)


class _ResNetBase(nn.Module):
    """Shared stride-1 ResNet trunk (reference miniResNet/ResNet)."""

    output_channels: int
    stem_features: int
    block_plan: Sequence[Tuple[int, bool]]  # (features, use_1x1conv)
    stem_kernel: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        y = _conv(self.stem_features, self.stem_kernel, 1, self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        for feats, use_1x1 in self.block_plan:
            y = ResidualBlock(feats, use_1x1conv=use_1x1, dtype=self.dtype)(y, train)
        y = _conv(self.output_channels, 1, 1, self.dtype)(y)
        return nn.sigmoid(y)


def MiniResNet(output_channels: int = 3, dtype: Dtype = jnp.float32) -> _ResNetBase:
    """4 residual blocks at 32/64 channels (reference :106-138)."""
    return _ResNetBase(
        output_channels=output_channels,
        stem_features=32,
        block_plan=[(32, False), (32, False), (64, True), (64, False)],
        dtype=dtype,
    )


def ResNet(output_channels: int = 3, dtype: Dtype = jnp.float32) -> _ResNetBase:
    """8 residual blocks, 64 -> 512 channels (reference :141-177)."""
    return _ResNetBase(
        output_channels=output_channels,
        stem_features=64,
        block_plan=[
            (64, False), (64, False), (128, True), (128, False),
            (256, True), (256, False), (512, True), (512, False),
        ],
        dtype=dtype,
    )


class ResNetPOH(nn.Module):
    """ResNet with output scaled to [0, 2*pi] phase (reference :180-185)."""

    output_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        return 2.0 * np.pi * ResNet(self.output_channels, self.dtype)(x, train)


class FourierBlock(nn.Module):
    """Spatial ResidualBlock + ResidualBlock in the 1-D FFT domain, summed.

    Reference :336-353 (fft -> conv -> ifft over the last spatial axis; the
    real part survives the sum as in torch's implicit complex->real cast).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        spatial = ResidualBlock(self.features, use_1x1conv=True, dtype=self.dtype)(
            x, train
        )
        f = jnp.fft.fft(x.astype(jnp.float32), axis=-2)  # along W in NHWC
        fr = ResidualBlock(self.features, use_1x1conv=True, dtype=self.dtype)(
            jnp.real(f).astype(x.dtype), train
        )
        fi = ResidualBlock(self.features, use_1x1conv=True, dtype=self.dtype)(
            jnp.imag(f).astype(x.dtype), train
        )
        fourier = jnp.real(
            jnp.fft.ifft(jax.lax.complex(fr.astype(jnp.float32), fi.astype(jnp.float32)), axis=-2)
        ).astype(x.dtype)
        return spatial + fourier


class UNet(nn.Module):
    """Residual-block UNet, shape-preserving, sigmoid head.

    Reference UNet (:241-315): 4 encoder levels at base*1..base*8 channels,
    bottleneck base*16 + ConvTranspose up, skip connections by channel
    concat, final 1x1 conv + Sigmoid.  ``levels=2`` with ``base_features=16``
    reproduces miniUNet (:188-238).  ``fourier=True`` swaps the conv blocks
    for FourierBlocks (reference Unet_Fourier :348-353).  NHWC in/out.
    """

    output_channels: int = 6
    base_features: int = 64
    levels: int = 4
    fourier: bool = False
    remat: bool = False  # activation checkpointing per conv block (1080p/4K)
    polyphase_level0: bool = False  # level 0 in the s2d phase domain (exact)
    dtype: Dtype = jnp.float32

    def _block(self, feats: int, name: str, poly: bool = False):
        if poly:
            cls = PolyResidualBlock
            kwargs = dict(dtype=self.dtype)
        elif self.fourier:
            cls = FourierBlock
            kwargs = dict(dtype=self.dtype)
        else:
            cls = ResidualBlock
            kwargs = dict(use_1x1conv=True, dtype=self.dtype)
        if self.remat:
            # rematerialize each block's activations in the backward pass —
            # trades FLOPs for the memory that dominates at 1080p/4K
            # (SURVEY.md section 5).  Explicit names keep the param tree
            # identical to the non-remat variant, so checkpoints interchange.
            cls = nn.remat(cls, static_argnums=(2,))
        return cls(feats, name=name, **kwargs)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        from .polyphase import (
            depth_to_space,
            poly_concat,
            poly_conv1x1,
            poly_pool,
            space_to_depth,
        )

        # Polyphase level 0 (nn/polyphase.py): same parameter tree, exact
        # math, 192^2 x 4C geometry instead of the bandwidth-hostile
        # 384^2 x C — the conv-path fix measured in BASELINE.md round 3.
        poly = (
            self.polyphase_level0
            and not self.fourier
            and self.levels > 1
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        skips = []
        if poly:
            x4 = space_to_depth(x)
            s0 = self._block(self.base_features, "enc_0", poly=True)(x4, train)
            skips.append(s0)  # kept phase-major
            y = poly_pool(s0)
        else:
            y = self._block(self.base_features, "enc_0")(x, train)
            skips.append(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        # Encoder: block at base * 2^i, then 2x2 max-pool between levels.
        for i in range(1, self.levels):
            y = self._block(self.base_features * (2**i), f"enc_{i}")(y, train)
            skips.append(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        # Bottleneck + first up-conv.  Up-convs use the GEMM+pixel-shuffle
        # form of the same 2x2/stride-2 transposed conv (see
        # PixelShuffleConvTranspose); explicit names keep the param tree
        # identical to the original nn.ConvTranspose auto-naming.
        y = self._block(self.base_features * (2**self.levels), "bottleneck")(y, train)
        if self.levels > 1:  # levels == 1: the bottleneck up IS the final up
            y = PixelShuffleConvTranspose(
                self.base_features * (2 ** (self.levels - 1)),
                dtype=self.dtype,
                name="ConvTranspose_0",
            )(y)
        # Decoder: concat skip (doubling channels), block back down to
        # base * 2^i, up-conv to base * 2^(i-1) (reference :274-289: decoder1
        # maps cat(512, 512) -> 512 -> up 256, ... decoder4 -> 64).
        for i in reversed(range(1, self.levels)):
            y = jnp.concatenate([skips[i], y], axis=-1)
            y = self._block(self.base_features * (2**i), f"dec_{i}")(y, train)
            if i > 1:
                y = PixelShuffleConvTranspose(
                    self.base_features * (2 ** (i - 1)),
                    dtype=self.dtype,
                    name=f"ConvTranspose_{self.levels - i}",
                )(y)
        if poly:
            y = _PolyUpConv(
                self.base_features,
                dtype=self.dtype,
                name=f"ConvTranspose_{self.levels - 1}",
            )(y)
            y = poly_concat(skips[0], y)
            y = self._block(self.base_features, "dec_0", poly=True)(y, train)
            cin = self.base_features
            kh, bh = _ConvParams(self.output_channels, cin, 1, name="Conv_0")()
            y = poly_conv1x1(
                y.astype(self.dtype), kh.astype(self.dtype), bh
            )
            return nn.sigmoid(depth_to_space(y))
        y = PixelShuffleConvTranspose(
            self.base_features,
            dtype=self.dtype,
            name=f"ConvTranspose_{self.levels - 1}",
        )(y)
        y = jnp.concatenate([skips[0], y], axis=-1)
        y = self._block(self.base_features, "dec_0")(y, train)
        y = _conv(self.output_channels, 1, 1, self.dtype)(y)
        return nn.sigmoid(y)


def MiniUNet(output_channels: int = 1, dtype: Dtype = jnp.float32) -> UNet:
    """2-level, 16-base-feature UNet (reference miniUNet :188-238)."""
    return UNet(
        output_channels=output_channels, base_features=16, levels=2, dtype=dtype
    )


class RGBDUNet(nn.Module):
    """Per-color variant: three UNet(2) on (R,D), (G,D), (B,D) slices.

    Reference RGBD_UNet (:318-333).  NHWC input with channels [R, G, B, D];
    output channels [amp_r, amp_g, amp_b, phs_r, phs_g, phs_b].
    """

    base_features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, rgbd: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        outs = []
        for i, c in enumerate("rgb"):
            net = UNet(
                output_channels=2,
                base_features=self.base_features,
                dtype=self.dtype,
                name=f"unet_{c}",
            )
            outs.append(net(rgbd[..., [i, 3]], train))
        amps = jnp.concatenate([o[..., :1] for o in outs], axis=-1)
        phss = jnp.concatenate([o[..., 1:] for o in outs], axis=-1)
        return jnp.concatenate([amps, phss], axis=-1)

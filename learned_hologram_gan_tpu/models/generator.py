"""The two-stage generator: RGBD -> amp/phase -> phase-only hologram.

TPU-native rebuild of the reference model layer
(``watermelon_hologram/{RGBD2AP,AP2POH,generator}.py``):

* :class:`RGBD2AP` — stage 1 (reference RGBD2AP.py:15-50): a UNet maps the
  4-channel RGBD stack to 6 channels, split into amplitude (scaled by 1.1)
  and phase (scaled by 2*pi).
* :class:`AP2POH` — stage 2 (reference AP2POH.py:16-116): backward-propagate
  the image-plane field to the SLM plane through the cached-H angular-
  spectrum kernel, modulate real/imag with a shared radially-symmetric
  per-color conv, then double-phase encode into a single phase map using
  complementary cell-size-1 checkerboards.
* :class:`Generator` — the composition (reference generator.py:15-59).

Design notes (differs from the reference *implementation*, not behavior):
  - Modules are pure Flax; the propagator state is an explicit
    :class:`~learned_hologram_gan_tpu.ops.asm.PropagatorPlan` argument rather
    than an attribute, so one jitted train step can thread any plan through.
  - Public tensor layout is NCHW (matching the reference's data format); the
    UNet runs NHWC internally (TPU-native conv layout).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import GeneratorConfig
from ..ops import asm
from ..ops import masks as masks_lib
from ..utils.normalize import amplitude_normalizor
from ..nn.blocks import (
    ChannelWiseSymmetricConv,
    FakeChannelWiseSymmetricConv,
    UNet,
)

Dtype = Any


def nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 3, 1, 2))


class RGBD2AP(nn.Module):
    """Stage 1: RGBD (B, 4, H, W) -> (amp, phs) each (B, 3, H, W).

    Reference RGBD2AP.py:15-50: ``amp = 1.1 * unet_out[:, :3]``,
    ``phs = 2*pi * unet_out[:, 3:]``.
    """

    amplitude_scaler: float = 1.1
    base_features: int = 64
    fourier: bool = False
    remat: bool = False
    polyphase_level0: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, rgbd: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y = UNet(
            output_channels=6,
            base_features=self.base_features,
            fourier=self.fourier,
            remat=self.remat,
            polyphase_level0=self.polyphase_level0,
            dtype=self.dtype,
            name="unet",
        )(nchw_to_nhwc(rgbd), train)
        y = nhwc_to_nchw(y).astype(jnp.float32)
        amp = self.amplitude_scaler * y[:, :3]
        phs = (2.0 * np.pi) * y[:, 3:]
        return amp, phs


def double_phase_encode(
    amp: jnp.ndarray, phs: jnp.ndarray
) -> jnp.ndarray:
    """Double-phase encoding with complementary cell-size-1 checkerboards.

    Reference AP2POH.py:86-96: ``phi_{1,2} = phs +/- acos(amp)`` interleaved
    by the two checkerboard masks (masks built at AP2POH.py:37-49).  ``amp``
    must be normalized strictly below 1 (see ``amplitude_normalizor``).
    Shapes: (B, C, H, W) -> (B, C, H, W).
    """
    h, w = amp.shape[-2], amp.shape[-1]
    board = masks_lib.checkerboard_mask(h, w, cell_size=1, invert=False)
    acos_amp = jnp.arccos(amp)
    phs_1 = phs + acos_amp
    phs_2 = phs - acos_amp
    # mask_1 = inverted board, mask_2 = board (reference AP2POH.py:37-49).
    return (1.0 - board) * phs_1 + board * phs_2


class AP2POH(nn.Module):
    """Stage 2: image-plane (amp, phs) -> SLM-plane phase-only hologram.

    Reference AP2POH.py:16-116.  The backward angular-spectrum propagation
    uses ``plan`` (built with the single fixed distance, default 1 mm); the
    radially-symmetric per-color conv is applied with *shared* weights to the
    real and imaginary parts (reference AP2POH.py:105-116).
    """

    kernel_size: int = 3
    use_modulation: bool = True  # False = ablation (reference watermelon.py:739-741)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        plan: asm.PropagatorPlan,
        amp_z: jnp.ndarray,
        phs_z: jnp.ndarray,
    ) -> jnp.ndarray:
        g0 = asm.propagate_ap2c_backward(plan, amp_z, phs_z)  # (B, 3, H, W) complex
        if self.use_modulation:
            conv = ChannelWiseSymmetricConv(self.kernel_size, dtype=self.dtype, name="modulation")
        else:
            conv = FakeChannelWiseSymmetricConv(self.kernel_size, name="modulation")
        re = nhwc_to_nchw(conv(nchw_to_nhwc(jnp.real(g0)))).astype(jnp.float32)
        im = nhwc_to_nchw(conv(nchw_to_nhwc(jnp.imag(g0)))).astype(jnp.float32)
        amp = jnp.sqrt(re * re + im * im)
        phs = jnp.arctan2(im, re)
        return double_phase_encode(amplitude_normalizor(amp), phs)


class Generator(nn.Module):
    """part2(part1(RGBD)) -> POH phase map (reference generator.py:15-59).

    Fully convolutional, hence resolution-agnostic: the spatial size is set
    by the ``plan`` and the input, not by module parameters.
    """

    config: GeneratorConfig = GeneratorConfig()

    def setup(self):
        dtype = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        self.part1 = RGBD2AP(
            amplitude_scaler=self.config.amplitude_scaler,
            base_features=self.config.unet_base_features,
            remat=self.config.remat,
            polyphase_level0=self.config.polyphase_level0,
            dtype=dtype,
        )
        self.part2 = AP2POH(
            kernel_size=self.config.kernel_size,
            use_modulation=self.config.use_modulation,
            dtype=dtype,
        )

    def __call__(
        self,
        plan: asm.PropagatorPlan,
        rgbd: jnp.ndarray,
        train: bool = True,
    ) -> jnp.ndarray:
        amp_hat, phs_hat = self.part1(rgbd, train)
        return self.part2(plan, amp_hat, phs_hat)

    def stage1(self, rgbd: jnp.ndarray, train: bool = True):
        """Expose part1 for two-stage pre-training (reference RGBD2AP.train_model)."""
        return self.part1(rgbd, train)

    def stage2(self, plan: asm.PropagatorPlan, amp: jnp.ndarray, phs: jnp.ndarray):
        """Expose part2 for two-stage pre-training (reference AP2POH.train_model)."""
        return self.part2(plan, amp, phs)


def generator_apply_fused(
    generator: Generator,
    variables,
    plan: asm.PropagatorPlan,
    rgbd: jnp.ndarray,
    *,
    polyphase_level0: bool = False,
) -> jnp.ndarray:
    """Eval-only Generator forward with the fused-UNet inference fast path.

    Identical math to ``generator.apply(..., train=False)`` — stage 1 runs
    through :func:`~learned_hologram_gan_tpu.nn.fused_unet.unet_apply_fused`
    (BN folded into convs; level 0 in the space-to-depth phase domain, the
    384^2-class bandwidth fix — see nn/fused_unet.py), stage 2 through the
    normal module.  Falls back to the plain module apply for trees the fast
    path doesn't understand (fourier UNet).  Equivalence pinned by
    tests/test_fused_unet.py.
    """
    from ..nn.fused_unet import supported, unet_apply_fused

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    unet_params = params["part1"]["unet"]
    if not supported(unet_params):
        return generator.apply(
            {"params": params, "batch_stats": batch_stats}, plan, rgbd,
            train=False,
        )
    dtype = (
        jnp.bfloat16 if generator.config.dtype == "bfloat16" else jnp.float32
    )
    y = unet_apply_fused(
        unet_params,
        batch_stats["part1"]["unet"],
        nchw_to_nhwc(rgbd).astype(dtype),
        polyphase_level0=polyphase_level0,
    )
    y = nhwc_to_nchw(y).astype(jnp.float32)
    amp = generator.config.amplitude_scaler * y[:, :3]
    phs = (2.0 * np.pi) * y[:, 3:]
    return generator.apply(
        {"params": params}, plan, amp, phs, method=Generator.stage2
    )


def generator_apply_quant(
    generator: Generator,
    variables,
    qtree,
    plan: asm.PropagatorPlan,
    rgbd: jnp.ndarray,
) -> jnp.ndarray:
    """Eval-only Generator forward with the int8-quantized stage-1 UNet.

    ``qtree`` comes from :func:`~learned_hologram_gan_tpu.nn.quant.
    quantize_unet` over ``variables["params"]["part1"]["unet"]``.  Stage 2
    (backward ASM + modulation + double-phase) stays float — it is spectral,
    cheap, and parameter-light.  Quality delta vs the bf16 path is measured
    by tools/eval_quant.py (BASELINE.md).
    """
    from ..nn.fused_unet import supported
    from ..nn.quant import unet_apply_q8, unet_apply_quant

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if not supported(params["part1"]["unet"]):
        # the quant walker assumes the plain UNet layout; a fourier/nested
        # checkpoint would die with an opaque KeyError deep in _walk_unet
        raise ValueError(
            "generator_apply_quant supports only the standard UNet parameter "
            "layout (no fourier/nested blocks); use generator.apply instead"
        )
    dtype = (
        jnp.bfloat16 if generator.config.dtype == "bfloat16" else jnp.float32
    )
    if "edges" in qtree:  # full-integer tree (quantize_unet_q8)
        y = unet_apply_q8(qtree, nchw_to_nhwc(rgbd))
    else:
        y = unet_apply_quant(
            qtree,
            params["part1"]["unet"],
            batch_stats["part1"]["unet"],
            nchw_to_nhwc(rgbd),
            dtype=dtype,
        )
    y = nhwc_to_nchw(y).astype(jnp.float32)
    amp = generator.config.amplitude_scaler * y[:, :3]
    phs = (2.0 * np.pi) * y[:, 3:]
    return generator.apply(
        {"params": params}, plan, amp, phs, method=Generator.stage2
    )


def make_generator_plan(
    config: GeneratorConfig, cache_h: bool = True
) -> asm.PropagatorPlan:
    """The fixed-distance plan a Generator propagates through (reference
    AP2POH.py:51-62: same optics, single distance, default 1 mm)."""
    return asm.make_plan(
        config.optics(), distances=[config.distance], cache_h=cache_h
    )

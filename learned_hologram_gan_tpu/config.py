"""Single source of truth for optics / model / training configuration.

The reference scatters physics constants across call sites with two
*different* wavelength defaults (propagator classes use [639, 515, 473] nm,
reference angular_spectrum_method.py:37, while the model layer uses
[638, 520, 450] nm, reference generator.py:24 / watermelon.py:57).  Here every
default lives in one frozen dataclass; the propagator-level legacy default is
kept available as ``LEGACY_PROPAGATOR_WAVELENGTHS`` for CLI/test parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Model-layer default (reference generator.py:24, watermelon.py:57,79)
DEFAULT_WAVELENGTHS: Tuple[float, float, float] = (638e-9, 520e-9, 450e-9)
# Propagator-class default (reference angular_spectrum_method.py:37)
LEGACY_PROPAGATOR_WAVELENGTHS: Tuple[float, float, float] = (639e-9, 515e-9, 473e-9)

DEFAULT_PIXEL_PITCH = 3.74e-6
DEFAULT_SEED = 122731  # reference trainingModel.py:18


@dataclasses.dataclass(frozen=True)
class OpticsConfig:
    """Geometry + physics of the hologram / SLM plane.

    ``pad_size`` is the row padding; the column padding is scaled by the
    aspect ratio exactly like the reference (angular_spectrum_method.py:45-49):
    ``pad_cols = int(pad_size * cols / rows)``.
    """

    rows: int = 192
    cols: int = 192
    pad_size: int = 0
    filter_radius_coefficient: float = 0.5
    pixel_pitch: float = DEFAULT_PIXEL_PITCH
    wavelengths: Tuple[float, ...] = DEFAULT_WAVELENGTHS
    # Override the aspect-derived column padding (TPU extension): at 4K the
    # reference formula can land on FFT-hostile sizes (e.g. 4968 = 2^3*3^3*23
    # forces Bluestein and blows memory); pick a 2/3/5-smooth padded width
    # with utils/fftlen.good_fft_pads instead.
    pad_cols_override: Optional[int] = None

    @property
    def pad_rows(self) -> int:
        return self.pad_size

    @property
    def pad_cols(self) -> int:
        if self.pad_cols_override is not None:
            return self.pad_cols_override
        return int(self.pad_size * (self.cols / self.rows))

    @property
    def padded_rows(self) -> int:
        return self.rows + 2 * self.pad_rows

    @property
    def padded_cols(self) -> int:
        return self.cols + 2 * self.pad_cols

    @property
    def num_channels(self) -> int:
        return len(self.wavelengths)


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """Two-stage generator (reference generator.py:15-59)."""

    rows: int = 192
    cols: int = 192
    pad_size: int = 160
    filter_radius_coefficient: float = 0.5
    kernel_size: int = 3
    pixel_pitch: float = DEFAULT_PIXEL_PITCH
    wavelengths: Tuple[float, ...] = DEFAULT_WAVELENGTHS
    distance: float = 1e-3
    amplitude_scaler: float = 1.1  # reference RGBD2AP.py:22
    unet_base_features: int = 64  # reference UNet encoder1 width
    use_modulation: bool = True  # False = ablation fakeChannelWiseSymmetricConv
    dtype: str = "float32"  # compute dtype for conv blocks ("bfloat16" on TPU)
    remat: bool = False  # activation checkpointing through the UNet (1080p/4K)
    # UNet level 0 in the space-to-depth phase domain: exact math, same
    # param tree, MXU-shaped geometry (nn/polyphase.py; BASELINE.md round 3)
    polyphase_level0: bool = False
    pad_cols_override: Optional[int] = None  # see OpticsConfig

    def optics(self) -> OpticsConfig:
        return OpticsConfig(
            rows=self.rows,
            cols=self.cols,
            pad_size=self.pad_size,
            filter_radius_coefficient=self.filter_radius_coefficient,
            pixel_pitch=self.pixel_pitch,
            wavelengths=self.wavelengths,
            pad_cols_override=self.pad_cols_override,
        )


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """WGAN-GP patch critic (reference discriminator.py:5-51)."""

    feature_d: int = 32
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Weighted generator-loss mix (reference watermelon.py:92-116,418-445).

    ``phase_loss`` selects the phase-term variant used by the ablation
    subclasses (reference watermelon.py:640-938):
      - "focal_sincos_gradient" (default, full model)
      - "plain"                  (watermelon_without_GAN_and_plain_phase_loss)
      - "focal_sincos"           (…_and_focal_sincos_phase_loss)
      - "sincos_gradient"        (…_and_phase_sincos_gradient_loss)
    ``perceptual`` is "vgg19" (pretrained weights required), "random" (the
    explicit untrained-VGG opt-in) or "none" (…_without_perceptual_loss).
    """

    phs_gradient_loss_weight: float = 1.0
    perceptual_loss_weight: float = 1.0
    pixel_loss_weight: float = 1.0
    tv_loss_weight: float = 1e-3
    discriminator_loss_weight: float = 1.0
    phase_loss: str = "focal_sincos_gradient"
    perceptual: str = "vgg19"
    perceptual_weights_path: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Full GAN training schedule (reference watermelon.py:92-116)."""

    use_gan: bool = True  # False = watermelon_without_GAN family
    epoch_num: int = 2
    lr_G: float = 1e-3
    lr_D: float = 1e-3
    discriminator_train_ratio: int = 2
    discriminator_lambda: float = 10.0
    checkpoint_interval: int = 5
    info_print_interval: int = 100
    info_plot_interval: int = 600
    seed: int = DEFAULT_SEED
    batch_size: int = 4

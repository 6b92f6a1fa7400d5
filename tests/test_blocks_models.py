"""Shape/behavior tests for NN blocks and the two-stage generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.config import GeneratorConfig, OpticsConfig
from learned_hologram_gan_tpu.models import (
    FakeDiscriminator,
    Generator,
    WGANGPDiscriminator192,
    double_phase_encode,
)
from learned_hologram_gan_tpu.nn import blocks
from learned_hologram_gan_tpu.ops import asm

RNG = np.random.default_rng(2)


def small_gen_config(**kw):
    defaults = dict(
        rows=32, cols=32, pad_size=8, filter_radius_coefficient=0.45,
        unet_base_features=4, distance=1e-3,
    )
    defaults.update(kw)
    return GeneratorConfig(**defaults)


def test_residual_block_shapes():
    m = blocks.ResidualBlock(8, use_1x1conv=True)
    x = jnp.ones((2, 16, 16, 3))
    vars_ = m.init(jax.random.key(0), x)
    y, _ = m.apply(vars_, x, mutable=["batch_stats"])
    assert y.shape == (2, 16, 16, 8)


def test_symmetric_conv_kernel_is_radially_symmetric():
    m = blocks.SymmetricConv2d(kernel_size=3)
    x = jnp.asarray(RNG.random((1, 8, 8, 1)).astype(np.float32))
    vars_ = m.init(jax.random.key(0), x)
    # 3 unique squared distances for k=3: 0, 1, 2 -> 3 params + bias.
    assert vars_["params"]["radial_weights"].shape == (3,)
    idx_map, n = blocks.SymmetricConv2d.distance_map(3)
    assert n == 3
    # corners share one weight, edges share another, center its own
    assert idx_map[0, 0] == idx_map[2, 2] == idx_map[0, 2] == idx_map[2, 0]
    assert idx_map[0, 1] == idx_map[1, 0] == idx_map[1, 2] == idx_map[2, 1]
    assert idx_map[1, 1] != idx_map[0, 1]
    # response to a flipped input is the flip of the response (symmetry)
    y = m.apply(vars_, x)
    y_flip = m.apply(vars_, x[:, ::-1, ::-1, :])
    np.testing.assert_allclose(np.asarray(y[:, ::-1, ::-1, :]), np.asarray(y_flip), atol=1e-5)


def test_channelwise_symmetric_conv_independent_channels():
    m = blocks.ChannelWiseSymmetricConv()
    x = jnp.asarray(RNG.random((1, 8, 8, 3)).astype(np.float32))
    vars_ = m.init(jax.random.key(0), x)
    y = m.apply(vars_, x)
    assert y.shape == x.shape
    # changing channel 2 must not affect outputs 0 and 1
    x2 = x.at[..., 2].set(0.0)
    y2 = m.apply(vars_, x2)
    np.testing.assert_allclose(np.asarray(y[..., :2]), np.asarray(y2[..., :2]), atol=1e-6)


@pytest.mark.slow
def test_unet_shape_preserving_and_sigmoid_range():
    m = blocks.UNet(output_channels=6, base_features=4, levels=4)
    x = jnp.ones((1, 32, 32, 4))
    vars_ = m.init(jax.random.key(0), x)
    y, _ = m.apply(vars_, x, mutable=["batch_stats"])
    assert y.shape == (1, 32, 32, 6)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_mini_unet_matches_reference_structure():
    m = blocks.MiniUNet(output_channels=1)
    assert m.levels == 2 and m.base_features == 16


def test_double_phase_encode_reconstructs_field():
    """Averaging adjacent double-phase cells recovers the target field.

    The two interleaved phases phi +/- acos(A) average (as complex phasors)
    to A*e^{i phi} — the defining property of double-phase encoding.
    """
    amp = RNG.random((1, 1, 16, 16)).astype(np.float32) * 0.9 + 0.05
    phs = RNG.random((1, 1, 16, 16)).astype(np.float32) * 2 * np.pi - np.pi
    poh = np.asarray(double_phase_encode(jnp.asarray(amp), jnp.asarray(phs)))
    phi1 = phs + np.arccos(amp)
    phi2 = phs - np.arccos(amp)
    mean_phasor = 0.5 * (np.exp(1j * phi1) + np.exp(1j * phi2))
    np.testing.assert_allclose(np.abs(mean_phasor), amp, atol=1e-5)
    # POH contains exactly phi1 on one checkerboard color and phi2 on the other
    board = (np.add.outer(np.arange(16), np.arange(16)) % 2).astype(bool)
    np.testing.assert_allclose(poh[0, 0][~board], phi1[0, 0][~board], atol=1e-5)
    np.testing.assert_allclose(poh[0, 0][board], phi2[0, 0][board], atol=1e-5)


@pytest.mark.slow  # tiering: 90-190s each on the 1-core host; fast coverage via test_fused_unet + golden
def test_generator_end_to_end_shapes():
    cfg = small_gen_config()
    gen = Generator(cfg)
    plan = asm.make_plan(cfg.optics(), distances=[cfg.distance])
    rgbd = jnp.asarray(RNG.random((2, 4, 32, 32)).astype(np.float32))
    vars_ = gen.init(jax.random.key(0), plan, rgbd)
    poh, _ = gen.apply(vars_, plan, rgbd, mutable=["batch_stats"])
    assert poh.shape == (2, 3, 32, 32)
    assert np.isfinite(np.asarray(poh)).all()


@pytest.mark.slow  # tiering: 90-190s each on the 1-core host; fast coverage via test_fused_unet + golden
def test_generator_resolution_agnostic():
    """Fully convolutional: the same params run at a different resolution."""
    cfg = small_gen_config()
    gen = Generator(cfg)
    plan32 = asm.make_plan(cfg.optics(), distances=[cfg.distance])
    rgbd32 = jnp.ones((1, 4, 32, 32))
    vars_ = gen.init(jax.random.key(0), plan32, rgbd32)

    cfg64 = small_gen_config(rows=64, cols=64)
    plan64 = asm.make_plan(cfg64.optics(), distances=[cfg64.distance])
    rgbd64 = jnp.ones((1, 4, 64, 64))
    poh, _ = gen.apply(vars_, plan64, rgbd64, mutable=["batch_stats"])
    assert poh.shape == (1, 3, 64, 64)


@pytest.mark.slow  # tiering: 38s (full-width generator init)
def test_generator_modulation_ablation_has_no_conv_params():
    cfg = small_gen_config(use_modulation=False)
    gen = Generator(cfg)
    plan = asm.make_plan(cfg.optics(), distances=[cfg.distance])
    vars_ = gen.init(jax.random.key(0), plan, jnp.ones((1, 4, 32, 32)))
    # the identity stub has no parameters, so part2 has no param subtree at all
    part2 = vars_["params"].get("part2", {})
    assert "modulation" not in part2


def test_discriminator_output_is_patch_scores():
    d = WGANGPDiscriminator192(feature_d=4)
    x = jnp.ones((2, 3, 32, 32))
    vars_ = d.init(jax.random.key(0), x)
    y, _ = d.apply(vars_, x, mutable=["batch_stats"])
    # 3 stride-2 blocks: 32 -> 16 -> 8 -> 4; scores = 4*4 patches
    assert y.shape == (2, 16)


def test_fake_discriminator_constant_zero_with_param():
    d = FakeDiscriminator()
    x = jnp.ones((2, 3, 32, 32))
    vars_ = d.init(jax.random.key(0), x)
    y = d.apply(vars_, x)
    assert y.shape == (1,) and float(y[0]) == 0.0
    assert "a" in vars_["params"]


@pytest.mark.slow  # tiering: 90-190s each on the 1-core host; fast coverage via test_fused_unet + golden
def test_resnet_family_shapes():
    """miniResNet / ResNet / ResNetPOH / RGBDUNet / Fourier UNet run-throughs."""
    x = jnp.ones((1, 16, 16, 4))
    for mk, out_ch in ((blocks.MiniResNet, 3), (blocks.ResNet, 2)):
        m = mk(output_channels=out_ch)
        vars_ = m.init(jax.random.key(0), x)
        y, _ = m.apply(vars_, x, mutable=["batch_stats"])
        assert y.shape == (1, 16, 16, out_ch)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    poh = blocks.ResNetPOH(output_channels=3)
    vars_ = poh.init(jax.random.key(0), x)
    y, _ = poh.apply(vars_, x, mutable=["batch_stats"])
    # sigmoid scaled to [0, 2*pi] phase output (reference :180-185)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 2 * np.pi + 1e-5

    rgbd = blocks.RGBDUNet(base_features=2)
    vars_ = rgbd.init(jax.random.key(0), x)
    y, _ = rgbd.apply(vars_, x, mutable=["batch_stats"])
    assert y.shape == (1, 16, 16, 6)

    fu = blocks.UNet(output_channels=6, base_features=2, levels=2, fourier=True)
    vars_ = fu.init(jax.random.key(0), x)
    y, _ = fu.apply(vars_, x, mutable=["batch_stats"])
    assert y.shape == (1, 16, 16, 6)
    assert np.isfinite(np.asarray(y)).all()


def test_propagate_p2i_is_squared_magnitude():
    from learned_hologram_gan_tpu.ops import asm as asm_mod
    from learned_hologram_gan_tpu.config import OpticsConfig

    optics = OpticsConfig(rows=16, cols=16, pad_size=4,
                          filter_radius_coefficient=0.45)
    plan = asm_mod.make_plan(optics, distances=[1e-3])
    phs = jnp.asarray(RNG.random((1, 3, 16, 16)).astype(np.float32))
    intensity = asm_mod.propagate_p2i(plan, phs)
    amp = asm_mod.propagate(plan, jnp.ones_like(phs), phs)
    np.testing.assert_allclose(np.asarray(intensity), np.asarray(amp) ** 2,
                               atol=1e-5)


def test_pixel_shuffle_conv_transpose_equals_flax_convtranspose():
    """GEMM+pixel-shuffle up-conv is bit-equivalent (f32) to nn.ConvTranspose.

    With kernel == stride == 2 every output pixel receives exactly one tap,
    so the two formulations compute the same sum; the param tree must also
    match so reference-converted checkpoints load into either
    (tools/convert_reference_weights.py pins kernel HWIO + bias).
    """
    from flax import linen as nn

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 6, 5, 8)), jnp.float32)
    default = blocks.PixelShuffleConvTranspose(4)
    gemm = blocks.PixelShuffleConvTranspose(4, impl="gemm")
    ref = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    v = default.init(jax.random.key(0), x)
    assert set(v["params"].keys()) == {"kernel", "bias"}
    assert v["params"]["kernel"].shape == (2, 2, 8, 4)
    assert v["params"]["bias"].shape == (4,)
    out_default = default.apply(v, x)
    out_gemm = gemm.apply(v, x)
    out_ref = ref.apply(v, x)  # identical param tree loads directly
    assert out_default.shape == (2, 12, 10, 4)
    for out in (out_default, out_gemm):
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   rtol=1e-5, atol=1e-5)


def test_unet_param_tree_unchanged_by_pixel_shuffle_upconv():
    """UNet still exposes ConvTranspose_{0..3} with the pinned HWIO shapes."""
    net = blocks.UNet(output_channels=6, base_features=8)
    v = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 4)), True)
    p = v["params"]
    for j, cin, cout in [(0, 128, 64), (1, 64, 32), (2, 32, 16), (3, 16, 8)]:
        k = p[f"ConvTranspose_{j}"]["kernel"]
        assert k.shape == (2, 2, cin, cout), (j, k.shape)

"""Fused eval UNet / generator fast path vs the Flax module (exact math).

The fast path (nn/fused_unet.py) must reproduce ``UNet.apply(train=False)``
and ``Generator.apply(train=False)`` from the SAME param tree — BN folding is
exact, the Pallas kernel runs in interpret mode on CPU, and the unfused
fallback covers the blocks whose weights exceed the VMEM budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.config import GeneratorConfig
from learned_hologram_gan_tpu.models import (
    Generator,
    generator_apply_fused,
    make_generator_plan,
)
from learned_hologram_gan_tpu.nn.blocks import UNet
from learned_hologram_gan_tpu.nn.fused_unet import supported, unet_apply_fused

RNG = np.random.default_rng(23)


def _nontrivial_stats(variables):
    """BN running stats away from the (0, 1) init so folding is exercised."""
    return jax.tree.map(
        lambda a: jnp.asarray(0.5 + RNG.random(a.shape), a.dtype),
        variables["batch_stats"],
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_unet_fused_matches_module(dtype):
    unet = UNet(output_channels=6, base_features=4, levels=2, dtype=dtype)
    x = jnp.asarray(RNG.random((2, 16, 16, 4)).astype(np.float32), dtype)
    variables = unet.init(jax.random.key(0), x, True)
    stats = _nontrivial_stats(variables)
    want = np.asarray(
        unet.apply(
            {"params": variables["params"], "batch_stats": stats}, x, False
        ),
        np.float32,
    )
    got = np.asarray(
        unet_apply_fused(variables["params"], stats, x), np.float32
    )
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
    # sigmoid output: also pin the scale so tolerances are meaningful
    assert 0.0 <= got.min() and got.max() <= 1.0


def test_unet_fused_detects_fourier_tree():
    unet = UNet(output_channels=2, base_features=4, levels=2, fourier=True)
    x = jnp.zeros((1, 16, 16, 3))
    variables = unet.init(jax.random.key(0), x, True)
    assert not supported(variables["params"])


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_generator_fused_matches_module(dtype):
    cfg = GeneratorConfig(
        rows=32, cols=32, pad_size=16, unet_base_features=4, dtype=dtype
    )
    generator = Generator(cfg)
    plan = make_generator_plan(cfg)
    rgbd = jnp.asarray(RNG.random((2, 4, 32, 32)).astype(np.float32))
    variables = generator.init(jax.random.key(1), plan, rgbd, train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": _nontrivial_stats(variables),
    }
    want = np.asarray(
        generator.apply(variables, plan, rgbd, train=False), np.float32
    )
    got = np.asarray(
        generator_apply_fused(generator, variables, plan, rgbd), np.float32
    )
    # POH is a phase map; the double-phase acos amplifies rounding near
    # amp ~ 1, so bf16 gets a looser (but still sub-centiradian) gate.
    tol = 5e-5 if dtype == "float32" else 5e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_generator_fused_jits():
    cfg = GeneratorConfig(rows=16, cols=16, pad_size=8, unet_base_features=2)
    generator = Generator(cfg)
    plan = make_generator_plan(cfg)
    rgbd = jnp.zeros((1, 4, 16, 16))
    variables = generator.init(jax.random.key(0), plan, rgbd, train=False)

    @jax.jit
    def fwd(variables, plan, rgbd):
        return generator_apply_fused(generator, variables, plan, rgbd)

    out = fwd(dict(variables), plan, rgbd)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("levels", [2, 4])
def test_unet_polyphase_level0_matches_module(dtype, levels):
    """The space-to-depth level-0 path is EXACT math: same param tree, same
    output as the module apply (conv reassociation tolerance only)."""
    size = 16 if levels == 2 else 32
    unet = UNet(output_channels=6, base_features=4, levels=levels, dtype=dtype)
    x = jnp.asarray(RNG.random((2, size, size, 4)).astype(np.float32), dtype)
    variables = unet.init(jax.random.key(0), x, True)
    stats = _nontrivial_stats(variables)
    want = np.asarray(
        unet.apply(
            {"params": variables["params"], "batch_stats": stats}, x, False
        ),
        np.float32,
    )
    got = np.asarray(
        unet_apply_fused(variables["params"], stats, x, polyphase_level0=True),
        np.float32,
    )
    tol = 3e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_space_to_depth_roundtrip_and_order():
    from learned_hologram_gan_tpu.nn.fused_unet import (
        depth_to_space,
        space_to_depth,
    )

    x = jnp.asarray(RNG.random((1, 4, 6, 3)).astype(np.float32))
    y = space_to_depth(x)
    assert y.shape == (1, 2, 3, 12)
    # phase-major layout: channel (di*2+dj)*C + c holds x[:, 2i+di, 2j+dj, c]
    for di in (0, 1):
        for dj in (0, 1):
            np.testing.assert_array_equal(
                np.asarray(y[0, :, :, (di * 2 + dj) * 3 : (di * 2 + dj + 1) * 3]),
                np.asarray(x[0, di::2, dj::2, :]),
            )
    np.testing.assert_array_equal(np.asarray(depth_to_space(y)), np.asarray(x))

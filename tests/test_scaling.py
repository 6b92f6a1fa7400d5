"""Memory-scaling features: on-the-fly H (cache_h=False) and remat UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.config import GeneratorConfig, OpticsConfig
from learned_hologram_gan_tpu.models import Generator
from learned_hologram_gan_tpu.ops import asm

RNG = np.random.default_rng(41)


def _plans(cache_h):
    optics = OpticsConfig(rows=16, cols=16, pad_size=4,
                          filter_radius_coefficient=0.45)
    ds = np.linspace(-4e-4, 0.0, 6)[:-1]
    return asm.make_plan(optics, distances=ds, cache_h=cache_h)


def test_on_the_fly_h_matches_cached_everywhere():
    cached = _plans(True)
    otf = _plans(False)
    assert otf.H is None and otf.num_distances == 5

    amp = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))
    phs = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))

    # batch-multi propagation
    a = np.asarray(asm.propagate_batch_multi(cached, amp, phs))
    b = np.asarray(asm.propagate_batch_multi(otf, amp, phs))
    np.testing.assert_allclose(a, b, atol=1e-6)

    # all-distance focal stack
    g0 = asm.filter_ap2filtered_freq(cached, amp, phs)
    a1, p1 = asm.freq2ap_all_distances(cached, g0)
    a2, p2 = asm.freq2ap_all_distances(otf, g0)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)

    # random distances (same key -> same draw -> identical)
    key = jax.random.key(7)
    both = jnp.concatenate([g0, g0], axis=0)
    r1, _ = asm.freq2ap_random_distances(cached, both, key)
    r2, _ = asm.freq2ap_random_distances(otf, both, key)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)

    # fixed-distance primitives use distances[0]
    c1 = np.asarray(asm.propagate_ap2c_backward(cached, amp, phs))
    c2 = np.asarray(asm.propagate_ap2c_backward(otf, amp, phs))
    np.testing.assert_allclose(c1, c2, atol=1e-6)


@pytest.mark.slow
def test_remat_generator_same_output_and_grads():
    cfg = dict(rows=16, cols=16, pad_size=4, filter_radius_coefficient=0.45,
               unet_base_features=2, distance=1e-3)
    gen_plain = Generator(GeneratorConfig(**cfg))
    gen_remat = Generator(GeneratorConfig(**cfg, remat=True))
    plan = asm.make_plan(GeneratorConfig(**cfg).optics(), distances=[1e-3])
    rgbd = jnp.asarray(RNG.random((1, 4, 16, 16)).astype(np.float32))

    v = gen_plain.init(jax.random.key(0), plan, rgbd)

    def loss(gen, params):
        poh, _ = gen.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            plan, rgbd, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(poh**2)

    l1, g1 = jax.value_and_grad(lambda p: loss(gen_plain, p))(v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(gen_remat, p))(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sequential_batch_multi_matches_dense():
    optics = OpticsConfig(rows=16, cols=16, pad_size=4,
                          filter_radius_coefficient=0.45)
    ds = np.linspace(4e-4, 1e-3, 4)
    plan = asm.make_plan(optics, distances=ds, cache_h=False)
    amp = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))
    phs = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))
    dense = np.asarray(asm.propagate_batch_multi(plan, amp, phs))
    seq = np.asarray(asm.propagate_batch_multi(plan, amp, phs, sequential=True))
    np.testing.assert_allclose(seq, dense, atol=1e-6)


def test_good_fft_pads_are_smooth_and_sufficient():
    from learned_hologram_gan_tpu.utils.fftlen import good_fft_pads, is_smooth

    pr, pc = good_fft_pads(2176, 3840, 320)
    assert pr >= 320 and pc >= int(320 * 3840 / 2176)
    assert is_smooth(2176 + 2 * pr) and is_smooth(3840 + 2 * pc)
    # the override plumbs through OpticsConfig
    from learned_hologram_gan_tpu.config import OpticsConfig as OC

    o = OC(rows=2176, cols=3840, pad_size=pr, pad_cols_override=pc)
    assert o.padded_rows == 2176 + 2 * pr and o.padded_cols == 3840 + 2 * pc


@pytest.mark.slow
def test_watermelon_highres_levers_wiring():
    """remat + cache_h=False must flow from the trainer constructor into the
    generator config and both plans, and one GAN step must run (the CPU-
    scale stand-in for the 1080p single-chip demo in
    tools/highres_train_bench.py / BASELINE.md)."""
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.config import LossConfig
    from learned_hologram_gan_tpu.train import Watermelon, build_train_step

    trainer = Watermelon(
        filter_radius_coefficient=0.45, pad_size=4,
        distance_stack=np.linspace(-4e-4, 0.0, 5)[:-1],
        input_shape=(2, 4, 16, 16), use_gan=True, perceptual="none",
        unet_base_features=2, feature_d=2, remat=True, cache_h=False,
    )
    assert trainer.gen_config.remat is True
    assert trainer.gen_plan.H is None and trainer.multi_plan.H is None

    trainer._init_state(seed=0, lr_G=1e-3, lr_D=1e-3)
    step = build_train_step(
        trainer.generator, trainer.discriminator, trainer.tx_G, trainer.tx_D,
        LossConfig(perceptual="none"), use_gan=True,
        discriminator_train_ratio=1, discriminator_lambda=10.0,
    )
    rng = np.random.default_rng(0)
    batch = tuple(jnp.asarray(rng.random((2, c, 16, 16)).astype(np.float32))
                  for c in (4, 3, 3))
    _, metrics = step(trainer.state, batch, trainer.gen_plan, trainer.multi_plan)
    assert np.isfinite(float(metrics["G_loss"]))


@pytest.mark.slow
def test_highres_training_step_on_8device_mesh():
    """1080p-class full-GAN train step, data-parallel over the 8-virtual-
    device CPU mesh (round-1 verdict item #5's mesh half; the single-chip
    half is tools/highres_train_bench.py -> BASELINE.md).  remat +
    cache_h=False keep per-device memory at one padded plane set."""
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.config import LossConfig
    from learned_hologram_gan_tpu.parallel import (
        make_mesh,
        replicate_state,
        shard_batch,
    )
    from learned_hologram_gan_tpu.train import Watermelon, build_train_step

    rows, cols = 544, 960  # half-1080p per dim: keeps CPU runtime sane
    trainer = Watermelon(
        filter_radius_coefficient=0.45, pad_size=160,
        distance_stack=np.linspace(-4e-4, 0.0, 9)[:-1],
        input_shape=(8, 4, rows, cols), use_gan=True, perceptual="none",
        unet_base_features=4, feature_d=4, dtype="bfloat16",
        remat=True, cache_h=False,
    )
    trainer._init_state(seed=0, lr_G=1e-3, lr_D=1e-3)
    step = build_train_step(
        trainer.generator, trainer.discriminator, trainer.tx_G, trainer.tx_D,
        LossConfig(perceptual="none"), use_gan=True,
        discriminator_train_ratio=1, discriminator_lambda=10.0, remat=True,
    )
    mesh = make_mesh(8)
    state = replicate_state(trainer.state, mesh)
    rng = np.random.default_rng(0)
    batch = shard_batch(
        tuple(rng.random((8, c, rows, cols)).astype(np.float32)
              for c in (4, 3, 3)),
        mesh,
    )
    for _ in range(2):
        state, metrics = step(state, batch, trainer.gen_plan, trainer.multi_plan)
        assert np.isfinite(float(metrics["G_loss"]))

"""Distributed pencil FFT + sharded ASM propagation vs single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.config import OpticsConfig
from learned_hologram_gan_tpu.ops import asm
from learned_hologram_gan_tpu.parallel import make_mesh
from learned_hologram_gan_tpu.parallel.fft import (
    sharded_fft2,
    sharded_propagate_batch_multi,
)

RNG = np.random.default_rng(51)


def test_sharded_fft2_matches_local():
    mesh = make_mesh()
    x = jnp.asarray(
        (RNG.random((2, 3, 32, 16)) + 1j * RNG.random((2, 3, 32, 16))).astype(np.complex64)
    )
    got = np.asarray(sharded_fft2(x, mesh))
    want = np.asarray(jnp.fft.fft2(x))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_ifft2_roundtrip():
    mesh = make_mesh()
    x = jnp.asarray(
        (RNG.random((1, 3, 64, 32)) + 1j * RNG.random((1, 3, 64, 32))).astype(np.complex64)
    )
    rt = sharded_fft2(sharded_fft2(x, mesh), mesh, inverse=True)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), atol=1e-5)


def test_sharded_propagation_matches_single_device():
    # rows padded: 16 + 2*8 = 32, divisible by the 8-device mesh
    optics = OpticsConfig(rows=16, cols=16, pad_size=8,
                          filter_radius_coefficient=0.45)
    ds = np.linspace(4e-4, 1e-3, 3)
    plan = asm.make_plan(optics, distances=ds, cache_h=False)
    amp = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))
    phs = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))

    want = np.asarray(asm.propagate_batch_multi(plan, amp, phs))
    mesh = make_mesh()
    got = np.asarray(sharded_propagate_batch_multi(plan, amp, phs, mesh))
    assert got.shape == want.shape == (6, 3, 16, 16)
    np.testing.assert_allclose(got, want, atol=2e-4)


# ---------------------------------------------------------------------------
# asm.spatial_mesh context: every asm primitive spatially sharded
# ---------------------------------------------------------------------------


def _ctx_plan():
    optics = OpticsConfig(rows=16, cols=16, pad_size=8,
                          filter_radius_coefficient=0.45)
    return asm.make_plan(optics, distances=np.linspace(-4e-4, 0.0, 5)[:-1])


def test_spatial_mesh_context_primitives_match():
    """poh2freq / filter / freq2ap_random under asm.spatial_mesh must equal
    the unsharded path (the train step's spectral triple at 4K scale)."""
    plan = _ctx_plan()
    mesh = make_mesh()
    poh = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))
    amp = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))
    phs = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))
    key = jax.random.key(9)

    def triple():
        hat = asm.propagate_poh2freq_forward(plan, poh)
        tgt = asm.filter_ap2filtered_freq(plan, amp, phs)
        both = jnp.concatenate([hat, tgt], axis=0)
        a, p = asm.freq2ap_random_distances(plan, both, key)
        return a, p

    want_a, want_p = triple()
    with asm.spatial_mesh(mesh):
        got_a, got_p = triple()
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p), atol=2e-3)


def test_spatial_mesh_context_gradients_match():
    """jax.grad through the spatially-sharded propagation == unsharded grad
    (shard_map transposes to the same all_to_all pattern)."""
    plan = _ctx_plan()
    mesh = make_mesh()
    amp = jnp.asarray(RNG.random((1, 3, 16, 16)).astype(np.float32))
    phs = jnp.asarray(RNG.random((1, 3, 16, 16)).astype(np.float32))

    def loss(a):
        return jnp.sum(asm.propagate_batch_multi(plan, a, phs))

    want = np.asarray(jax.grad(loss)(amp))
    with asm.spatial_mesh(mesh):
        got = np.asarray(jax.grad(loss)(amp))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


@pytest.mark.slow
def test_spatial_mesh_train_step_matches_unsharded():
    """One full WGAN-GP train step traced under asm.spatial_mesh produces the
    same losses/params as the unsharded step — 4K training's sharding mode
    is numerically the same algorithm."""
    import optax

    from learned_hologram_gan_tpu.config import LossConfig
    from learned_hologram_gan_tpu.train import Watermelon, build_train_step
    from learned_hologram_gan_tpu.train.state import create_train_state

    def run(mesh_ctx):
        trainer = Watermelon(
            filter_radius_coefficient=0.45, pad_size=8,
            distance_stack=np.linspace(-4e-4, 0.0, 5)[:-1],
            input_shape=(2, 4, 16, 16), use_gan=True, perceptual="none",
            unet_base_features=2, feature_d=2,
        )
        # SGD, not Adam: Adam's early-step update is ~lr*sign(grad), so fp
        # reduction-order noise between the sharded and unsharded programs
        # would flip signs of near-zero grads into full +-lr deltas (same
        # rationale as test_multidevice_training_equivalence).
        tx = optax.sgd(1e-3)
        state = create_train_state(
            0, trainer.generator, trainer.discriminator, trainer.gen_plan,
            tx, tx, input_shape=(2, 4, 16, 16), vgg_params=None,
        )
        step = build_train_step(
            trainer.generator, trainer.discriminator, tx, tx,
            LossConfig(perceptual="none"), use_gan=True,
            discriminator_train_ratio=1, discriminator_lambda=10.0,
        )
        rng = np.random.default_rng(3)
        batch = tuple(jnp.asarray(rng.random((2, c, 16, 16)).astype(np.float32))
                      for c in (4, 3, 3))
        with mesh_ctx:
            state, metrics = step(state, batch, trainer.gen_plan,
                                  trainer.multi_plan)
        return {k: float(v) for k, v in metrics.items()}, jax.device_get(
            state.params_G)

    import contextlib

    want_m, want_p = run(contextlib.nullcontext())
    got_m, got_p = run(asm.spatial_mesh(make_mesh()))
    for k in want_m:
        np.testing.assert_allclose(got_m[k], want_m[k], rtol=2e-4, atol=2e-4,
                                   err_msg=f"metric {k}")
    # Param tolerance is loose in absolute terms: the double-phase encode's
    # acos has unbounded slope near |A|=1, so the pencil FFT's reduction-
    # order noise (~1e-6 on activations) legitimately amplifies into ~1e-4
    # gradient deltas on a few leaves.  The metric equality above (rtol 2e-4)
    # is the meaningful assertion.
    leaves_w = np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(want_p)])
    leaves_g = np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(got_p)])
    diff = np.abs(leaves_w - leaves_g)
    frac_close = np.mean(diff <= 5e-4 + 5e-3 * np.abs(leaves_w))
    assert frac_close >= 0.995, f"only {frac_close:.4%} of params match"
    assert diff.max() < 5e-3, f"max param delta {diff.max():.2e}" 


@pytest.mark.slow
def test_watermelon_spatial_mesh_training_runs():
    """Trainer-level wiring: Watermelon(spatial_mesh=mesh) must run a full
    train epoch (train step + padded-validation eval step) with every
    propagation FFT spatially sharded, finite losses out."""
    from learned_hologram_gan_tpu.train import Watermelon

    mesh = make_mesh()
    trainer = Watermelon(
        filter_radius_coefficient=0.45, pad_size=8,
        distance_stack=np.linspace(-4e-4, 0.0, 5)[:-1],
        input_shape=(2, 4, 16, 16), use_gan=True, perceptual="none",
        unet_base_features=2, feature_d=2, spatial_mesh=mesh,
    )
    rng = np.random.default_rng(2)
    batch = tuple(rng.random((2, c, 16, 16)).astype(np.float32)
                  for c in (4, 3, 3))
    hist = trainer.train(
        data_loader_train=lambda: iter([batch]),
        data_loader_val=lambda: iter([batch]),
        epoch_num=1, info_print_interval=1, checkpoint_iterval=10,
        discriminator_train_ratio=1, seed=7,
    )
    g = hist["train_losses_tensor"]["G_loss"][0]
    assert np.isfinite(g)


def test_spatial_context_rekeys_jit_cache_no_silent_reuse():
    """The round-2 footgun (VERDICT #5): a function compiled OUTSIDE
    asm.spatial_mesh, then called INSIDE it, must not silently reuse the
    unsharded executable.  The ambient context is resolved into the plan's
    treedef at flatten time (asm._plan_flatten), so jit keys a different
    cache entry per effective spatial mode — provoking the footgun now
    yields a retrace into the sharded program with identical values."""
    optics = OpticsConfig(rows=16, cols=16, pad_size=8,
                          filter_radius_coefficient=0.45)
    plan = asm.make_plan(optics, distances=[1e-3])
    amp = jnp.asarray(RNG.random((1, 3, 16, 16)).astype(np.float32))
    phs = jnp.asarray(RNG.random((1, 3, 16, 16)).astype(np.float32))

    traces = []

    @jax.jit
    def f(p, a, b):
        traces.append(1)  # trace-time side effect: counts (re)traces
        return asm.propagate(p, a, b)

    out_plain = np.asarray(f(plan, amp, phs))
    assert len(traces) == 1
    f(plan, amp, phs)
    assert len(traces) == 1  # warm cache outside the context

    mesh = make_mesh()
    with asm.spatial_mesh(mesh):
        out_sharded = np.asarray(f(plan, amp, phs))
    assert len(traces) == 2, "stale unsharded executable was silently reused"
    np.testing.assert_allclose(out_sharded, out_plain, atol=1e-4)

    # leaving the context returns to the original cache entry (no retrace)
    f(plan, amp, phs)
    assert len(traces) == 2


def test_plan_with_spatial_explicit_binding_matches_and_rekeys():
    """plan.with_spatial(mesh): the explicit, ambient-free binding — values
    match the unsharded program and the executable is cache-keyed by the
    binding (a bound plan never collides with an unbound one)."""
    optics = OpticsConfig(rows=16, cols=16, pad_size=8,
                          filter_radius_coefficient=0.45)
    plan = asm.make_plan(optics, distances=[1e-3])
    amp = jnp.asarray(RNG.random((1, 3, 16, 16)).astype(np.float32))
    phs = jnp.asarray(RNG.random((1, 3, 16, 16)).astype(np.float32))

    traces = []

    @jax.jit
    def f(p, a, b):
        traces.append(1)
        return asm.propagate(p, a, b)

    want = np.asarray(f(plan, amp, phs))
    mesh = make_mesh()
    got = np.asarray(f(plan.with_spatial(mesh), amp, phs))
    assert len(traces) == 2
    np.testing.assert_allclose(got, want, atol=1e-4)

"""Pallas four-step FFT (ops/pallas/spectral.py): parity, gradients, wiring.

Runs in interpret mode on the CPU test mesh — same kernel code the TPU
compiles (tiling differs only via _pick_tile, which is shape-driven).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.ops import asm
from learned_hologram_gan_tpu.ops.pallas import spectral

RNG = np.random.default_rng(11)


def _rand_c64(shape):
    return (RNG.random(shape) + 1j * RNG.random(shape)).astype(np.complex64)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 256, 128),   # power-of-two, aligned tiles
        (1, 512, 512),
        (3, 192, 384),   # non-square, 192 = 12*16
        (1, 160, 96),    # small unaligned tiles
    ],
)
def test_fft2_pallas_matches_numpy(shape):
    x = _rand_c64(shape)
    want = np.fft.fft2(x).astype(np.complex64)
    got = np.asarray(spectral.fft2_pallas(jnp.asarray(x)))
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 5e-5

    wanti = np.fft.ifft2(x).astype(np.complex64)
    goti = np.asarray(spectral.ifft2_pallas(jnp.asarray(x)))
    assert np.max(np.abs(goti - wanti)) / np.max(np.abs(wanti)) < 5e-5


def test_fft2_pallas_roundtrip():
    x = _rand_c64((2, 128, 256))
    got = np.asarray(spectral.ifft2_pallas(spectral.fft2_pallas(jnp.asarray(x))))
    np.testing.assert_allclose(got, x, atol=5e-5)


def test_prime_shape_falls_back_to_jnp():
    x = _rand_c64((1, 127, 127))  # prime axis: no factor pair
    want = np.fft.fft2(x).astype(np.complex64)
    got = np.asarray(spectral.fft2_pallas(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gradients_match_jnp_fft():
    """custom_vjp transpose rule (fft2^T == fft2): grads must equal the
    built-in jnp.fft gradients on a real-valued loss."""
    xr = jnp.asarray(RNG.random((1, 64, 128)).astype(np.float32))
    xi = jnp.asarray(RNG.random((1, 64, 128)).astype(np.float32))
    t = jnp.asarray(_rand_c64((1, 64, 128)))

    def loss_pallas(xr, xi):
        y = spectral.ifft2_pallas(spectral.fft2_pallas(jax.lax.complex(xr, xi)) * 2.0)
        return jnp.sum(jnp.abs(y - t) ** 2)

    def loss_ref(xr, xi):
        y = jnp.fft.ifft2(jnp.fft.fft2(jax.lax.complex(xr, xi)) * 2.0)
        return jnp.sum(jnp.abs(y - t) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1))(xr, xi)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(xr, xi)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_precision_modes_agree():
    x = jnp.asarray(_rand_c64((1, 256, 256)))
    spectral.set_precision("highest")
    try:
        hi = np.asarray(spectral.fft2_pallas(x))
    finally:
        spectral.set_precision("split3")
    lo = np.asarray(spectral.fft2_pallas(x))
    assert np.max(np.abs(hi - lo)) / np.max(np.abs(hi)) < 2e-5


def test_asm_backend_pallas_matches_xla():
    """propagate() through backend='pallas' must match backend='xla'."""
    from learned_hologram_gan_tpu.config import OpticsConfig

    optics = OpticsConfig(rows=48, cols=48, pad_size=8,
                          filter_radius_coefficient=0.45)
    plan = asm.make_plan(optics, distances=[1e-3])
    amp = jnp.asarray(RNG.random((2, 3, 48, 48)).astype(np.float32))
    phs = jnp.asarray(RNG.random((2, 3, 48, 48)).astype(np.float32))

    prev = asm.get_fft_backend()
    try:
        asm.set_fft_backend("xla")
        want = np.asarray(asm.propagate(plan, amp, phs))
        asm.set_fft_backend("pallas")
        got = np.asarray(asm.propagate(plan, amp, phs))
    finally:
        asm.set_fft_backend(prev)
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# Fused propagation path (spectral.propagate_planes via asm._fused_apply)
# ---------------------------------------------------------------------------


def _tiny_plan():
    from learned_hologram_gan_tpu.config import OpticsConfig

    optics = OpticsConfig(rows=24, cols=32, pad_size=4,
                          filter_radius_coefficient=0.45)
    return asm.make_plan(optics, distances=np.linspace(-4e-4, 0.0, 5)[:-1])


def _on_backend(backend, fn):
    prev = asm.get_fft_backend()
    try:
        asm.set_fft_backend(backend)
        return fn()
    finally:
        asm.set_fft_backend(prev)


@pytest.mark.parametrize("prim", ["batch_multi", "ap2c", "freq2ap_all",
                                  "freq2ap_random", "poh2ap", "propagate_b1"])
def test_fused_matches_composable(prim):
    """Every fused primitive must match the composable XLA path (values)."""
    plan = _tiny_plan()
    rp, cp = plan.padded_rows, plan.padded_cols
    rng = np.random.default_rng(5)
    amp = jnp.asarray(rng.random((2, 3, 24, 32)).astype(np.float32))
    phs = jnp.asarray(rng.random((2, 3, 24, 32)).astype(np.float32))
    g0 = jnp.asarray((rng.random((4, 3, rp, cp))
                      + 1j * rng.random((4, 3, rp, cp))).astype(np.complex64))
    key = jax.random.key(3)

    fns = {
        "batch_multi": lambda: asm.propagate_batch_multi(plan, amp, phs),
        "ap2c": lambda: jnp.abs(asm.propagate_ap2c_backward(plan, amp, phs)),
        "freq2ap_all": lambda: asm.freq2ap_all_distances(plan, g0[:2])[0],
        "freq2ap_random": lambda: asm.freq2ap_random_distances(plan, g0, key)[0],
        "poh2ap": lambda: asm.propagate_poh2ap_forward(plan, phs)[0],
        "propagate_b1": lambda: asm.propagate(plan, amp[:1], phs[:1]),
    }
    want = np.asarray(_on_backend("xla", fns[prim]))
    got = np.asarray(_on_backend("pallas", fns[prim]))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_fused_hat_target_matches_composable():
    """Two-H hat/target path: fused Pallas == composable XLA (values + grad)."""
    from learned_hologram_gan_tpu.config import OpticsConfig

    optics = OpticsConfig(rows=24, cols=32, pad_size=4,
                          filter_radius_coefficient=0.45)
    multi_plan = asm.make_plan(optics, distances=np.linspace(-4e-4, 0.0, 5)[:-1])
    gen_plan = asm.make_plan(optics, distances=[1e-3])
    rng = np.random.default_rng(6)
    poh = jnp.asarray(rng.random((2, 3, 24, 32)).astype(np.float32)) * 2 * np.pi
    amp = jnp.asarray(rng.random((2, 3, 24, 32)).astype(np.float32))
    phs = jnp.asarray(rng.random((2, 3, 24, 32)).astype(np.float32))
    key = jax.random.key(9)

    def run():
        return asm.hat_target_random_distances(
            gen_plan, multi_plan, poh, amp, phs, key
        )

    want = _on_backend("xla", run)
    got = _on_backend("pallas", run)
    for g, w in zip(got[:2], want[:2]):  # amplitudes
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=5e-5)

    def loss(p):
        ha, ta, _, _ = asm.hat_target_random_distances(
            gen_plan, multi_plan, p, amp, phs, key
        )
        return jnp.sum(ha**2) + jnp.sum(ta**2)

    gw = np.asarray(_on_backend("xla", lambda: jax.grad(loss)(poh)))
    gg = np.asarray(_on_backend("pallas", lambda: jax.grad(loss)(poh)))
    np.testing.assert_allclose(gg, gw, rtol=2e-4, atol=2e-4)


def test_fused_gradients_match_composable():
    """The custom-VJP (conjugate-transposed pipeline with crop->embed) must
    reproduce the composable path's gradients."""
    plan = _tiny_plan()
    rng = np.random.default_rng(5)
    amp = jnp.asarray(rng.random((2, 3, 24, 32)).astype(np.float32))
    phs = jnp.asarray(rng.random((2, 3, 24, 32)).astype(np.float32))

    def loss(a):
        recon = asm.propagate_batch_multi(plan, a, phs)
        c = asm.propagate_ap2c_backward(plan, a, phs)
        return jnp.sum(recon ** 2) + jnp.sum(jnp.abs(c) ** 2)

    gw = np.asarray(_on_backend("xla", lambda: jax.grad(loss)(amp)))
    gg = np.asarray(_on_backend("pallas", lambda: jax.grad(loss)(amp)))
    np.testing.assert_allclose(gg, gw, rtol=2e-4, atol=2e-4)


def test_fused_path_reusable_across_traces():
    """Regression: _crop_dft_presplit is lru_cached; under an outer jit trace
    its weight splits must be concrete numpy (ml_dtypes bf16), NOT jnp ops —
    omnistaging would stage those, the cache would capture per-trace tracers,
    and the *second* jitted program touching the fused path would die with
    UnexpectedTracerError (exactly the train-then-eval sequence on TPU)."""
    plan = _tiny_plan()
    rng = np.random.default_rng(7)
    amp = jnp.asarray(rng.random((2, 3, 24, 32)).astype(np.float32))
    phs = jnp.asarray(rng.random((2, 3, 24, 32)).astype(np.float32))

    spectral._crop_dft_presplit.cache_clear()
    spectral._stage_consts.cache_clear()

    @jax.jit
    def first(plan, a, p):
        return asm.propagate_batch_multi(plan, a, p)

    @jax.jit
    def second(plan, a, p):  # distinct trace, same cached weights
        return asm.propagate_batch_multi(plan, a, p) * 2.0

    def run():
        r1 = first(plan, amp, phs)
        r2 = second(plan, amp, phs)
        return r1, r2

    r1, r2 = _on_backend("pallas", run)
    np.testing.assert_allclose(np.asarray(r2), 2.0 * np.asarray(r1), rtol=1e-6)
    for w in spectral._crop_dft_presplit.cache.values() if hasattr(
            spectral._crop_dft_presplit, "cache") else []:
        assert isinstance(w, tuple)

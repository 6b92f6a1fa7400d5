"""Propagator invariants + golden parity vs an independent numpy ASM.

The numpy oracle below re-derives the band-limited ASM from the published
formula (pad -> FFT2 -> multiply H = exp(-2*pi*i*z*w) and circular mask ->
iFFT2 -> crop) — it shares no code with either implementation and pins the
numerics the reference's torch pipeline produces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.config import OpticsConfig
from learned_hologram_gan_tpu.ops import asm

RNG = np.random.default_rng(0)
WL = (638e-9, 520e-9, 450e-9)


def small_optics(rows=32, cols=32, pad=8, frc=0.45):
    return OpticsConfig(
        rows=rows, cols=cols, pad_size=pad, filter_radius_coefficient=frc,
        pixel_pitch=3.74e-6, wavelengths=WL,
    )


def numpy_asm(amp, phs, z, optics: OpticsConfig, apply_mask=True, backward=False):
    """Independent float64 numpy oracle for one propagation."""
    pr, pc = optics.pad_rows, optics.pad_cols
    rp, cp = optics.padded_rows, optics.padded_cols
    g = amp.astype(np.complex128) * np.exp(1j * phs.astype(np.float64))
    g = np.pad(g, [(0, 0)] * (g.ndim - 2) + [(pr, pr), (pc, pc)])
    G = np.fft.fft2(g)
    fx = np.fft.fftfreq(rp, optics.pixel_pitch)[:, None]
    fy = np.fft.fftfreq(cp, optics.pixel_pitch)[None, :]
    wl = np.asarray(optics.wavelengths)[:, None, None]
    w = np.sqrt(np.clip(1.0 / wl**2 - (fx**2 + fy**2), 0.0, None))
    H = np.exp(-2j * np.pi * z * w)
    if backward:
        H = 1.0 / H
    G = G * H
    if apply_mask:
        shorter = min(rp, cp)
        u = np.fft.fftfreq(rp)[:, None]
        v = np.fft.fftfreq(cp)[None, :]
        d = np.sqrt(u**2 + v**2) * shorter
        mask = np.where(d > shorter * optics.filter_radius_coefficient, 0.0, 1.0)
        G = G * mask
    gz = np.fft.ifft2(G)
    if pr or pc:
        gz = gz[..., pr:-pr, pc:-pc] if pc else gz[..., pr:-pr, :]
    return gz


def test_propagate_matches_numpy_oracle():
    optics = small_optics()
    plan = asm.make_plan(optics)
    amp = RNG.random((1, 3, 32, 32)).astype(np.float32)
    phs = (RNG.random((1, 3, 32, 32)).astype(np.float32) * 2 * np.pi)
    z = 1e-3
    got = np.asarray(asm.propagate(plan, jnp.asarray(amp), jnp.asarray(phs), jnp.asarray([z])))
    want = np.abs(numpy_asm(amp[0], phs[0], z, optics))[None]
    # complex64 FFT vs float64 oracle: stay well inside the 1e-3 parity target.
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)


def test_backward_is_conj_and_matches_division():
    optics = small_optics(pad=0)
    plan = asm.make_plan(optics, distances=[1e-3])
    amp = RNG.random((2, 3, 32, 32)).astype(np.float32)
    phs = RNG.random((2, 3, 32, 32)).astype(np.float32)
    got = np.asarray(asm.propagate_ap2c_backward(plan, jnp.asarray(amp), jnp.asarray(phs)))
    want = numpy_asm(amp, phs, 1e-3, optics, apply_mask=False, backward=True)
    # theta = -2*pi*z*w is ~1.2e4 rad at z=1mm: float32 phase-wrap error in H
    # is ~1e-3 (identical in the torch reference — see test_parity_torch for
    # the tight torch-vs-us comparison); the float64 oracle differs by that.
    np.testing.assert_allclose(got, want, atol=4e-3, rtol=0)


def test_round_trip_forward_backward_identity():
    """forward(z) then backward(z) with no mask/crop is the identity."""
    optics = small_optics(pad=0)
    plan = asm.make_plan(optics, distances=[7e-4])
    g0 = (RNG.random((1, 3, 32, 32)) + 1j * RNG.random((1, 3, 32, 32))).astype(np.complex64)
    G = jnp.fft.fft2(jnp.asarray(g0))
    h = plan.H[0]
    g_rt = jnp.fft.ifft2(jnp.fft.fft2(jnp.fft.ifft2(G * h)) * jnp.conj(h))
    np.testing.assert_allclose(np.asarray(g_rt), g0, atol=2e-5)


def test_energy_conservation_unmasked():
    """|H| == 1 everywhere -> propagation preserves total energy (Parseval)."""
    optics = small_optics(pad=0)
    plan = asm.make_plan(optics, distances=[5e-4])
    g0 = (RNG.random((3, 32, 32)) + 1j * RNG.random((3, 32, 32))).astype(np.complex64)
    gz = jnp.fft.ifft2(jnp.fft.fft2(jnp.asarray(g0)) * plan.H[0])
    e0 = np.sum(np.abs(g0) ** 2)
    ez = np.sum(np.abs(np.asarray(gz)) ** 2)
    np.testing.assert_allclose(ez, e0, rtol=1e-5)


def test_plane_wave_invariant():
    """A uniform field stays uniform: only the DC bin is populated."""
    optics = small_optics(pad=0)
    plan = asm.make_plan(optics)
    amp = jnp.ones((1, 3, 32, 32))
    phs = jnp.zeros((1, 3, 32, 32))
    out = np.asarray(asm.propagate(plan, amp, phs, jnp.asarray([1e-3])))
    np.testing.assert_allclose(out, np.ones_like(out), atol=1e-5)


def test_propagate_broadcasts_single_field_over_distances():
    """Base-class semantics: one field x D distances (reference test usage)."""
    optics = small_optics()
    plan = asm.make_plan(optics)
    amp = jnp.ones((1, 3, 32, 32))
    phs = jnp.asarray(RNG.random((1, 3, 32, 32)).astype(np.float32))
    ds = jnp.linspace(-1e-3, 2.5e-3, 4)
    out = asm.propagate(plan, amp, phs, ds)
    assert out.shape == (4, 3, 32, 32)


def test_batch_multi_shape_and_value():
    optics = small_optics(pad=4)
    plan = asm.make_plan(optics)
    b, d = 2, 3
    amp = jnp.asarray(RNG.random((b, 3, 32, 32)).astype(np.float32))
    phs = jnp.asarray(RNG.random((b, 3, 32, 32)).astype(np.float32))
    ds = jnp.linspace(4e-4, 1e-3, d)
    out = asm.propagate_batch_multi(plan, amp, phs, ds)
    assert out.shape == (b * d, 3, 32, 32)
    # Row b*D + j must equal single-distance propagation of sample b at ds[j].
    single = asm.propagate(plan, amp[1:2], phs[1:2], ds[2:3])
    np.testing.assert_allclose(np.asarray(out[1 * d + 2]), np.asarray(single[0]), atol=1e-5)


def test_poh2freq_and_poh2ap_consistent():
    optics = small_optics(pad=8)
    plan = asm.make_plan(optics, distances=[1e-3])
    poh = jnp.asarray(RNG.random((2, 3, 32, 32)).astype(np.float32) * 2 * np.pi)
    freq = asm.propagate_poh2freq_forward(plan, poh)
    assert freq.shape == (2, 3, optics.padded_rows, optics.padded_cols)
    amp1, phs1 = asm.propagate_poh2ap_forward(plan, poh)
    gz = asm.crop(plan, jnp.fft.ifft2(freq))
    np.testing.assert_allclose(np.asarray(jnp.abs(gz)), np.asarray(amp1), atol=1e-6)


def test_spectrum_loss_zero_when_filter_wide_open():
    optics = small_optics(pad=0, frc=0.5)
    plan = asm.make_plan(optics, distances=[1e-3])
    poh = jnp.asarray(RNG.random((1, 3, 32, 32)).astype(np.float32))
    # A huge radius makes sigmoid ~1 everywhere -> no filtered-out energy.
    _, _, loss = asm.propagate_poh2ap_forward_with_spectrum_loss(plan, poh, 100.0)
    assert abs(float(loss)) < 1e-4
    # A tight filter removes energy -> positive loss.
    _, _, loss2 = asm.propagate_poh2ap_forward_with_spectrum_loss(plan, poh, 0.05)
    assert float(loss2) > float(loss)


def test_filter_ap2filtered_freq_scales_phase_2pi():
    optics = small_optics(pad=0)
    plan = asm.make_plan(optics, distances=[1e-3])
    amp = jnp.asarray(RNG.random((1, 3, 32, 32)).astype(np.float32))
    phs01 = jnp.asarray(RNG.random((1, 3, 32, 32)).astype(np.float32))
    got = asm.filter_ap2filtered_freq(plan, amp, phs01)
    want = jnp.fft.fft2(asm.field(amp, 2 * np.pi * phs01)) * plan.mask
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_freq2ap_all_distances_layout():
    optics = small_optics(pad=0)
    ds = np.linspace(-4e-4, 0.0, 5)[:-1]
    plan = asm.make_plan(optics, distances=ds)
    g0 = jnp.asarray((RNG.random((2, 3, 32, 32)) + 1j * RNG.random((2, 3, 32, 32))).astype(np.complex64))
    amp, phs = asm.freq2ap_all_distances(plan, g0)
    assert amp.shape == (2 * 4, 3, 32, 32) and phs.shape == amp.shape
    # Block d of sample 0 equals manual single-distance apply.
    gz = jnp.fft.ifft2(g0[0] * plan.H[3] * plan.mask)
    np.testing.assert_allclose(np.asarray(amp[3]), np.abs(np.asarray(gz)), atol=1e-5)
    # sequential (lax.map, one plane in flight — the 1080p/4K eval lever)
    # matches the dense stack bit-for-layout
    amp_s, phs_s = asm.freq2ap_all_distances(plan, g0, sequential=True)
    np.testing.assert_allclose(np.asarray(amp_s), np.asarray(amp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(phs_s), np.asarray(phs), atol=1e-5)


def test_freq2amp_at_matches_cached_stack_and_is_retrace_free():
    """Arbitrary-distance amp recon == the cached-stack primitive; the
    distance VALUES are traced (one executable serves any depth sweep)."""
    optics = small_optics(pad=0)
    ds = np.linspace(-4e-4, 0.0, 5)[:-1]
    plan = asm.make_plan(optics, distances=ds)
    g0 = jnp.asarray(
        (RNG.random((2, 3, 32, 32)) + 1j * RNG.random((2, 3, 32, 32))
         ).astype(np.complex64))
    want, _ = asm.freq2ap_all_distances(plan, g0)
    got = asm.freq2amp_at(plan, g0, jnp.asarray(ds, jnp.float32))
    assert got.shape == (2, 4, 3, 32, 32)
    np.testing.assert_allclose(
        np.asarray(got).reshape(8, 3, 32, 32), np.asarray(want), atol=1e-5)

    fn = jax.jit(asm.freq2amp_at)
    a = fn(plan, g0, jnp.asarray([1e-4, 2e-4], jnp.float32))
    b = fn(plan, g0, jnp.asarray([3e-4, -1e-4], jnp.float32))
    assert a.shape == b.shape == (2, 2, 3, 32, 32)
    assert fn._cache_size() == 1  # same D => same executable


def test_freq2ap_random_distances_pairs_hat_with_target():
    optics = small_optics(pad=0)
    ds = np.linspace(-4e-4, 0.0, 9)[:-1]
    plan = asm.make_plan(optics, distances=ds)
    b = 4
    half = jnp.asarray((RNG.random((b, 3, 32, 32)) + 1j * RNG.random((b, 3, 32, 32))).astype(np.complex64))
    g0 = jnp.concatenate([half, half], axis=0)  # hat == target
    amp, phs = asm.freq2ap_random_distances(plan, g0, jax.random.key(3))
    assert amp.shape == (2 * b, 3, 32, 32)
    # Same spectrum + same per-sample distance -> identical halves.
    np.testing.assert_allclose(np.asarray(amp[:b]), np.asarray(amp[b:]), atol=1e-6)


def test_hat_target_random_distances_matches_composed_path():
    """Two-H fused hat/target == poh2freq + filter + concat + freq2ap_random.

    The fused variant folds H(z_fixed)*H(z_d) into H(z_fixed + z_d); the
    2*pi*z*w phase is O(1e4) rad in f32, so re-rounding it moves the outputs
    by O(1e-3) relative — the tolerance below pins that documented bound.
    """
    optics = small_optics()
    ds = np.linspace(-4e-4, 0.0, 9)[:-1]
    gen_plan = asm.make_plan(optics, distances=[1e-3])
    multi_plan = asm.make_plan(optics, distances=ds)
    b = 4
    poh = jnp.asarray(RNG.random((b, 3, 32, 32)).astype(np.float32)) * 2 * np.pi
    t_amp = jnp.asarray(RNG.random((b, 3, 32, 32)).astype(np.float32))
    t_phs = jnp.asarray(RNG.random((b, 3, 32, 32)).astype(np.float32))
    key = jax.random.key(11)

    hat_freq = asm.propagate_poh2freq_forward(gen_plan, poh)
    target_freq = asm.filter_ap2filtered_freq(multi_plan, t_amp, t_phs)
    both = jnp.concatenate([hat_freq, target_freq], axis=0)
    amps, phss = asm.freq2ap_random_distances(multi_plan, both, key)

    h_amp, tg_amp, h_phs, tg_phs = asm.hat_target_random_distances(
        gen_plan, multi_plan, poh, t_amp, t_phs, key
    )
    # compare complex fields (phase alone is unstable where amp ~ 0)
    def cfield(a, p):
        return np.asarray(a) * np.exp(1j * np.asarray(p))

    scale = float(np.abs(cfield(amps, phss)).max())
    np.testing.assert_allclose(
        cfield(h_amp, h_phs), cfield(amps[:b], phss[:b]), atol=3e-3 * scale
    )
    np.testing.assert_allclose(
        cfield(tg_amp, tg_phs), cfield(amps[b:], phss[b:]), atol=3e-3 * scale
    )

    # differentiable: the train step backprops through the hat branch
    def loss(p):
        ha, _, _, _ = asm.hat_target_random_distances(
            gen_plan, multi_plan, p, t_amp, t_phs, key
        )
        return jnp.sum(ha**2)

    g = jax.grad(loss)(poh)
    assert np.isfinite(np.asarray(g)).all()


def test_ap2ap_layout_and_backward():
    optics = small_optics(pad=0)
    plan = asm.make_plan(optics, distances=[1e-3])
    amp = RNG.random((2, 3, 32, 32)).astype(np.float32) + 0.5
    phs = RNG.random((2, 3, 32, 32)).astype(np.float32)
    # interleave to [a_r, p_r, a_g, p_g, a_b, p_b]
    inter = np.stack([amp, phs], axis=2).reshape(2, 6, 32, 32)
    out = asm.propagate_ap2ap(plan, jnp.asarray(inter), backward=True)
    assert out.shape == (2, 6, 32, 32)
    want = numpy_asm(amp, phs, 1e-3, optics, apply_mask=False, backward=True)
    # float32 phase-wrap error in H vs the float64 oracle (see above); phases
    # compared as phasors (angle() wraps at +-pi).
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.abs(want), atol=4e-3)
    d = np.abs(np.exp(1j * np.asarray(out[:, 3:])) - np.exp(1j * np.angle(want)))
    mag = np.abs(want)
    assert np.max(d[mag > 1e-2]) <= 2e-2


def test_propagate_is_jittable_and_differentiable():
    optics = small_optics(pad=4)
    plan = asm.make_plan(optics, distances=[1e-3])

    @jax.jit
    def loss_fn(poh):
        a, p, sl = asm.propagate_poh2ap_forward_with_spectrum_loss(plan, poh, 0.45)
        return jnp.mean(a) + 1e-5 * sl

    poh = jnp.asarray(RNG.random((1, 3, 32, 32)).astype(np.float32))
    g = jax.grad(loss_fn)(poh)
    assert g.shape == poh.shape
    assert np.isfinite(np.asarray(g)).all()

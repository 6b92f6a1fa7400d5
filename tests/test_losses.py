"""Loss-function unit tests against independent numpy math."""

import jax.numpy as jnp
import numpy as np

from learned_hologram_gan_tpu import losses

RNG = np.random.default_rng(1)


def _rand(*shape):
    return RNG.random(shape).astype(np.float32)


def test_total_variation_matches_numpy():
    x = _rand(2, 3, 8, 8)
    got = float(losses.total_variation(jnp.asarray(x)))
    want = np.mean(np.abs(np.diff(x, axis=3))) + np.mean(np.abs(np.diff(x, axis=2)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_total_variation_for_poh_stride2():
    x = _rand(1, 3, 8, 8)
    got = float(losses.total_variation_for_poh(jnp.asarray(x)))
    want = np.mean(np.abs(x[:, :, :, 2:] - x[:, :, :, :-2])) + np.mean(
        np.abs(x[:, :, 2:, :] - x[:, :, :-2, :])
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_total_variation_loss_is_abs_difference():
    a, b = _rand(1, 3, 8, 8), _rand(1, 3, 8, 8)
    got = float(losses.total_variation_loss(jnp.asarray(a), jnp.asarray(b)))
    want = abs(
        float(losses.total_variation(jnp.asarray(a)))
        - float(losses.total_variation(jnp.asarray(b)))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_amp_loss_decomposition():
    a, b = _rand(2, 3, 8, 8), _rand(2, 3, 8, 8)
    got = float(losses.amp_loss(jnp.asarray(a), jnp.asarray(b), alpha=0.5))
    want = np.mean((a - b) ** 2) + 0.5 * float(
        losses.total_variation_loss(jnp.asarray(a), jnp.asarray(b))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_amp_phs_loss_on_identical_inputs_is_zero():
    amp, phs = _rand(1, 3, 8, 8), _rand(1, 3, 8, 8) * 2 * np.pi
    got = float(
        losses.amp_phs_loss(
            jnp.asarray(amp), jnp.asarray(phs), jnp.asarray(amp), jnp.asarray(phs)
        )
    )
    assert got < 1e-10


def test_focal_losses_zero_at_equality_and_positive_otherwise():
    p, q = _rand(1, 3, 8, 8) * 6.28, _rand(1, 3, 8, 8) * 6.28
    for fn in (
        losses.focal_sincos_phase_gradient_loss,
        losses.phase_sincos_gradient_loss,
        losses.focal_sincos_phase_loss,
        losses.plain_phase_loss,
    ):
        assert float(fn(jnp.asarray(p), jnp.asarray(q))) > 0
    # equality -> all phase losses vanish (focal variants hit 0/0 -> nan-safe
    # is not required by the reference; only check the non-focal ones).
    assert float(losses.plain_phase_loss(jnp.asarray(p), jnp.asarray(p))) == 0
    assert float(losses.phase_sincos_gradient_loss(jnp.asarray(p), jnp.asarray(p))) == 0


def test_focal_weighting_reduces_loss_vs_unweighted():
    """Focal weight w = d/max(d) <= 1 -> weighted mean <= unweighted mean."""
    p, q = _rand(1, 3, 16, 16) * 6.28, _rand(1, 3, 16, 16) * 6.28
    focal = float(losses.focal_sincos_phase_gradient_loss(jnp.asarray(p), jnp.asarray(q)))
    plain = float(losses.phase_sincos_gradient_loss(jnp.asarray(p), jnp.asarray(q)))
    assert focal <= plain


def test_psnr_known_value():
    a = np.zeros((1, 3, 8, 8), dtype=np.float32)
    b = np.full((1, 3, 8, 8), 0.5, dtype=np.float32)
    b[0, 0, 0, 0] = 1.0
    a[0, 0, 0, 1] = 0.0
    got = float(losses.psnr(jnp.asarray(b), jnp.asarray(a)))
    rng = 1.0  # max over both - min over both
    mse = np.mean((b - a) ** 2)
    want = 10 * np.log10(rng**2 / mse)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ssim_self_is_one_and_noise_lowers_it():
    x = _rand(2, 3, 32, 32)
    one = float(losses.ssim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(one, 1.0, atol=1e-5)
    noisy = x + RNG.normal(0, 0.2, x.shape).astype(np.float32)
    less = float(losses.ssim(jnp.asarray(noisy), jnp.asarray(x)))
    assert less < 0.95


def test_perceptual_loss_random_fallback_runs():
    params = losses.init_vgg19_params(0)
    a, b = jnp.asarray(_rand(1, 3, 32, 32)), jnp.asarray(_rand(1, 3, 32, 32))
    l_ab = float(losses.perceptual_loss(params, a, b))
    l_aa = float(losses.perceptual_loss(params, a, a))
    assert l_ab > 0 and l_aa < 1e-8


def test_metrics_finite_bf16_and_offset_inputs():
    """Regression: SSIM went sporadically inf during 1080p validation.

    Root cause: the moment-map blur convs ran at TPU default precision
    (bf16 passes), so sig = E[x^2] - mu^2 carried cancellation error larger
    than the c2 stabilizer and `den` could cross zero at a pixel.  The blur
    now pins Precision.HIGHEST and both metrics compute in f32 regardless
    of input dtype.  Offset inputs (mean >> std) maximize the cancellation;
    bf16 inputs exercise the cast path.
    """
    base = RNG.normal(0, 1e-3, (1, 6, 64, 64)).astype(np.float32) + 7.5
    other = base + RNG.normal(0, 1e-4, base.shape).astype(np.float32)
    s = float(losses.ssim(jnp.asarray(base), jnp.asarray(other)))
    p = float(losses.psnr(jnp.asarray(base), jnp.asarray(other)))
    assert np.isfinite(s) and 0.0 < s <= 1.0, s
    assert np.isfinite(p), p
    # bf16 inputs (cast path): noise above the bf16 quantum at this mean
    b16 = jnp.asarray(base, jnp.bfloat16)
    o16 = jnp.asarray(base + RNG.normal(0, 0.25, base.shape).astype(np.float32),
                      jnp.bfloat16)
    s16 = float(losses.ssim(b16, o16))
    assert np.isfinite(s16) and 0.0 < s16 <= 1.0, s16
    assert np.isfinite(float(losses.psnr(b16, o16)))
    # bit-identical inputs: SSIM exactly 1 (not 0/0).  (PSNR there is 0/0 —
    # ill-defined with a data-derived range, same as torchmetrics.)
    assert float(losses.ssim(b16, b16)) == 1.0


def test_ssim_matches_f64_numpy_oracle():
    """Direct per-channel float64 sliding-window oracle (gaussian 11x11,
    sigma 1.5, torchmetrics conventions) pins the shifted-moment
    implementation to 1e-6."""
    from learned_hologram_gan_tpu.losses import metrics as M

    rng = np.random.default_rng(7)
    x = rng.random((1, 2, 24, 24)).astype(np.float32)
    y = (x + rng.normal(0, 0.1, x.shape)).astype(np.float32)
    g = M._gaussian_1d(11, 1.5).astype(np.float64)
    win = np.outer(g, g)

    def blur(img):
        H, W = img.shape
        out = np.zeros((H - 10, W - 10))
        for i in range(H - 10):
            for j in range(W - 10):
                out[i, j] = (img[i : i + 11, j : j + 11] * win).sum()
        return out

    rngv = max(x.max(), y.max()) - min(x.min(), y.min())
    c1, c2 = (0.01 * rngv) ** 2, (0.03 * rngv) ** 2
    vals = []
    for b in range(x.shape[0]):
        for c in range(x.shape[1]):
            xx, yy = x[b, c].astype(np.float64), y[b, c].astype(np.float64)
            mx, my = blur(xx), blur(yy)
            sx = blur(xx * xx) - mx * mx
            sy = blur(yy * yy) - my * my
            sxy = blur(xx * yy) - mx * my
            s = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
                (mx * mx + my * my + c1) * (sx + sy + c2))
            vals.append(s.mean())
    oracle = float(np.mean(vals))
    got = float(losses.ssim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, oracle, atol=1e-6)


def test_ssim_plane_chunk_matches_unchunked():
    """plane_chunk bounds peak memory for 4K stacks; the weighted per-chunk
    combination must equal the unchunked mean (incl. a ragged last chunk)."""
    rng = np.random.default_rng(11)
    x = rng.random((2, 3, 20, 20)).astype(np.float32)
    y = (x + rng.normal(0, 0.05, x.shape)).astype(np.float32)
    full = float(losses.ssim(jnp.asarray(x), jnp.asarray(y)))
    for chunk in (1, 4, 5, 6, 99):
        got = float(losses.ssim(jnp.asarray(x), jnp.asarray(y), plane_chunk=chunk))
        np.testing.assert_allclose(got, full, atol=2e-6)

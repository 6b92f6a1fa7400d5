#!/usr/bin/env python
"""Warming-up study: why the propagator is *band-limited* ASM.

Executable counterpart of the reference's educational notebook
(`/root/reference/warmingUp/aboutBandLimitedAngularSpectrumMethod.ipynb`),
redone in JAX with assertions — it both teaches and validates:

1. 1-D angular-spectrum propagation of a rect aperture at sampling interval
   dx = 2 lambda.
2. A finely-sampled (512x oversampled window) AS evaluator as ground truth —
   free of the wrap-around aliasing the coarse grid suffers.
3. SNR of plain AS vs distance: it collapses in the far field because the
   transfer-function phase exp(-2 pi i z w(f)) oscillates faster than the
   frequency grid can sample (Matsushima & Shimobaba 2009).
4. Band-limited AS: clipping |f| <= u_limit = 1/(lambda sqrt((2 du z)^2+1))
   recovers the far field.  Assert: SNR(band-limited) > SNR(plain) at long z.
5. The same effect in 2-D through this package's real propagator
   (`ops/asm.py`, band_limit mask from `ops/masks.py`).

Run: python examples/warming_up_asm.py [--quick] [--plot]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# 1-D angular spectrum method (teaching-scale, pure numpy semantics via jnp)
# ---------------------------------------------------------------------------


def rect_source(n: int) -> np.ndarray:
    """Unit rect covering the central half of the window."""
    g = np.zeros(n)
    g[n // 4 : 3 * n // 4] = 1.0
    return g


def as_1d(wavelength: float, z: float, n: int = 2048, oversample: int = 1,
          band_limit: bool = False):
    """Propagate a rect aperture distance z with (band-limited) ASM.

    ``oversample`` embeds the same physical aperture in an `oversample`x
    wider zero-padded window — the evaluator trick: aliasing copies wrap
    around a window that much larger, so the central cut is exact.
    Returns the field magnitude on the original n-sample window.
    """
    import jax.numpy as jnp

    dx = 2.0 * wavelength                      # Nyquist for |f| < 1/lambda
    big = n * oversample
    src = np.zeros(big)
    lo = (big - n) // 2
    src[lo + n // 4 : lo + 3 * n // 4] = 1.0   # same aperture, wider window

    f = jnp.fft.fftfreq(big, dx)
    w_sq = jnp.maximum(1.0 / wavelength**2 - f**2, 0.0)
    h = jnp.exp(2j * jnp.pi * z * jnp.sqrt(w_sq))
    if band_limit:
        # Matsushima-Shimobaba limit for the *physical* window size n*dx
        s = n * dx
        du = 1.0 / (2.0 * s)
        u_limit = 1.0 / (math.sqrt((2.0 * du * z) ** 2 + 1.0) * wavelength)
        h = jnp.where(jnp.abs(f) <= u_limit, h, 0.0)
    g_z = jnp.fft.ifft(jnp.fft.fft(jnp.asarray(src)) * h)
    out = jnp.abs(g_z)[lo : lo + n]
    return np.asarray(out)


def snr_db(truth: np.ndarray, approx: np.ndarray) -> float:
    p_sig = float(np.mean(truth**2))
    p_noise = float(np.mean((approx - truth) ** 2))
    return 10.0 * math.log10(p_sig / max(p_noise, 1e-30))


# ---------------------------------------------------------------------------
# 2-D: the package's real propagator with / without the band-limit mask
# ---------------------------------------------------------------------------


def compare_2d(z_factor: float = 100.0, n: int = 256):
    """Square-aperture 2-D propagation, plain vs band_limit=True plans."""
    import dataclasses

    import jax.numpy as jnp

    from learned_hologram_gan_tpu.config import OpticsConfig
    from learned_hologram_gan_tpu.ops import asm, masks

    wavelength = 520e-9
    pitch = 2.0 * wavelength
    s = n * pitch
    z = z_factor * s

    amp = np.zeros((1, 1, n, n), np.float32)
    amp[:, :, n // 4 : 3 * n // 4, n // 4 : 3 * n // 4] = 1.0
    phs = np.zeros_like(amp)

    cfg = OpticsConfig(
        rows=n, cols=n, pad_size=n // 2, pixel_pitch=pitch,
        wavelengths=(wavelength,),
        filter_radius_coefficient=0.499,  # aperture low-pass wide open (max radius)
    )
    plan = asm.make_plan(cfg, distances=np.array([z]))
    # Band-limited variant: fold the Matsushima mask (which the reference
    # computes but never applies, angular_spectrum_method.py:65-66) into the
    # plan's frequency-domain mask.
    bl = masks.band_limit_mask(
        cfg.padded_rows, cfg.padded_cols, pitch, (wavelength,), np.array([z])
    )[0, 0]
    plan_bl = dataclasses.replace(plan, mask=plan.mask * bl)

    outs = {}
    for use_bl, p in ((False, plan), (True, plan_bl)):
        out = asm.propagate_batch_multi(p, jnp.asarray(amp), jnp.asarray(phs))
        outs[use_bl] = np.asarray(out)[0, 0]
    return outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small grids for CI")
    ap.add_argument("--plot", action="store_true", help="write PNGs to examples/out/")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env may pre-point jax "
                         "at a TPU; env vars alone don't override that)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    wavelength = 1.0
    n = 512 if args.quick else 2048
    oversample = 64 if args.quick else 512
    s = n * 2.0 * wavelength

    # --- SNR vs distance: plain vs band-limited, truth = oversampled window
    z_factors = (
        [0.5, 10.0, 100.0, 400.0] if args.quick
        else [0.1, 0.5, 2, 10, 50, 100, 400]
    )
    rows = []
    for n_s in z_factors:
        z = n_s * s
        truth = as_1d(wavelength, z, n, oversample=oversample)
        plain = as_1d(wavelength, z, n)
        limited = as_1d(wavelength, z, n, band_limit=True)
        rows.append((n_s, snr_db(truth, plain), snr_db(truth, limited)))
        print(f"z = {n_s:7.2f} S   SNR plain {rows[-1][1]:7.2f} dB   "
              f"band-limited {rows[-1][2]:7.2f} dB")

    # Near field: both fine.  Far field: band-limiting must win big.
    far = rows[-1]
    assert far[2] > far[1] + 3.0, (
        f"band-limited ASM should dominate in the far field: {far}"
    )
    near = rows[0]
    assert near[1] > 20.0, f"plain ASM should be accurate in the near field: {near}"

    # --- 2-D via the package propagator
    outs = compare_2d(n=128 if args.quick else 256)
    # Without the limit the far-field pattern is polluted by wrap-around
    # copies that show up as high-frequency energy off the main lobe.
    diff = float(np.mean(np.abs(outs[True] - outs[False])))
    print(f"2-D |band_limited - plain| mean: {diff:.4e} "
          f"(the masked spectrum differs, as it must at far z)")
    assert diff > 0.0

    if args.plot:
        import os

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs("examples/out", exist_ok=True)
        zs = [r[0] for r in rows]
        fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
        a1.plot(zs, [r[1] for r in rows], "o-", label="plain AS")
        a1.plot(zs, [r[2] for r in rows], "s-", label="band-limited AS")
        a1.set_xscale("log"); a1.set_xlabel("z [window sizes]")
        a1.set_ylabel("SNR vs oversampled truth [dB]"); a1.legend()
        a2.imshow(np.concatenate([outs[False], outs[True]], axis=1), cmap="gray")
        a2.set_title("2-D recon: plain | band-limited"); a2.axis("off")
        fig.tight_layout()
        fig.savefig("examples/out/warming_up_asm.png", dpi=120)
        print("wrote examples/out/warming_up_asm.png")

    print("warming-up ASM study: all assertions passed")


if __name__ == "__main__":
    main()

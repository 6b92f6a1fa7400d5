#!/usr/bin/env python
"""Warming-up study: aperture diffraction in the Fourier plane.

Executable counterpart of `/root/reference/warmingUp/aboutAperture.ipynb`:
truncating a field with a finite circular aperture convolves its spectrum
with the aperture's Airy-like transform — energy leaks out of the original
discrete tones into a broadened sinc skirt.  This is exactly why the
propagator's circular frequency mask (`ops/masks.circular_frequency_mask`)
models the imaging system's aperture as a *low-pass filter*.

Assertions:
1. The unapertured 2-D sine field concentrates its spectral energy in 4
   delta tones (plus conjugates).
2. After the aperture, those tones hold strictly less of the total energy
   (spread into the sinc skirt), and the skirt energy is significant.

Run: python examples/warming_up_aperture.py [--cpu] [--plot]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    n = 256
    length = 1e-3                     # field side length [m]
    radius = 0.1 * length             # aperture radius
    cycles = 20                       # sine tone index

    x = np.linspace(-length / 2, length / 2, n, endpoint=False)  # exact grid periodicity -> delta tones
    xx, yy = np.meshgrid(x, x, indexing="ij")
    rr = np.sqrt(xx**2 + yy**2)
    field = np.sin(cycles * 2 * np.pi * xx / length) * np.sin(
        cycles * 2 * np.pi * yy / length
    )
    aperture = (rr <= radius).astype(np.float32)

    spec = jnp.fft.fftshift(jnp.fft.fft2(jnp.asarray(field)))
    spec_ap = jnp.fft.fftshift(jnp.fft.fft2(jnp.asarray(field * aperture)))
    mag, mag_ap = np.abs(np.asarray(spec)), np.abs(np.asarray(spec_ap))

    # the 4 tones live at (+-cycles, +-cycles) around the center
    c = n // 2
    tone_mask = np.zeros((n, n), bool)
    for sx in (-cycles, cycles):
        for sy in (-cycles, cycles):
            tone_mask[c + sx - 1 : c + sx + 2, c + sy - 1 : c + sy + 2] = True

    def tone_fraction(m):
        e = m**2
        return float(e[tone_mask].sum() / e.sum())

    f_plain, f_ap = tone_fraction(mag), tone_fraction(mag_ap)
    print(f"energy in the 4 tones: no aperture {f_plain:.4f}, "
          f"aperture {f_ap:.4f}")
    assert f_plain > 0.99, "unapertured tones should be near-delta"
    assert f_ap < 0.5, "aperture must spread energy into the sinc skirt"

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs("examples/out", exist_ok=True)
        fig, axes = plt.subplots(1, 2, figsize=(10, 5))
        for axis, m, title in zip(
            axes, (mag, mag_ap), ("no aperture", "0.1L aperture")
        ):
            axis.imshow(np.log1p(m), cmap="gray")
            axis.set_title(title); axis.axis("off")
        fig.tight_layout()
        fig.savefig("examples/out/warming_up_aperture.png", dpi=120)
        print("wrote examples/out/warming_up_aperture.png")

    print("warming-up aperture study: all assertions passed")


if __name__ == "__main__":
    main()

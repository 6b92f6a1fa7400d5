#!/usr/bin/env python
"""A/B the UNet up-conv implementations on the real chip.

Round 3 replaced ``nn.ConvTranspose(2x2, stride 2)`` with a GEMM +
pixel-shuffle (bit-equal; blocks.PixelShuffleConvTranspose) because the
input-dilated conv lowering measured 3-10x above roofline — but the round-3
audit then measured the *shuffle* at 11x roofline for the 384^2 stage, and
the headline bench regressed 224 -> 210 POH/s across that round.  This
probe prices both forms (plus an output-padded shuffle) at every decoder
geometry so the default can be chosen per-measurement, not per-argument.

Reference op: torch ConvTranspose2d(.., 2, stride=2),
neural_network_components.py:252-257,274-289.

Usage: python tools/probe_upconv.py [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, *args, reps=10):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _absum(x):
        return jnp.sum(jnp.abs(x.ravel()[::97]).astype(jnp.float32))

    def fetch(out):
        return float(_absum(out))

    fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    B = args.batch

    # (label, h_in, cin, cout): the UNet's four up-convs at 384^2 output
    geoms = [
        ("up_3 24->48  1024->512", 24, 1024, 512),
        ("up_2 48->96   512->256", 48, 512, 256),
        ("up_1 96->192  256->128", 96, 256, 128),
        ("up_0 192->384 128->64", 192, 128, 64),
    ]

    def conv_transpose(x, k):
        return lax.conv_transpose(
            x, k, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def gemm_shuffle(x, k):
        n, h, w, cin = x.shape
        cout = k.shape[-1]
        wmat = jnp.transpose(k[::-1, ::-1], (2, 0, 1, 3)).reshape(cin, 4 * cout)
        y = jnp.dot(x, wmat)
        y = y.reshape(n, h, w, 2, 2, cout)
        return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * w, cout)

    ct = jax.jit(conv_transpose)
    gs = jax.jit(gemm_shuffle)

    for label, h, cin, cout in geoms:
        x = jnp.asarray(
            rng.standard_normal((B, h, h, cin)).astype(np.float32), jnp.bfloat16
        )
        k = jnp.asarray(
            rng.standard_normal((2, 2, cin, cout)).astype(np.float32) * 0.05,
            jnp.bfloat16,
        )
        t_ct = time_fn(ct, x, k)
        t_gs = time_fn(gs, x, k)
        print(f"{label:26s} conv_transpose {t_ct:6.2f} ms | gemm+shuffle {t_gs:6.2f} ms")


if __name__ == "__main__":
    main()

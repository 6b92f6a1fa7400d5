#!/usr/bin/env python
"""Channel-padding probe: do the lane-wasting 64-channel UNet levels run
faster as 128-channel convs with structurally-zero padding?

Round-3's per-stage roofline audit (tools/profile_unet.py, BASELINE.md)
blamed the UNet's worst stages on bf16 half-tile lane waste: bf16 tiles are
(16 sublanes x 128 lanes), so every 64-channel tensor fills half a tile and
the reference-pinned widths put the LARGEST activations (384^2) at exactly
64 channels:

    enc_0  384^2   4->64    7.8 ms   5.2x roofline
    dec_0  384^2 128->64   11.2 ms   4.0x roofline
    head   384^2  64->6     2.0 ms   4.6x roofline

Padding those convs to 128 in/out channels with zero weights is EXACT (the
extra channels carry zeros end-to-end) but doubles/quadruples the FLOPs in
exchange for full 128-lane tiles.  This probe prices each geometry pair on
the real chip so the trade is adopted or refuted with data (round-3 VERDICT
item 1).  Reference widths: neural_network_components.py:241-315.

Usage: python tools/probe_channel_pad.py [--batch 16] [--hw 384]
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
    ap.add_argument("--hw", type=int, default=384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    B, HW = args.batch, args.hw

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    conv = jax.jit(conv)

    # (label, cin, cout, hw) pairs: each lane-wasting geometry and its
    # padded-to-128 counterpart (plus the head's padded-output variant).
    cases = [
        ("enc_0 conv1  4->64", 4, 64, HW),
        ("enc_0 conv1  4->128 (pad out)", 4, 128, HW),
        ("enc_0 conv2 64->64", 64, 64, HW),
        ("enc_0 conv2 128->128 (pad)", 128, 128, HW),
        ("dec_0 conv1 128->64", 128, 64, HW),
        ("dec_0 conv1 128->128 (pad out)", 128, 128, HW),
        ("head 1x1 64->6", 64, 6, HW),
        ("head 1x1 128->8 (pad)", 128, 8, HW),
        ("head 1x1 128->128 (pad out)", 128, 128, HW),
        ("enc_1 conv 64->128 @192", 64, 128, HW // 2),
        ("enc_1 conv 128->128 @192 (pad in)", 128, 128, HW // 2),
    ]
    results = {}
    for label, cin, cout, hw in cases:
        x = jnp.asarray(
            rng.standard_normal((B, hw, hw, cin)).astype(np.float32),
            jnp.bfloat16,
        )
        k = 1 if label.startswith("head") else 3
        w = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05,
            jnp.bfloat16,
        )
        t = time_fn(conv, x, w)
        results[label] = t
        print(f"{label:38s} {t:7.2f} ms")

    # grad-side pricing: the UNet *backward* is 4x its forward at the config
    # of record — price conv data/weight grads for the worst stage too
    def conv_and_grads(x, w):
        def f(x_, w_):
            return jnp.sum(conv(x_, w_).astype(jnp.float32) ** 2)

        gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
        return gx

    conv_and_grads = jax.jit(conv_and_grads)
    for label, cin, cout, hw in cases:
        if "dec_0" not in label and "enc_0 conv2" not in label:
            continue
        x = jnp.asarray(
            rng.standard_normal((B, hw, hw, cin)).astype(np.float32),
            jnp.bfloat16,
        )
        w = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.05,
            jnp.bfloat16,
        )
        t = time_fn(conv_and_grads, x, w)
        print(f"grad {label:33s} {t:7.2f} ms")


if __name__ == "__main__":
    main()

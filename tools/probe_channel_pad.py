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

Timing harness: each case runs REPS times inside ONE jitted fori_loop with
a serial data dependence (the accumulator perturbs the input), so the
~tens-of-ms relay dispatch cost is amortized and the fetch is a scalar —
output-size-independent, unlike a naive per-call fetch which biases against
the (2x larger) padded outputs.

Usage: python tools/probe_channel_pad.py [--batch 16] [--hw 384]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20


def make_timed(conv):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(x, w):
        def body(i, acc):
            # acc perturbs the input -> serial dependence, no hoisting;
            # the FULL-tensor mean keeps XLA from narrowing the conv to the
            # one output element a scalar fetch would need (slice-through-
            # conv DCE produced >peak-FLOP readings in the first harness)
            y = conv(x * (1.0 + acc * 1e-30).astype(x.dtype), w)
            return acc + jnp.mean(y.astype(jnp.float32))

        return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return run


def time_case(run, x, w, trials=4):
    t_best = float("inf")
    float(run(x, w))  # compile
    for _ in range(trials):
        t0 = time.perf_counter()
        v = float(run(x, w))
        t_best = min(t_best, time.perf_counter() - t0)
        assert np.isfinite(v)
    return t_best / REPS * 1e3


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

    run_conv = make_timed(conv)

    cases = [
        ("enc_0 conv1  4->64", 4, 64, HW, 3),
        ("enc_0 conv1  4->128 (pad out)", 4, 128, HW, 3),
        ("enc_0 conv2 64->64", 64, 64, HW, 3),
        ("enc_0 conv2 128->128 (pad)", 128, 128, HW, 3),
        ("dec_0 conv1 128->64", 128, 64, HW, 3),
        ("dec_0 conv1 128->128 (pad out)", 128, 128, HW, 3),
        ("dec_0 conv1 256->128 (pad in+out)", 256, 128, HW, 3),
        ("head 1x1 64->6", 64, 6, HW, 1),
        ("head 1x1 128->8 (pad)", 128, 8, HW, 1),
        ("enc_1 conv 64->128 @192", 64, 128, HW // 2, 3),
        ("enc_1 conv 128->128 @192 (pad in)", 128, 128, HW // 2, 3),
    ]
    for label, cin, cout, hw, k in cases:
        x = jnp.asarray(
            rng.standard_normal((B, hw, hw, cin)).astype(np.float32),
            jnp.bfloat16,
        )
        w = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05,
            jnp.bfloat16,
        )
        t = time_case(run_conv, x, w)
        print(f"{label:36s} {t:7.2f} ms", flush=True)

    # grad-side pricing: the UNet backward is ~4x its forward at the config
    # of record; price the fused fwd+both-grads for the worst geometries
    def conv_grads(x, w):
        def f(x_, w_):
            return jnp.sum(conv(x_, w_).astype(jnp.float32) ** 2)

        gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
        return gx

    run_grads = make_timed(conv_grads)
    for label, cin, cout, hw, k in cases:
        if "dec_0" not in label and "enc_0 conv2" not in label:
            continue
        x = jnp.asarray(
            rng.standard_normal((B, hw, hw, cin)).astype(np.float32),
            jnp.bfloat16,
        )
        w = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05,
            jnp.bfloat16,
        )
        t = time_case(run_grads, x, w)
        print(f"grad {label:31s} {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

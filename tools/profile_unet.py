#!/usr/bin/env python
"""Per-stage UNet roofline audit (round-2 verdict weak #1).

Times every UNet stage (encoder/decoder residual blocks, pools, transposed
convs, head) as its own jitted dispatch at the bench configuration
(batch 16, 384x384, bf16, inference-mode BN), subtracts the measured
per-dispatch relay overhead, and reports each stage against its own
roofline: max(flop_time @ 197 bf16 TFLOP/s, byte_time @ measured copy
ceiling).  This is the audit the spectral path got in round 2
(BASELINE.md), applied to the conv path.

Reference architecture being audited: neural_network_components.py:241-315.

Usage: python tools/profile_unet.py [--batch 16] [--train] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197e12  # v5e bf16 peak
HBM_GBPS = 819e9      # v5e HBM spec; the relay-measured copy ceiling is ~185e9


def timeit(fn, *args, reps=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _absum(x):
        x = jnp.asarray(x)
        return jnp.sum(jnp.abs(x[..., ::32, ::32].astype(jnp.float32)))

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        return float(_absum(leaf))

    out = fn(*args)
    fetch(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def conv_flops(n, h, w, cin, cout, k):
    return 2.0 * n * h * w * cin * cout * k * k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train", action="store_true",
                    help="train-mode BN (batch statistics) instead of inference")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from learned_hologram_gan_tpu.nn.blocks import ResidualBlock

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bytes_per = 2 if dtype == jnp.bfloat16 else 4
    B, S = args.batch, args.size
    train = args.train
    key = jax.random.key(0)

    # measure per-dispatch overhead with an identity jit on a tiny array
    @jax.jit
    def ident(x):
        return x + 1.0

    overhead = timeit(ident, jnp.zeros((8, 8), jnp.float32))
    print(f"per-dispatch overhead: {overhead:.2f} ms  (subtracted below)")

    levels = 4
    base = 64
    stages = []  # (name, module_or_fn, input_shapes, flops, bytes)

    def res_block_stage(name, h, w, cin, feats):
        blk = ResidualBlock(feats, use_1x1conv=True, dtype=dtype)
        x = jax.random.normal(key, (B, h, w, cin), dtype)
        variables = blk.init(jax.random.key(1), x, train)

        @jax.jit
        def run(v, x):
            if train:
                return blk.apply(v, x, True, mutable=["batch_stats"])[0]
            return blk.apply(v, x, False)

        fl = (
            conv_flops(B, h, w, cin, feats, 3)
            + conv_flops(B, h, w, feats, feats, 3)
            + conv_flops(B, h, w, cin, feats, 1)
        )
        by = bytes_per * B * h * w * (cin + 4 * feats)  # in + 3 intermediates + out
        stages.append((name, run, (variables, x), fl, by))

    def convt_stage(name, h, w, cin, cout):
        # the UNet's actual up-conv: GEMM + pixel shuffle (blocks.py), bit-
        # equal to ConvTranspose(2,2,stride 2) but MXU-shaped
        from learned_hologram_gan_tpu.nn.blocks import PixelShuffleConvTranspose

        ct = PixelShuffleConvTranspose(cout, dtype=dtype)
        x = jax.random.normal(key, (B, h, w, cin), dtype)
        variables = ct.init(jax.random.key(1), x)
        run = jax.jit(lambda v, x: ct.apply(v, x))
        fl = 2.0 * B * h * w * cin * cout * 4
        by = bytes_per * B * h * w * (cin + 4 * cout)
        stages.append((name, run, (variables, x), fl, by))

    def pool_stage(name, h, w, c):
        x = jax.random.normal(key, (B, h, w, c), dtype)
        run = jax.jit(lambda x: nn.max_pool(x, (2, 2), strides=(2, 2)))
        by = bytes_per * B * h * w * c * 1.25
        stages.append((name, run, (x,), 0.0, by))

    # encoder
    h = w = S
    cin = 4
    for i in range(levels):
        feats = base * 2**i
        res_block_stage(f"enc_{i}  {h}^2 {cin}->{feats}", h, w, cin, feats)
        pool_stage(f"pool_{i} {h}^2 {feats}", h, w, feats)
        cin = feats
        h //= 2
        w //= 2
    # bottleneck
    res_block_stage(f"bottleneck {h}^2 {cin}->{base*16}", h, w, cin, base * 16)
    convt_stage(f"up_4 {h}^2 {base*16}->{base*8}", h, w, base * 16, base * 8)
    # decoder
    cin = base * 16
    h *= 2
    w *= 2
    for i in reversed(range(levels)):
        feats = base * 2**i
        res_block_stage(f"dec_{i}  {h}^2 {feats*2}->{feats}", h, w, feats * 2, feats)
        if i > 0:
            convt_stage(f"up_{i} {h}^2 {feats}->{feats//2}", h, w, feats, feats // 2)
            h *= 2
            w *= 2

    # head
    x = jax.random.normal(key, (B, S, S, base), dtype)
    head = nn.Conv(6, (1, 1), dtype=dtype)
    hv = head.init(jax.random.key(1), x)
    stages.append((
        f"head {S}^2 {base}->6",
        jax.jit(lambda v, x: nn.sigmoid(head.apply(v, x))),
        (hv, x),
        conv_flops(B, S, S, base, 6, 1),
        bytes_per * B * S * S * (base + 12),
    ))

    total_ms = total_fl = total_roof = 0.0
    print(f"\n{'stage':34s} {'ms':>7s} {'GFLOP':>8s} {'MXU%':>6s} "
          f"{'roof ms':>8s} {'x roof':>7s}")
    for name, run, xs, fl, by in stages:
        ms = max(timeit(run, *xs) - overhead, 1e-3)
        roof = max(fl / PEAK_TFLOPS, by / HBM_GBPS) * 1e3
        mxu = fl / PEAK_TFLOPS * 1e3 / ms * 100
        print(f"{name:34s} {ms:7.2f} {fl/1e9:8.1f} {mxu:6.1f} "
              f"{roof:8.3f} {ms/max(roof,1e-6):7.2f}")
        total_ms += ms
        total_fl += fl
        total_roof += roof
    print(f"\n{'TOTAL':34s} {total_ms:7.2f} {total_fl/1e9:8.1f} "
          f"{total_fl/PEAK_TFLOPS*1e3/total_ms*100:6.1f} {total_roof:8.2f} "
          f"{total_ms/total_roof:7.2f}")
    print("\nnote: per-stage dispatch prevents cross-stage fusion; the fused "
          "whole-UNet time is lower than the column sum. Compare stage "
          "ratios, not absolutes.")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""UNet inference variants shoot-out at the bench geometry (batch 16, 384^2).

Variants:
  module   blocks.UNet.apply(train=False)       (the round-2 bench path)
  fused    nn/fused_unet.unet_apply_fused       (BN folded)
  poly     unet_apply_fused(polyphase_level0=True)  (space-to-depth level 0)

Each is one jitted dispatch; timing anchors on a host fetch of a subsampled
slice (axon relay: block_until_ready resolves early).  Numbers recorded in
BASELINE.md round-3 conv-path study.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--base", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.nn.blocks import UNet
    from learned_hologram_gan_tpu.nn.fused_unet import unet_apply_fused

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    unet = UNet(output_channels=6, base_features=args.base, dtype=dtype)
    x = jnp.asarray(
        np.random.default_rng(0)
        .random((args.batch, args.size, args.size, 4))
        .astype(np.float32),
        dtype,
    )
    variables = unet.init(jax.random.key(0), x[:1], True)
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def f_module(p, s, x):
        return unet.apply({"params": p, "batch_stats": s}, x, False)

    @jax.jit
    def f_fused(p, s, x):
        return unet_apply_fused(p, s, x)

    @jax.jit
    def f_poly(p, s, x):
        return unet_apply_fused(p, s, x, polyphase_level0=True)

    @jax.jit
    def _absum(o):
        return jnp.sum(jnp.abs(o[..., ::64, ::64, :].astype(jnp.float32)))

    def timeit(fn):
        out = fn(params, stats, x)
        float(_absum(out))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(params, stats, x)
            float(_absum(out))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3, out

    results = {}
    baseline_out = None
    for name, fn in (("module", f_module), ("fused", f_fused), ("poly", f_poly)):
        ms, out = timeit(fn)
        results[name] = ms
        print(f"{name:8s} {ms:8.2f} ms", flush=True)
        o32 = np.asarray(out[:1], np.float32)
        if baseline_out is None:
            baseline_out = o32
        else:
            err = float(np.max(np.abs(o32 - baseline_out)))
            print(f"         max|diff vs module| = {err:.3e}")
            assert err < 0.05, f"{name} diverged from the module output"
    print(
        f"poly speedup vs module: {results['module'] / results['poly']:.2f}x"
    )

    # ---- per-stage probe: standard vs phase-domain level-0 blocks ----
    import time as _t

    from learned_hologram_gan_tpu.nn.blocks import ResidualBlock
    from learned_hologram_gan_tpu.nn.fused_unet import (
        _block_eval,
        _block_eval_poly,
        space_to_depth,
    )

    def probe(name, fn, *xs):
        out = fn(*xs)
        float(_absum(out))
        best = float("inf")
        for _ in range(args.reps):
            t0 = _t.perf_counter()
            out = fn(*xs)
            float(_absum(out))
            best = min(best, _t.perf_counter() - t0)
        print(f"{name:26s} {best * 1e3:8.2f} ms", flush=True)

    key = jax.random.key(3)
    for label, cin in (("enc_0", 4), ("dec_0", 2 * args.base)):
        blk = ResidualBlock(args.base, use_1x1conv=True, dtype=dtype)
        xs = jax.random.normal(key, (args.batch, args.size, args.size, cin), dtype)
        v = blk.init(jax.random.key(4), xs, False)
        p, bs = v["params"], v["batch_stats"]
        probe(
            f"{label} std {args.size}^2x{cin}",
            jax.jit(lambda p, bs, x: _block_eval(p, bs, x, False)),
            p, bs, xs,
        )
        probe(
            f"{label} poly {args.size // 2}^2x{4 * cin}",
            jax.jit(lambda p, bs, x: _block_eval_poly(p, bs, space_to_depth(x))),
            p, bs, xs,
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Pipeline performance decomposition on the current accelerator.

Breaks the headline metric (384x384 generation + 3-plane recon) into stages,
sweeps batch size, and compares FFT backends — the measurement harness behind
docs/tpu_performance.md.  All timings are host-fetch anchored (see
utils/timer.py; never trust block_until_ready on relayed transports).

Usage: python tools/profile_pipeline.py [--rows 384] [--pad 320] [--batch 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(rows: int, pad: int, batch: int):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.config import GeneratorConfig
    from learned_hologram_gan_tpu.models import AP2POH, Generator, RGBD2AP, make_generator_plan
    from learned_hologram_gan_tpu.ops import asm
    from learned_hologram_gan_tpu.utils.timer import device_timer

    cfg = GeneratorConfig(
        rows=rows, cols=rows, pad_size=pad,
        filter_radius_coefficient=0.45, dtype="bfloat16",
    )
    plan = make_generator_plan(cfg)
    rplan = asm.make_plan(cfg.optics(), distances=np.linspace(4e-4, 10e-4, 3),
                          cache_h=False)
    print(f"padded grid: {plan.padded_rows} x {plan.padded_cols}")

    rng = np.random.default_rng(0)
    B = batch
    x = jnp.asarray(rng.random((B, 4, rows, rows)).astype(np.float32))
    amp = jnp.asarray(rng.random((B, 3, rows, rows)).astype(np.float32))
    phs = jnp.asarray(rng.random((B, 3, rows, rows)).astype(np.float32))

    # --- stage decomposition ---
    m1 = RGBD2AP(base_features=cfg.unet_base_features, dtype=jnp.bfloat16)
    v1 = jax.jit(lambda k, x: m1.init(k, x, train=False))(jax.random.key(0), x[:1])
    unet = jax.jit(lambda v, x: m1.apply(v, x, train=False))
    t = device_timer(lambda: unet(v1, x), repeat=5, warmup=2)
    print(f"UNet fwd:              {t:7.1f} ms")

    m2 = AP2POH(dtype=jnp.bfloat16)
    v2 = jax.jit(lambda k, a, p: m2.init(k, plan, a, p))(jax.random.key(0), amp[:1], phs[:1])
    ap2poh = jax.jit(lambda v, plan, a, p: m2.apply(v, plan, a, p))
    t = device_timer(lambda: ap2poh(v2, plan, amp, phs), repeat=5, warmup=2)
    print(f"AP2POH (bwd ASM + dp): {t:7.1f} ms")

    recon = jax.jit(lambda plan, p: asm.propagate_batch_multi(plan, jnp.ones_like(p), p))
    t = device_timer(lambda: recon(rplan, phs), repeat=5, warmup=2)
    print(f"3-plane recon:         {t:7.1f} ms")

    # --- full pipeline, both FFT backends ---
    gen = Generator(cfg)
    v = jax.jit(lambda k, x: gen.init(k, plan, x, train=False))(jax.random.key(0), x[:1])
    for backend in ("xla", "mxu"):
        asm.set_fft_backend(backend)

        @jax.jit
        def pipe(p, bs, plan, rplan, x):
            poh = gen.apply({"params": p, "batch_stats": bs}, plan, x, train=False)
            return poh, asm.propagate_batch_multi(rplan, jnp.ones_like(poh), poh)

        t = device_timer(
            lambda: pipe(v["params"], v.get("batch_stats", {}), plan, rplan, x),
            repeat=5, warmup=2,
        )
        print(f"pipeline [{backend}]:       {t:7.1f} ms -> {B / t * 1000:6.1f} POH/s")
    asm.set_fft_backend("xla")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=384)
    ap.add_argument("--pad", type=int, default=320)
    ap.add_argument("--batch", type=int, default=16)
    a = ap.parse_args()
    main(a.rows, a.pad, a.batch)

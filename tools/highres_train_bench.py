#!/usr/bin/env python
"""High-resolution TRAINING demonstration (round-1 verdict item #5).

Runs full WGAN-GP train steps at 1080p-class resolution (1088x1920, pad 320
-> padded grid 1728x3048) on one chip: remat UNet + cache_h=False (no
transfer-function stack in HBM) + bf16 convs.  The reference needs >= 30 GB
host RAM for 4K *inference* (README.md:9) and never demonstrates high-res
training at all.

    python tools/highres_train_bench.py            # 1080p (default)
    python tools/highres_train_bench.py --rows 544 --cols 960   # smaller

Prints ms/step after compile.  Results recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1088)
    ap.add_argument("--cols", type=int, default=1920)
    ap.add_argument("--pad_size", type=int, default=320)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--ratio", type=int, default=1)
    ap.add_argument("--distances", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.config import LossConfig
    from learned_hologram_gan_tpu.train import Watermelon, build_train_step

    trainer = Watermelon(
        filter_radius_coefficient=0.45,
        pad_size=args.pad_size,
        distance_stack=np.linspace(-4e-4, 0.0, args.distances + 1)[:-1],
        input_shape=(args.batch, 4, args.rows, args.cols),
        use_gan=True,
        perceptual="none",
        dtype="bfloat16",
        remat=True,
        cache_h=False,
    )
    trainer._init_state(seed=0, lr_G=1e-3, lr_D=1e-3)
    step = build_train_step(
        trainer.generator, trainer.discriminator, trainer.tx_G, trainer.tx_D,
        LossConfig(perceptual="none"), use_gan=True,
        discriminator_train_ratio=args.ratio, discriminator_lambda=10.0,
        remat=True,
    )
    rng = np.random.default_rng(0)
    batch = tuple(
        jnp.asarray(rng.random((args.batch, c, args.rows, args.cols)).astype(np.float32))
        for c in (4, 3, 3)
    )
    state = trainer.state

    t0 = time.perf_counter()
    state, metrics = step(state, batch, trainer.gen_plan, trainer.multi_plan)
    g0 = float(metrics["G_loss"])  # host fetch == hard sync
    print(f"step 1 (incl compile): {time.perf_counter() - t0:.1f} s, G_loss={g0:.4f}")

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, trainer.gen_plan, trainer.multi_plan)
        g = float(metrics["G_loss"])
        times.append(time.perf_counter() - t0)
        print(f"step {i + 2}: {times[-1] * 1e3:.0f} ms, G_loss={g:.4f}")
        assert np.isfinite(g), "non-finite loss at high resolution"
    print(
        f"{args.rows}x{args.cols} batch {args.batch} ratio {args.ratio}: "
        f"{min(times) * 1e3:.0f} ms/step (best of {args.steps})"
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Full-GAN training-step throughput with honest FLOP/bandwidth accounting.

BASELINE.json config #3: full WGAN-GP, 384x384, batch 4, 20-plane random
focal stack, discriminator_train_ratio=5, gradient penalty, bf16 convs —
the reference's training configuration of record
(/root/reference/trainingModel.py:59-97, watermelon.py:207-284).

Beyond steps/s, prints XLA's own cost analysis for the compiled step
(flops + bytes accessed) so the achieved FLOP/s and HBM-bandwidth
utilization are arguable with numbers (round-1 verdict item #4):

    python tools/train_bench.py [--batch 4] [--ratio 5] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e public per-chip peaks (cloud.google.com/tpu/docs/v5e): 197 TFLOP/s
# bf16, 819 GB/s HBM.  The axon relay's measured copy ceiling on this chip is
# ~185 GB/s (BASELINE.md) — both denominators are reported.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_GBPS = 819.0
MEASURED_COPY_GBPS = 185.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ratio", type=int, default=5)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rows", type=int, default=384)
    ap.add_argument("--cols", type=int, default=384)
    ap.add_argument("--distances", type=int, default=20)
    ap.add_argument("--pad_size", type=int, default=320,
                    help="config of record: 320; shrink for CPU smoke")
    ap.add_argument("--critic", default="pair",
                    choices=["separate", "pair", "full"],
                    help="critic_batching mode (see train/steps.py)")
    ap.add_argument("--two_h", action="store_true",
                    help="fused two-H hat/target reconstruction path")
    ap.add_argument("--streaming", default="off",
                    choices=["off", "float32", "bfloat16"],
                    help="feed every step a FRESH host batch through the "
                         "prefetch pipeline instead of reusing one resident "
                         "batch — measures the input-bound streaming cadence "
                         "(bfloat16 = half the wire bytes, see "
                         "data/prefetch.epoch_loader)")
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
    )
    trainer._init_state(seed=0, lr_G=1e-3, lr_D=1e-3)
    step = build_train_step(
        trainer.generator, trainer.discriminator, trainer.tx_G, trainer.tx_D,
        LossConfig(perceptual="none"), use_gan=True,
        discriminator_train_ratio=args.ratio, discriminator_lambda=10.0,
        critic_batching=args.critic, two_h_hat=args.two_h,
    )
    rng = np.random.default_rng(0)
    wire_dtype = jnp.bfloat16 if args.streaming == "bfloat16" else np.float32
    host_batches = [
        tuple(
            rng.random((args.batch, c, args.rows, args.cols))
            .astype(np.float32).astype(wire_dtype)
            for c in (4, 3, 3)
        )
        for _ in range(4 if args.streaming != "off" else 1)
    ]
    batch = tuple(jnp.asarray(a) for a in host_batches[0])
    state = trainer.state

    # AOT-compile ONCE and reuse the executable for both the cost analysis
    # (XLA's own FLOP / bytes-accessed model for the whole step: G fwd+bwd+
    # opt, ratio x (critic fwd + grad-penalty double-bwd) + D opt) and the
    # timed loop — `step` is already jitted, `.lower().compile()` avoids a
    # second trace-and-compile on first dispatch.
    t0 = time.perf_counter()
    compiled = step.lower(
        state, batch, trainer.gen_plan, trainer.multi_plan
    ).compile()
    print(f"compile: {time.perf_counter() - t0:.1f} s", file=sys.stderr, flush=True)
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    t0 = time.perf_counter()
    state, metrics = compiled(state, batch, trainer.gen_plan, trainer.multi_plan)
    _ = float(metrics["G_loss"])  # host fetch == hard sync
    print(f"step 1: {time.perf_counter() - t0:.1f} s", file=sys.stderr, flush=True)

    times = []
    if args.streaming == "off":
        for _ in range(args.steps):
            t0 = time.perf_counter()
            state, metrics = compiled(state, batch, trainer.gen_plan,
                                      trainer.multi_plan)
            _ = float(metrics["G_loss"])
            times.append(time.perf_counter() - t0)
    else:
        # the double-buffered prefetch thread device_puts the next host
        # batch while the current step runs — the loader the real training
        # loop uses (quality_run --streaming)
        from learned_hologram_gan_tpu.data.prefetch import prefetch_to_device

        def host_gen():
            for i in range(args.steps):
                yield host_batches[i % len(host_batches)]

        for dev_batch in prefetch_to_device(host_gen(), size=2):
            t0 = time.perf_counter()
            state, metrics = compiled(state, dev_batch, trainer.gen_plan,
                                      trainer.multi_plan)
            _ = float(metrics["G_loss"])
            times.append(time.perf_counter() - t0)
    best = min(times)
    median = sorted(times)[len(times) // 2]

    result = {
        "config": f"{args.rows}x{args.cols} batch {args.batch} ratio "
                  f"{args.ratio} D={args.distances} full WGAN-GP "
                  f"critic={args.critic}"
                  + (f" streaming={args.streaming}"
                     if args.streaming != "off" else ""),
        "steps_per_sec": round(1.0 / median, 3),
        "steps_per_sec_best": round(1.0 / best, 3),
        "samples_per_sec": round(args.batch / median, 2),
        "ms_per_step_median": round(median * 1e3, 1),
        "xla_flops_per_step": flops,
        "xla_bytes_per_step": bytes_accessed,
        "achieved_tflops": round(flops / median / 1e12, 2),
        "achieved_gbps": round(bytes_accessed / median / 1e9, 1),
        "mxu_utilization_pct": round(100 * flops / median / V5E_PEAK_BF16_FLOPS, 1),
        "hbm_utilization_pct_spec": round(
            100 * bytes_accessed / median / (V5E_PEAK_HBM_GBPS * 1e9), 1
        ),
        "hbm_utilization_pct_vs_copy_ceiling": round(
            100 * bytes_accessed / median / (MEASURED_COPY_GBPS * 1e9), 1
        ),
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

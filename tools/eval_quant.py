#!/usr/bin/env python
"""Quality + speed of the int8-quantized generator vs the bf16 path.

Measures what PTQ actually costs on the trained config-of-record checkpoint:
the SAME full-val 20-plane focal-stack PSNR/SSIM sweep as tools/eval_quality.py,
run twice — stage-1 UNet in bf16 (the shipping inference path) and in int8
(nn/quant.py; weights per-channel, activations calibrated per-tensor) — plus
a device timing of the bench.py pipeline both ways.

    python tools/eval_quant.py --data data/synth384 --run_dir output/quality_run

Writes <run_dir>/eval_quant/summary.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/synth384")
    ap.add_argument("--run_dir", default="output/quality_run")
    ap.add_argument("--out", default=None)
    ap.add_argument("--rows", type=int, default=384)
    ap.add_argument("--cols", type=int, default=384)
    ap.add_argument("--pad_size", type=int, default=320)
    ap.add_argument("--filter_radius_coefficient", type=float, default=0.45)
    ap.add_argument("--val_num", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--calib_num", type=int, default=8,
                    help="train samples for activation-scale calibration")
    ap.add_argument("--num_planes", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--unet_base_features", type=int, default=64)
    ap.add_argument("--time_batch", type=int, default=16,
                    help="bench.py-config timing batch (0 = skip timing)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("XLA_FLAGS", None)
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    out_dir = args.out or os.path.join(args.run_dir, "eval_quant")
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.data import ImgDepthAmpPhsDataset
    from learned_hologram_gan_tpu.losses import psnr, ssim
    from learned_hologram_gan_tpu.models.generator import (
        generator_apply_fused,
        generator_apply_quant,
        nchw_to_nhwc,
    )
    from learned_hologram_gan_tpu.nn.quant import (
        quantize_unet,
        quantize_unet_q8,
        quantized_bytes,
    )
    from learned_hologram_gan_tpu.ops import asm
    from learned_hologram_gan_tpu.train import Watermelon

    h, w = args.rows, args.cols

    def dataset(split, n):
        return ImgDepthAmpPhsDataset(
            img_path=os.path.join(args.data, split, "img.bin"),
            depth_path=os.path.join(args.data, split, "depth.bin"),
            amp_path=os.path.join(args.data, split, "amp.bin"),
            phs_path=os.path.join(args.data, split, "phs.bin"),
            samples_num=n, height=h, width=w,
        )

    val = dataset("val", args.val_num)

    g_path = next(
        p for p in (os.path.join(args.run_dir, n)
                    for n in ("G.msgpack", "generator.msgpack"))
        if os.path.exists(p)
    )
    trainer = Watermelon(
        filter_radius_coefficient=args.filter_radius_coefficient,
        pad_size=args.pad_size,
        distance_stack=np.linspace(-4e-4, 0.0, args.num_planes + 1)[:-1],
        pretrained_model_path_G=g_path,
        input_shape=(args.batch, 4, h, w),
        use_gan=False, perceptual="none", dtype=args.dtype,
        unet_base_features=args.unet_base_features,
    )
    trainer._init_state(seed=0, lr_G=1e-3, lr_D=1e-3)
    params_G, bs_G = trainer.state.params_G, trainer.state.batch_stats_G

    # ---- calibrate the int8 stage-1 on a few TRAIN samples ----
    calib_ds = dataset("train", args.calib_num)
    calib = np.stack([calib_ds.get(i)[0] for i in range(args.calib_num)])
    calib_nhwc = nchw_to_nhwc(jnp.asarray(calib))
    qtree = quantize_unet(
        params_G["part1"]["unet"], bs_G["part1"]["unet"], calib_nhwc
    )
    qtree_q8 = quantize_unet_q8(
        params_G["part1"]["unet"], bs_G["part1"]["unet"], calib_nhwc
    )
    q_mb = quantized_bytes(qtree) / 1e6
    f_mb = sum(int(np.prod(a.shape)) * 4
               for a in jax.tree.leaves(params_G["part1"]["unet"])) / 1e6
    print(f"stage-1 params: {f_mb:.1f} MB f32 -> {q_mb:.1f} MB int8-packed",
          flush=True)

    variables = {"params": params_G, "batch_stats": bs_G}

    # NOTE: variables/qtree ride through jit as ARGUMENTS (ctx), never as
    # closure constants — checkpoint leaves are host numpy arrays, and traced
    # constant indices (SymmetricConv2d's distance map) cannot index those.
    def apply_bf16(ctx, gen_plan, rgbd):
        return generator_apply_fused(
            trainer.generator, ctx[0], gen_plan, rgbd
        )

    def apply_int8(ctx, gen_plan, rgbd):
        return generator_apply_quant(
            trainer.generator, ctx[0], ctx[1], gen_plan, rgbd
        )

    ctx_of = {
        "bf16": (variables,),
        "int8": (variables, qtree),
        "int8_static": (variables, qtree_q8),
    }

    # ---- the eval_quality recon semantics, parameterized by the POH fn ----
    def make_recon(poh_fn):
        @jax.jit
        def recon_all(ctx, gen_plan, multi_plan, rgbd, amp, phs):
            poh = poh_fn(ctx, gen_plan, rgbd)
            hat_freq = asm.propagate_poh2freq_forward(gen_plan, poh)
            tgt_freq = asm.filter_ap2filtered_freq(multi_plan, amp, phs)
            both = jnp.concatenate([hat_freq, tgt_freq], axis=0)
            amps, _ = asm.freq2ap_all_distances(multi_plan, both)
            b = rgbd.shape[0]
            amps = amps.reshape(2 * b, multi_plan.num_distances, *amps.shape[1:])
            return amps[:b], amps[b:]
        return recon_all

    # bound the SSIM moment stack for high-res runs (same sizing rule as
    # tools/eval_quality.py; the 4K stack is ~12 GB unchunked)
    h, w = trainer.gen_config.rows, trainer.gen_config.cols
    ssim_chunk = max(1, int(4e8 / (5 * 4 * h * w)))

    results = {}
    for label, fn in (("bf16", apply_bf16), ("int8", apply_int8),
                      ("int8_static", apply_int8)):
        recon_all = make_recon(fn)
        tot_psnr = tot_ssim = 0.0
        n_batches = 0
        for start in range(0, args.val_num, args.batch):
            idx = range(start, min(start + args.batch, args.val_num))
            rgbd, amp, phs = (np.stack(x) for x in zip(*[val.get(i) for i in idx]))
            hat, tgt = recon_all(
                ctx_of[label], trainer.gen_plan, trainer.multi_plan,
                jnp.asarray(rgbd), jnp.asarray(amp), jnp.asarray(phs),
            )
            tot_psnr += float(psnr(hat, tgt))
            tot_ssim += float(ssim(
                hat.reshape(-1, *hat.shape[2:]), tgt.reshape(-1, *tgt.shape[2:]),
                plane_chunk=ssim_chunk,
            ))
            n_batches += 1
            print(f"[{label}] metrics {start + len(list(idx))}/{args.val_num}",
                  flush=True)
        results[label] = {
            "val_PSNR": tot_psnr / n_batches,
            "val_SSIM": tot_ssim / n_batches,
        }
        print(json.dumps({label: results[label]}), flush=True)

    # ---- bench.py-pipeline timing (gen + 3-plane recon), both paths ----
    if args.time_batch:
        recon_plan = asm.make_plan(
            trainer.gen_config.optics(),
            distances=np.linspace(4e-4, 10e-4, 3),
        )
        rgbd16 = jnp.asarray(
            np.stack([val.get(i % args.val_num)[0]
                      for i in range(args.time_batch)])
        )

        def time_pipeline(fn, label):
            @jax.jit
            def pipe(ctx, gen_plan, recon_plan, rgbd):
                poh = fn(ctx, gen_plan, rgbd)
                return asm.propagate_batch_multi(
                    recon_plan, jnp.ones_like(poh), poh
                )

            def fetch(out):
                return float(jnp.sum(out[:, :, ::8, ::8].astype(jnp.float32)))

            ctx = ctx_of[label]
            fetch(pipe(ctx, trainer.gen_plan, recon_plan, rgbd16))
            fetch(pipe(ctx, trainer.gen_plan, recon_plan, rgbd16))
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                out = pipe(ctx, trainer.gen_plan, recon_plan, rgbd16)
            fetch(out)
            dt = (time.perf_counter() - t0) / reps
            poh_s = args.time_batch / dt
            print(f"[{label}] {dt * 1e3:.1f} ms/batch-{args.time_batch} "
                  f"= {poh_s:.1f} POH/s", flush=True)
            return poh_s

        for label, fn in (("bf16", apply_bf16), ("int8", apply_int8),
                          ("int8_static", apply_int8)):
            results[label]["poh_per_sec"] = time_pipeline(fn, label)

    results["stage1_MB"] = {"f32": f_mb, "int8_packed": q_mb}
    results["delta_dB"] = {
        label: results[label]["val_PSNR"] - results["bf16"]["val_PSNR"]
        for label in ("int8", "int8_static")
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

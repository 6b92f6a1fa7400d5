#!/usr/bin/env python
"""High-resolution fine-tune: transfer the 384^2-trained generator to 1080p.

The generator is fully convolutional (UNet + 3x3 symmetric modulation conv +
double-phase encode; reference neural_network_components.py:241-315), so its
384^2-trained weights apply at any resolution — only the propagator plans
(transfer functions, band-limit masks) are resolution-bound, and those are
precomputed constants, not parameters.  This tool demonstrates the
resolution-transfer workflow end-to-end on one chip:

  1. load the config-of-record generator (output/quality_run/generator.msgpack)
  2. fine-tune it at 1080p-class resolution (1088x1920, pad 320) with the
     non-GAN objective (pixel + focal sin-cos phase gradient + TV — the
     reference's "without_GAN" ablation, watermelon.py:640-938) under the
     single-chip high-res levers: remat UNet, cache_h=False, bf16
  3. evaluate with tools/eval_quality.py at the same resolution

The GAN term is omitted deliberately: the 192-receptive-field critic was
trained at 384^2 and transfers poorly, and the non-GAN objective is itself a
reference-sanctioned variant.  Memory levers here are the ones BASELINE.md's
1080p-training demonstration established; this adds the missing evidence that
high-res training CONVERGES, not merely steps.

Run (after tools/make_synthetic_dataset.py --out data/synth1080
     --rows 1088 --cols 1920 --train_num 48 --val_num 8 --batch 1):

    python tools/finetune_highres.py --data data/synth1080 \
        --init output/quality_run/generator.msgpack
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/synth1080")
    ap.add_argument("--out", default="output/finetune_1080p")
    ap.add_argument("--init", default="output/quality_run/generator.msgpack",
                    help="384^2-trained generator to start from ('' = random)")
    ap.add_argument("--rows", type=int, default=1088)
    ap.add_argument("--cols", type=int, default=1920)
    ap.add_argument("--pad_size", type=int, default=320)
    ap.add_argument("--train_num", type=int, default=48)
    ap.add_argument("--val_num", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--distances", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4,
                    help="fine-tune LR (lower than the 1e-3 from-scratch LR)")
    ap.add_argument("--eval_planes", type=int, default=8)
    ap.add_argument("--skip_eval", action="store_true")
    ap.add_argument("--unet_base_features", type=int, default=64,
                    help="reduce for CPU smoke tests")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--data_dtype", default="bfloat16",
                    help="device-resident dataset storage dtype; bfloat16 "
                         "halves HBM (48 train samples at 1080p are 4.0 GB "
                         "in f32 — that margin is what the train step needs)")
    args = ap.parse_args()

    from learned_hologram_gan_tpu.data import (
        ImgDepthAmpPhsDataset,
        dataset_to_device,
        device_epoch_loader,
    )
    from learned_hologram_gan_tpu.train import Watermelon
    from learned_hologram_gan_tpu.utils import set_seed

    os.makedirs(args.out, exist_ok=True)
    set_seed(122731)

    paths = lambda split: dict(  # noqa: E731
        img_path=f"{args.data}/{split}/img.bin",
        depth_path=f"{args.data}/{split}/depth.bin",
        amp_path=f"{args.data}/{split}/amp.bin",
        phs_path=f"{args.data}/{split}/phs.bin",
    )
    common = dict(channels_num=3, height=args.rows, width=args.cols)
    ds_train = ImgDepthAmpPhsDataset(samples_num=args.train_num,
                                     **paths("train"), **common)
    ds_val = ImgDepthAmpPhsDataset(samples_num=args.val_num,
                                   **paths("val"), **common)
    import jax.numpy as jnp
    data_dtype = jnp.bfloat16 if args.data_dtype == "bfloat16" else None
    dev_train = dataset_to_device(ds_train, dtype=data_dtype)
    dev_val = dataset_to_device(ds_val, dtype=data_dtype)

    epoch_seed = [122731]

    def loader_train():
        epoch_seed[0] += 1
        return device_epoch_loader(dev_train, args.batch_size, shuffle=True,
                                   drop_last=True, seed=epoch_seed[0])

    def loader_val():
        return device_epoch_loader(dev_val, args.batch_size, shuffle=False,
                                   drop_last=False)

    trainer = Watermelon(
        filter_radius_coefficient=0.45,
        pad_size=args.pad_size,
        distance_stack=np.linspace(-4e-4, 0.0, args.distances + 1)[:-1],
        pretrained_model_path_G=args.init or None,
        input_shape=(args.batch_size, 4, args.rows, args.cols),
        use_gan=False,
        perceptual="none",
        dtype=args.dtype,
        unet_base_features=args.unet_base_features,
        remat=True,
        cache_h=False,
    )
    t0 = time.time()
    trainer.train(
        data_loader_train=loader_train,
        data_loader_val=loader_val,
        phs_gradient_loss_weight=1,
        perceptual_loss_weight=0.0,
        pixel_loss_weight=1,
        TV_loss_weight=1e-3,
        discriminator_loss_weight=0.0,
        epoch_num=args.epochs,
        lr_G=args.lr,
        lr_D=args.lr,
        save_path_G=os.path.join(args.out, "generator.msgpack"),
        save_path_D=None,
        info_print_interval=24,
        info_plot_interval=10_000,
        loss_metrics_file=os.path.join(args.out, "history.json"),
        save_path_img=None,
        checkpoint_iterval=10_000,
        discriminator_train_ratio=1,
        discriminator_lambda=10,
        seed=122731,
    )
    wall = time.time() - t0
    print(f"1080p fine-tune: {args.epochs} epochs in {wall:.0f}s", flush=True)
    with open(os.path.join(args.out, "timings.json"), "w") as f:
        json.dump({"finetune_s": wall, "epochs": args.epochs,
                   "init": args.init}, f, indent=1)

    if not args.skip_eval:
        subprocess.run(
            [sys.executable, "tools/eval_quality.py",
             "--data", args.data, "--run_dir", args.out,
             "--rows", str(args.rows), "--cols", str(args.cols),
             "--pad_size", str(args.pad_size),
             "--val_num", str(args.val_num), "--batch", "1",
             "--dtype", args.dtype, "--num_planes", str(args.eval_planes),
             "--no_cache_h", "--samples", "0",
             "--unet_base_features", str(args.unet_base_features)],
            check=True,
        )


if __name__ == "__main__":
    main()

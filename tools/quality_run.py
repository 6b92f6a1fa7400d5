"""Config-of-record training run to hologram quality (round-2 VERDICT #1).

Reproduces the reference's documented workflow end-to-end on the synthetic
physically-consistent dataset (tools/make_synthetic_dataset.py):

  1. stage-1 pretrain RGBD2AP   (reference RGBD2AP.train_model :52-137)
  2. stage-2 pretrain AP2POH    (reference AP2POH.train_model :118-218)
  3. full WGAN-GP fine-tune at the config of record — 384x384, batch 4,
     500 samples, 50 epochs, lr 1e-3/1e-3, ratio 5, lambda 10, 20-plane
     stack linspace(-4e-4, 0, 21)[:-1], loss weights (1, 0.1, 1, 1e-3, 0.1)
     (reference README.md:47-67 + trainingModel.py:59-97)
  4. evaluation: tools/eval_quality.py (full-val 20-plane PSNR/SSIM,
     per-plane curves, focal-stack comparison grids)

Deviations from the reference objective, all pre-documented: single 2*pi
phase scaling (losses.amp_phs_loss), perceptual term from the explicit
``random``-VGG opt-in (ImageNet weights unobtainable offline — see
docs/perceptual_fallback.md), BN inference-stats inside the GP inner grad.

Run:  python tools/quality_run.py --out output/quality_run
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

import jax
import jax.numpy as jnp


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/synth384")
    ap.add_argument("--out", default="output/quality_run")
    ap.add_argument("--rows", type=int, default=384)
    ap.add_argument("--cols", type=int, default=384)
    ap.add_argument("--train_num", type=int, default=500)
    ap.add_argument("--val_num", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=4)   # README.md:47-67
    ap.add_argument("--val_batch", type=int, default=None,
                    help="validation batch (default min(batch_size//2, 2)): "
                         "the eval step reconstructs the FULL 20-plane stack "
                         "per sample, so its HBM footprint per sample is ~5x "
                         "the train step's random-distance subset; val batch "
                         "4 at train batch 8 OOMs a 16 GB chip")
    ap.add_argument("--stage1_epochs", type=int, default=30)
    ap.add_argument("--stage2_epochs", type=int, default=20)
    ap.add_argument("--gan_epochs", type=int, default=50)  # README.md:47-67
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--data_dtype", default="float32",
                    help="device-resident dataset storage dtype; 'bfloat16' "
                         "halves the HBM footprint (needed at batch 16)")
    ap.add_argument("--perceptual", default="random")
    ap.add_argument("--remat", action="store_true",
                    help="UNet activation checkpointing (HBM fallback)")
    ap.add_argument("--skip_stage1", action="store_true")
    ap.add_argument("--skip_stage2", action="store_true")
    ap.add_argument("--skip_gan", action="store_true")
    ap.add_argument("--skip_eval", action="store_true")
    ap.add_argument("--pad_size", type=int, default=320,
                    help="config of record: 320 (trainingModel.py:61); "
                         "shrink for CPU smoke runs")
    ap.add_argument("--num_planes", type=int, default=20,
                    help="distance-stack planes over [-4e-4, 0) "
                         "(trainingModel.py:62-66)")
    ap.add_argument("--unet_base_features", type=int, default=64,
                    help="reference UNet width (shrink for CPU smoke)")
    ap.add_argument("--streaming", action="store_true",
                    help="stream batches from the host memmap instead of the "
                         "device-resident path — required when resident data "
                         "+ the train step exceed HBM (batch 16).  The relay "
                         "pins every H2D buffer, so multi-hour streaming "
                         "runs must be CHUNKED: run N epochs per process "
                         "with --start_epoch/--gan_epochs and a shared "
                         "--out (resume state carries across processes).")
    ap.add_argument("--resident_shards", type=int, default=1,
                    help=">1: rotate the train set through HBM in N "
                         "contiguous shards (block-shuffled epochs) when "
                         "it cannot sit resident next to the train step "
                         "— the 3,800-sample bf16 set is 11.2 GB and "
                         "OOMs a 16 GB chip with the GAN step")
    ap.add_argument("--gan_checkpoint_interval", type=int, default=10,
                    help="epochs between GAN checkpoints/resume saves (a "
                         "full-state save fetches ~0.5 GB — on a degraded "
                         "relay link that is minutes, so short runs want "
                         "a smaller interval for wedge recovery, long "
                         "runs a larger one)")
    ap.add_argument("--info_interval", type=int, default=50,
                    help="batches between metric prints / validation passes "
                         "(validation is read-only; raise for long epochs)")
    ap.add_argument("--start_epoch", type=int, default=0,
                    help="first GAN epoch of this process (chunked runs); "
                         "loaders are seed-offset and resume skips its "
                         "O(epochs^2) data fast-forward")
    args = ap.parse_args()
    if args.streaming and not (args.skip_stage1 and args.skip_stage2):
        raise SystemExit("--streaming supports stage 3 only: run/skip the "
                         "pretrain stages with the device-resident path "
                         "(they fit HBM at any supported batch).")
    if args.val_batch is None:
        args.val_batch = min(max(args.batch_size // 2, 1), 2)

    from learned_hologram_gan_tpu.config import GeneratorConfig
    from learned_hologram_gan_tpu.data import (
        ImgDepthAmpPhsDataset,
        dataset_to_device,
        device_epoch_loader,
    )
    from learned_hologram_gan_tpu.models import (
        AP2POH,
        RGBD2AP,
        make_generator_plan,
    )
    from learned_hologram_gan_tpu.train import (
        Watermelon,
        train_ap2poh,
        train_rgbd2ap,
    )
    from learned_hologram_gan_tpu.utils import set_seed

    os.makedirs(args.out, exist_ok=True)
    stage1_path = os.path.join(args.out, "rgbd2ap.msgpack")
    stage2_path = os.path.join(args.out, "ap2poh.msgpack")
    t_all = time.time()
    timings = {}

    set_seed(122731)  # reference trainingModel.py:18
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    paths = lambda split: dict(  # noqa: E731
        img_path=f"{args.data}/{split}/img.bin",
        depth_path=f"{args.data}/{split}/depth.bin",
        amp_path=f"{args.data}/{split}/amp.bin",
        phs_path=f"{args.data}/{split}/phs.bin",
    )
    common = dict(channels_num=3, height=args.rows, width=args.cols)
    ds_train = ImgDepthAmpPhsDataset(
        samples_num=args.train_num, **paths("train"), **common)
    ds_val = ImgDepthAmpPhsDataset(
        samples_num=args.val_num, **paths("val"), **common)

    # Device-resident data: upload each split ONCE, gather batches on-device.
    # The streaming loader is unusable for multi-hour single-process runs on
    # this host: the axon relay pins every H2D batch buffer (~500 GB over 50
    # epochs; the first attempt was OOM-killed at 130 GB host RSS).  See
    # data/device.py.  --streaming + chunked processes is the escape hatch
    # when resident data + the train step exceed HBM (batch 16).
    epoch_seed = [122731 + args.start_epoch]

    if args.streaming:
        from learned_hologram_gan_tpu.data import epoch_loader

        dev_train, dev_val = ds_train, ds_val  # loader sources
        # --data_dtype bfloat16 halves the wire bytes per batch; on a
        # link-bound host (this relay: ~78 MB/s) that nearly doubles the
        # streaming cadence
        wire_dtype = jnp.bfloat16 if args.data_dtype == "bfloat16" else None

        def train_batches(ds, batch, start_epoch=0):  # start_epoch unused: streaming epochs are seed-offset
            def fn():
                epoch_seed[0] += 1
                return epoch_loader(ds, batch, shuffle=True, drop_last=True,
                                    seed=epoch_seed[0], dtype=wire_dtype)
            return fn

        def val_batches(ds, batch):
            return lambda: epoch_loader(ds, batch, shuffle=False,
                                        drop_last=False, dtype=wire_dtype)

        viz_sample = tuple(jnp.asarray(a) for a in ds_val.get(0))
    else:
        from learned_hologram_gan_tpu.data import RotatingDeviceDataset

        data_dtype = jnp.bfloat16 if args.data_dtype == "bfloat16" else None
        if args.resident_shards > 1:
            # dataset too large to sit resident next to the train step:
            # rotate contiguous shards through HBM (block-shuffled epochs;
            # see data/device.py RotatingDeviceDataset)
            dev_train = RotatingDeviceDataset(
                ds_train, shards=args.resident_shards, dtype=data_dtype)
        else:
            dev_train = dataset_to_device(ds_train, dtype=data_dtype)  # (rgbd, amp, phs01)
        dev_val = dataset_to_device(ds_val, dtype=data_dtype)

        def train_batches(source, batch, start_epoch=0):
            counter = [start_epoch]
            def fn():
                epoch_seed[0] += 1
                e = counter[0]
                counter[0] += 1
                if isinstance(source, RotatingDeviceDataset):
                    return source.epoch_loader(
                        batch, e, shuffle=True, drop_last=True,
                        seed=epoch_seed[0])
                return device_epoch_loader(source, batch, shuffle=True,
                                           drop_last=True, seed=epoch_seed[0])
            return fn

        def val_batches(arrays, batch):
            return lambda: device_epoch_loader(arrays, batch, shuffle=False,
                                               drop_last=False)

        viz_sample = tuple(a[0] for a in dev_val)

    # ------------------------------------------------------------------
    # stage 1: RGBD2AP pretrain
    # ------------------------------------------------------------------
    def stage_resume(path, total_epochs, template):
        """Wedge-recovery resume for a pretrain stage.

        A watchdog-killed stage restarts as a fresh process; the newest
        (by mtime) `<path>_epoch{k}` checkpoint lets it continue from the
        last saved epoch instead of repeating hours of work.  Cumulative
        progress lives in a `<path>.done` sidecar because each restarted
        run numbers its epoch files from 0 again.  Optimizer/scheduler
        state restarts — the same semantics as the reference's
        pretrained_model_path reload.  Returns (vars, epochs_remaining).
        """
        from flax import serialization

        root, ext = os.path.splitext(path)
        done_path = root + ".done"
        done = 0
        if os.path.exists(done_path):
            with open(done_path) as f:
                done = json.load(f)["done"]
        newest = None
        for k in range(total_epochs):
            p = f"{root}_epoch{k}{ext}"
            if os.path.exists(p):
                if newest is None or os.path.getmtime(p) > newest[2]:
                    newest = (k, p, os.path.getmtime(p))
        if done >= total_epochs:
            # stage already completed in a previous attempt: its final
            # save is on disk — do not retrain or overwrite it
            log(f"{path}: already complete ({done} epochs), skipping")
            return template, 0
        if newest is None:
            return template, total_epochs
        k, p, _ = newest
        done += k + 1
        with open(done_path, "w") as f:
            json.dump({"done": done}, f)
        with open(p, "rb") as f:
            loaded = serialization.from_bytes(template, f.read())
        # clear this run's epoch files so the next resume counts afresh
        for j in range(total_epochs):
            q = f"{root}_epoch{j}{ext}"
            if os.path.exists(q):
                os.remove(q)
        epoch_seed[0] += k + 1
        log(f"resuming {path} after {done} done epochs "
            f"({max(total_epochs - done, 0)} remain)")
        return loaded, max(total_epochs - done, 0)

    if not args.skip_stage1:
        log(f"stage 1: RGBD2AP pretrain, {args.stage1_epochs} epochs")
        t0 = time.time()
        model1 = RGBD2AP(base_features=args.unet_base_features, dtype=dtype,
                         remat=args.remat)
        rgbd0 = jnp.zeros((1, 4, args.rows, args.cols), jnp.float32)
        variables = model1.init(jax.random.key(0), rgbd0, train=False)
        tpl = {"params": variables["params"],
               "batch_stats": variables["batch_stats"]}
        tpl, s1_epochs = stage_resume(stage1_path, args.stage1_epochs, tpl)
        if s1_epochs > 0:
            _, _, tr_hist, val_hist = train_rgbd2ap(
                model1, tpl["params"], tpl["batch_stats"],
                train_batches(dev_train, args.batch_size),
                val_batches(dev_val, args.val_batch),
                epochs=s1_epochs, lr=1e-3, alpha=1e-3,
                save_path=stage1_path, checkpoint_iterval=5,
            )
            with open(os.path.splitext(stage1_path)[0] + ".done", "w") as f:
                json.dump({"done": args.stage1_epochs}, f)
            timings["stage1_s"] = time.time() - t0
            with open(os.path.join(args.out, "stage1_history.json"), "w") as f:
                json.dump({"train": tr_hist, "val": val_hist}, f)
            if val_hist:
                log(f"stage 1 done in {timings['stage1_s']:.0f}s: "
                    f"val {val_hist[0]:.5f} -> {val_hist[-1]:.5f}")

    # ------------------------------------------------------------------
    # stage 2: AP2POH pretrain
    # ------------------------------------------------------------------
    if not args.skip_stage2:
        log(f"stage 2: AP2POH pretrain, {args.stage2_epochs} epochs")
        t0 = time.time()
        cfg = GeneratorConfig(
            rows=args.rows, cols=args.cols, pad_size=args.pad_size,
            filter_radius_coefficient=0.45, dtype=args.dtype,
        )
        plan = make_generator_plan(cfg)
        model2 = AP2POH(kernel_size=3, dtype=dtype)
        amp0 = jnp.zeros((1, 3, args.rows, args.cols), jnp.float32)
        variables = model2.init(jax.random.key(0), plan, amp0, amp0)
        # AmpPhsDataset semantics from the resident stage-1 arrays: (amp,
        # 2*pi*phs01), scaled on-device (reference data_loader.py:83).
        # Scale per BATCH, not by materializing a 2*pi copy of the whole
        # resident phs field — at 3,800 samples that copy is an extra
        # 3.35 GB of HBM the 16 GB chip can't spare.
        if args.streaming or args.resident_shards <= 1:
            dev2_train = (dev_train[1], dev_train[2])
        else:
            # rotating-residency run: stage 2 only needs (amp, phs01) —
            # 6/10 of the fields fit resident in full; free the rotating
            # shard first so the two never coexist in HBM
            dev_train.evict()

            class _AmpPhsView:
                def __len__(self):
                    return len(ds_train)

                def get(self, i):
                    _, amp, phs01 = ds_train.get(i)
                    return (amp, phs01)

            dev2_train = dataset_to_device(_AmpPhsView(), dtype=data_dtype)
        dev2_val = (dev_val[1], dev_val[2])

        def scaled(loader_fn):
            def fn():
                return ((amp, 2.0 * jnp.pi * phs01)
                        for amp, phs01 in loader_fn())
            return fn

        # pretrain epoch checkpoints serialize {"params", "batch_stats"}
        # (train/pretrain.py _loop) even for the stat-less AP2POH
        tpl2 = {"params": variables["params"], "batch_stats": {}}
        tpl2, s2_epochs = stage_resume(stage2_path, args.stage2_epochs, tpl2)
        if s2_epochs > 0:
            _, _, tr_hist, val_hist = train_ap2poh(
                model2, plan, tpl2["params"],
                scaled(train_batches(dev2_train, args.batch_size)),
                scaled(val_batches(dev2_val, args.val_batch)),
                filter_radius_coefficient=0.45,
                epochs=s2_epochs, lr=1e-3, alpha=1e-3, beta=1e-5,
                save_path=stage2_path, checkpoint_iterval=10,
            )
            with open(os.path.splitext(stage2_path)[0] + ".done", "w") as f:
                json.dump({"done": args.stage2_epochs}, f)
            timings["stage2_s"] = time.time() - t0
            with open(os.path.join(args.out, "stage2_history.json"), "w") as f:
                json.dump({"train": tr_hist, "val": val_hist}, f)
            if val_hist:
                log(f"stage 2 done in {timings['stage2_s']:.0f}s: "
                    f"val {val_hist[0]:.5f} -> {val_hist[-1]:.5f}")

    # ------------------------------------------------------------------
    # stage 3: full WGAN-GP fine-tune, config of record
    # ------------------------------------------------------------------
    if not args.skip_gan:
        log(f"stage 3: WGAN-GP config of record, {args.gan_epochs} epochs")
        if not args.streaming and args.resident_shards > 1:
            # free stage 2's full amp/phs residency before the GAN step
            # re-uploads its rotating shard
            try:
                for a in dev2_train:
                    a.delete()
            except NameError:
                pass  # stage 2 skipped in this process
        t0 = time.time()
        trainer = Watermelon(
            filter_radius_coefficient=0.45,                   # trainingModel.py:60
            pad_size=args.pad_size,                           # :61
            distance_stack=np.linspace(-4e-4, 0.0, args.num_planes + 1)[:-1],  # :62-66
            input_shape=(args.batch_size, 4, args.rows, args.cols),
            use_gan=True,
            perceptual=args.perceptual,
            dtype=args.dtype,
            remat=args.remat,
            unet_base_features=args.unet_base_features,
            pretrained_part1_path=stage1_path if os.path.exists(stage1_path) else None,
            pretrained_part2_path=stage2_path if os.path.exists(stage2_path) else None,
        )
        img_dir = os.path.join(args.out, "imgs")
        os.makedirs(img_dir, exist_ok=True)
        trainer.train(
            data_loader_train=train_batches(dev_train, args.batch_size,
                                            start_epoch=args.start_epoch),
            data_loader_val=val_batches(dev_val, args.val_batch),
            phs_gradient_loss_weight=1,                       # :76-97 weights
            perceptual_loss_weight=1e-1,
            pixel_loss_weight=1,
            TV_loss_weight=1e-3,
            discriminator_loss_weight=1e-1,
            epoch_num=args.gan_epochs,
            lr_G=1e-3,
            lr_D=1e-3,
            save_path_G=os.path.join(args.out, "generator.msgpack"),
            save_path_D=os.path.join(args.out, "discriminator.msgpack"),
            info_print_interval=args.info_interval,
            info_plot_interval=250,
            loss_metrics_file=os.path.join(args.out, "history.json"),
            save_path_img=img_dir,
            checkpoint_iterval=args.gan_checkpoint_interval,
            discriminator_train_ratio=5,
            discriminator_lambda=10,
            visualization_RGBD_AP=viz_sample,
            seed=122731,
            resume_dir=os.path.join(args.out, "resume"),
            start_epoch=args.start_epoch,
            resume_data_fast_forward=args.start_epoch == 0,
        )
        timings["gan_s"] = time.time() - t0
        log(f"stage 3 done in {timings['gan_s']:.0f}s")

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    if not args.skip_eval:
        log("eval: tools/eval_quality.py")
        subprocess.run(
            [sys.executable, "tools/eval_quality.py",
             "--data", args.data, "--run_dir", args.out,
             "--rows", str(args.rows), "--cols", str(args.cols),
             "--val_num", str(args.val_num), "--dtype", args.dtype,
             "--pad_size", str(args.pad_size),
             "--num_planes", str(args.num_planes),
             "--unet_base_features", str(args.unet_base_features)],
            check=True,
        )

    timings["total_s"] = time.time() - t_all
    with open(os.path.join(args.out, "timings.json"), "w") as f:
        json.dump(timings, f, indent=1)
    log(f"quality run complete in {timings['total_s']:.0f}s")


if __name__ == "__main__":
    main()

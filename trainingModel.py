#!/usr/bin/env python
"""Train the hologram generator (flag parity with the reference trainingModel.py).

Like the reference CLI (which imports ``watermelon_without_GAN`` under the
alias ``watermelon``, reference trainingModel.py:4), the default trainer is
the non-adversarial variant; pass ``--use_gan`` to run the full WGAN-GP loop.
All reference flags are accepted with the same names, defaults, and
semantics; extras added by the TPU rebuild are listed under "TPU options".
"""

import argparse
import os

import numpy as np


def check_and_create_folder(path):
    if path and not os.path.exists(path):
        print(f"Folder {path} does not exist, creating it...")
        os.makedirs(path)


def train_gan(args):
    # heavy imports after arg parsing so --help stays fast
    from learned_hologram_gan_tpu.data import ImgDepthAmpPhsDataset, epoch_loader
    from learned_hologram_gan_tpu.parallel import batch_sharding, make_mesh
    from learned_hologram_gan_tpu.train import Watermelon

    dataset_train = ImgDepthAmpPhsDataset(
        img_path=args.train_img_path,
        depth_path=args.train_depth_path,
        amp_path=args.train_amp_path,
        phs_path=args.train_phs_path,
        samples_num=args.samplesNum,
        channels_num=args.channlesNum,
        height=args.height,
        width=args.width,
    )
    dataset_validate = ImgDepthAmpPhsDataset(
        img_path=args.validate_img_path,
        depth_path=args.validate_depth_path,
        amp_path=args.validate_amp_path,
        phs_path=args.validate_phs_path,
        samples_num=100,  # reference trainingModel.py:46
        channels_num=args.channlesNum,
        height=args.height,
        width=args.width,
    )

    sharding = None
    if args.mesh_devices:
        mesh = make_mesh(args.mesh_devices)
        sharding = batch_sharding(mesh)

    seed = 122731  # reference trainingModel.py:18
    epoch_seed = [seed]

    if args.device_resident_data:
        # Upload both splits to HBM once; batches are on-device gathers.
        # Required for multi-hour runs on relay-attached hosts (every H2D
        # batch transfer pins its host buffer — see data/device.py) and
        # faster everywhere the dataset fits HBM.
        from learned_hologram_gan_tpu.data import (
            dataset_to_device,
            device_epoch_loader,
        )

        if sharding is not None:
            raise SystemExit(
                "--device_resident_data with --mesh_devices is not supported "
                "yet: resident arrays would need per-device sharding. Use "
                "the streaming loader under a mesh."
            )
        dev_train = dataset_to_device(dataset_train)
        dev_val = dataset_to_device(dataset_validate)

        def loader_train():
            epoch_seed[0] += 1
            return device_epoch_loader(
                dev_train, args.batch_size, shuffle=True, drop_last=True,
                seed=epoch_seed[0],
            )

        def loader_val():
            return device_epoch_loader(
                dev_val, max(args.batch_size // 2, 1), shuffle=False,
                drop_last=False,
            )
    else:
        def loader_train():
            epoch_seed[0] += 1
            return epoch_loader(
                dataset_train, args.batch_size, shuffle=True, drop_last=True,
                seed=epoch_seed[0], sharding=sharding,
            )

        def loader_val():
            return epoch_loader(
                dataset_validate, max(args.batch_size // 2, 1), shuffle=False,
                drop_last=False, sharding=sharding,
            )

    trainer = Watermelon(
        filter_radius_coefficient=0.45,              # reference :60
        pad_size=320,                                # reference :61
        distance_stack=np.linspace(-4e-4, 0.0, 21)[:-1],  # reference :62
        pretrained_model_path_G=args.pretrained_G,
        pretrained_model_path_D=args.pretrained_D,
        pretrained_part1_path=args.pretrained_part1,
        pretrained_part2_path=args.pretrained_part2,
        freeze_part1=args.freeze_part1,
        input_shape=(1, 4, args.height, args.width),
        use_gan=args.use_gan,
        perceptual=args.perceptual,
        perceptual_weights_path=args.perceptual_weights,
        dtype=args.dtype,
        unet_base_features=args.unet_base_features,
        remat=args.remat,
        cache_h=not args.no_cache_h,
        spatial_mesh=(make_mesh(args.spatial_mesh_devices)
                      if args.spatial_mesh_devices else None),
        critic_batching=args.critic_batching,
        two_h_hat=args.two_h_hat,
        polyphase_level0=args.polyphase_level0,
    )

    check_and_create_folder(os.path.dirname(args.save_path_G))
    check_and_create_folder(os.path.dirname(args.save_path_D))
    check_and_create_folder(os.path.dirname(args.loss_metrics_file))
    check_and_create_folder(args.save_path_img)

    trainer.train(
        data_loader_train=loader_train,
        data_loader_val=loader_val,
        phs_gradient_loss_weight=1,                  # reference :76-97 weights
        perceptual_loss_weight=1e-1,
        pixel_loss_weight=1,
        TV_loss_weight=1e-3,
        discriminator_loss_weight=1e-1,
        epoch_num=args.epoch_num,
        lr_G=args.lr_G,
        lr_D=args.lr_D,
        save_path_G=args.save_path_G,
        save_path_D=args.save_path_D,
        info_print_interval=50,
        info_plot_interval=50,
        loss_metrics_file=args.loss_metrics_file,
        save_path_img=args.save_path_img,
        checkpoint_iterval=1,
        discriminator_train_ratio=5,
        discriminator_lambda=10,
        step_scheduler_G_gamma=0.9999,
        step_scheduler_D_gamma=0.9999,
        visualization_RGBD_AP=dataset_validate[0],
        seed=seed,
        resume_dir=args.resume_dir,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Train a GAN model for hologram generation."
    )

    # required arguments (names identical to the reference CLI)
    parser.add_argument('--train_img_path', type=str, required=True, help="Path to training image binary file.")
    parser.add_argument('--train_depth_path', type=str, required=True, help="Path to training depth binary file.")
    parser.add_argument('--train_amp_path', type=str, required=True, help="Path to training amplitude binary file.")
    parser.add_argument('--train_phs_path', type=str, required=True, help="Path to training phase binary file.")

    parser.add_argument('--validate_img_path', type=str, required=True, help="Path to validation image binary file.")
    parser.add_argument('--validate_depth_path', type=str, required=True, help="Path to validation depth binary file.")
    parser.add_argument('--validate_amp_path', type=str, required=True, help="Path to validation amplitude binary file.")
    parser.add_argument('--validate_phs_path', type=str, required=True, help="Path to validation phase binary file.")

    parser.add_argument('--samplesNum', type=int, required=True, help="Number of samples in the dataset.")
    parser.add_argument('--channlesNum', type=int, required=True, help="Number of channels.")
    parser.add_argument('--height', type=int, required=True, help="Image height.")
    parser.add_argument('--width', type=int, required=True, help="Image width.")

    # optional arguments
    parser.add_argument('--batch_size', type=int, default=4, help="Batch size for training. Default is 4.")
    parser.add_argument('--lr_G', type=float, default=1e-3, help="Learning rate for generator. Default is 1e-3.")
    parser.add_argument('--lr_D', type=float, default=1e-3, help="Learning rate for discriminator. Default is 1e-3.")
    parser.add_argument('--epoch_num', type=int, default=50, help="Number of training epochs. Default is 50.")

    # output paths
    parser.add_argument('--save_path_G', type=str, required=True, help="Path to save the generator model.")
    parser.add_argument('--save_path_D', type=str, required=True, help="Path to save the discriminator model.")
    parser.add_argument('--loss_metrics_file', type=str, required=True, help="Path to save the loss metrics file.")
    parser.add_argument('--save_path_img', type=str, required=True, help="Path to save generated images.")

    # TPU options (extensions beyond the reference CLI)
    parser.add_argument('--use_gan', action='store_true',
                        help="Train the full WGAN-GP variant (reference default is without GAN).")
    parser.add_argument('--perceptual', type=str, default='vgg19',
                        choices=['vgg19', 'random', 'none'],
                        help="Perceptual loss backend. 'vgg19' needs converted weights "
                             "(tools/convert_vgg19.py); 'random' is the explicit "
                             "untrained-VGG opt-in; 'none' disables the term.")
    parser.add_argument('--perceptual_weights', type=str, default=None,
                        help="Path to VGG19 weights npz (see tools/convert_vgg19.py).")
    parser.add_argument('--dtype', type=str, default='float32', choices=['float32', 'bfloat16'],
                        help="Conv compute dtype (bfloat16 recommended on TPU).")
    parser.add_argument('--mesh_devices', type=int, default=0,
                        help="Data-parallel over this many devices (0 = single device).")
    parser.add_argument('--spatial_mesh_devices', type=int, default=0,
                        help="Spatially shard every propagation FFT over this many "
                             "devices (pencil FFT; the 4K-training mode — the count "
                             "must divide both padded dims). 0 = off.")
    parser.add_argument('--unet_base_features', type=int, default=64,
                        help="UNet width multiplier (reference architecture = 64).")
    parser.add_argument('--pretrained_G', type=str, default=None,
                        help="Whole-generator pretrained msgpack (reference "
                             "watermelon.py:84-90).")
    parser.add_argument('--pretrained_D', type=str, default=None,
                        help="Discriminator pretrained msgpack.")
    parser.add_argument('--pretrained_part1', type=str, default=None,
                        help="Stage-1 (RGBD2AP) pretrained msgpack — the "
                             "two-stage pretrain->fine-tune workflow "
                             "(reference generator.py:26-28).")
    parser.add_argument('--pretrained_part2', type=str, default=None,
                        help="Stage-2 (AP2POH) pretrained msgpack.")
    parser.add_argument('--freeze_part1', action='store_true',
                        help="Freeze the stage-1 (RGBD2AP) parameters during "
                             "fine-tuning (reference RGBD2AP.py:37-41): the "
                             "generator optimizer zeroes every part1 update.")
    parser.add_argument('--resume_dir', type=str, default=None,
                        help="Directory for full-train-state checkpoints; restarting "
                             "with the same value resumes from the latest one.")
    parser.add_argument('--critic_batching', type=str, default='pair',
                        choices=['separate', 'pair', 'full'],
                        help="WGAN-GP critic apply structure per iteration "
                             "(see train/steps.py; 'pair' measured fastest).")
    parser.add_argument('--two_h_hat', action='store_true',
                        help="Fold the fixed and focal transfer functions of "
                             "the hat branch into one (skips the padded-"
                             "spectrum round trip; O(1e-3) numeric deviation).")
    parser.add_argument('--polyphase_level0', action='store_true',
                        help="Compute UNet level 0 in the space-to-depth "
                             "phase domain (exact, same checkpoint tree; "
                             "measured slower on v5e/this-XLA — see "
                             "BASELINE.md round-3 conv study — kept for "
                             "other chips/compilers).")
    parser.add_argument('--device_resident_data', action='store_true',
                        help="Upload the whole dataset to device HBM once and "
                             "gather batches on-device (zero per-step H2D; "
                             "needed for multi-hour runs on relay hosts).")
    parser.add_argument('--remat', action='store_true',
                        help="Activation checkpointing through the UNet (high-res training).")
    parser.add_argument('--no_cache_h', action='store_true',
                        help="Compute the ASM transfer function on the fly instead of "
                             "caching the H stack in HBM (high-res / large distance stacks).")

    train_gan(parser.parse_args())

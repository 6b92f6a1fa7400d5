#!/usr/bin/env python
"""Generate a phase-only hologram and optionally propagate a focal stack.

Flag parity with the reference generatePOH.py (argparse names, defaults, and
behavior: load RGBD sample by index -> Generator forward -> save POH ->
optional multi-distance band-limited ASM propagation with unit amplitude ->
normalized PNG stack).  The POH is saved as ``.npy`` unless the output path
ends in ``.pt`` and torch is importable, in which case a torch tensor is
written for bit-level interchange with the reference toolchain.
"""

import argparse
import os


def save_poh(poh_np, path):
    if path.endswith(".pt"):
        try:
            import torch

            torch.save(torch.from_numpy(poh_np), path)
            return
        except ImportError:
            print("torch unavailable; writing numpy format instead")
    import numpy as np

    with open(path, "wb") as f:
        np.save(f, poh_np)


def main(args):
    import jax.numpy as jnp
    import numpy as np

    from learned_hologram_gan_tpu.config import GeneratorConfig, OpticsConfig
    from learned_hologram_gan_tpu.data import ImgDepthDataset
    from learned_hologram_gan_tpu.models import Generator, make_generator_plan
    from learned_hologram_gan_tpu.ops import asm
    from learned_hologram_gan_tpu.train import build_infer_fn, checkpoint as ckpt_lib, create_train_state
    from learned_hologram_gan_tpu.utils import tensor_normalizor_2d
    from learned_hologram_gan_tpu.utils.plotting import multi_sample_plotter
    import optax

    dataset_test = ImgDepthDataset(
        img_path=args.img_path,
        depth_path=args.depth_path,
        samples_num=args.samplesNum,
        channels_num=3,
        height=args.sample_row_num,
        width=args.sample_col_num,
    )

    gen_config = GeneratorConfig(
        rows=args.sample_row_num,
        cols=args.sample_col_num,
        pad_size=args.pad_size,
        filter_radius_coefficient=0.45,  # reference generatePOH.py:30
        pixel_pitch=args.pixel_pitch,
        wavelengths=tuple(args.wave_length),
        distance=args.distance,
        dtype=args.dtype,
        unet_base_features=args.unet_base_features,
    )
    generator = Generator(gen_config)
    gen_plan = make_generator_plan(gen_config)

    tx = optax.adam(1e-3)
    state = create_train_state(
        0, generator, _null_disc(), gen_plan, tx, tx,
        input_shape=(1, 4, args.sample_row_num, args.sample_col_num),
    )
    if args.model_path is not None and os.path.exists(args.model_path):
        state = ckpt_lib.load_generator(state, args.model_path)
        print(f"Generator loaded from {args.model_path}")
    elif args.model_path is not None:
        print(f"WARNING: model path {args.model_path} not found; using random init")

    infer = build_infer_fn(generator)
    rgbd = jnp.asarray(dataset_test[args.index])[None]
    poh = infer(state.params_G, state.batch_stats_G, gen_plan, rgbd)

    poh_np = np.asarray(poh[0])
    save_poh(poh_np, args.poh_output_path)
    print(f"POH data saved at {args.poh_output_path}")

    if args.propagate:
        optics = OpticsConfig(
            rows=args.sample_row_num,
            cols=args.sample_col_num,
            pad_size=args.pad_size,
            filter_radius_coefficient=args.filter_radius_coefficient,
            pixel_pitch=args.pixel_pitch,
            wavelengths=tuple(args.wave_length),
        )
        distances = np.linspace(args.min_distance, args.max_distance, args.num_intervals)
        plan = asm.make_plan(optics, distances=distances)

        if args.mesh_devices:
            from learned_hologram_gan_tpu.parallel import make_mesh, shard_distance_stack

            plan = shard_distance_stack(plan, make_mesh(args.mesh_devices))

        amp_ones = jnp.ones_like(poh)
        amp_hat = asm.propagate_batch_multi(plan, amp_ones, poh)
        imgs = np.asarray(tensor_normalizor_2d(amp_hat))
        multi_sample_plotter(imgs, titles=None, save_dir=args.output_image_dir)
        print(f"Propagated images saved at {args.output_image_dir}")


def _null_disc():
    from learned_hologram_gan_tpu.models import FakeDiscriminator

    return FakeDiscriminator()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Script for generating and propagating POH"
    )

    # Required user input arguments (identical to reference)
    parser.add_argument("--img_path", type=str, required=True, help="Path to the input img.bin file")
    parser.add_argument("--depth_path", type=str, required=True, help="Path to the input depth.bin file")
    parser.add_argument("--index", type=int, required=True, help="Index of the sample to generate POH for")
    parser.add_argument("--model_path", type=str, required=True, help="Path to the pretrained model")
    parser.add_argument("--poh_output_path", type=str, required=True, help="Path to save the generated POH")

    # Optional generator parameters
    parser.add_argument("--samplesNum", type=int, default=100, help="Number of samples")
    parser.add_argument("--sample_row_num", type=int, default=384, help="Number of sample rows")
    parser.add_argument("--sample_col_num", type=int, default=384, help="Number of sample columns")
    parser.add_argument("--pad_size", type=int, default=320, help="Padding size")
    parser.add_argument("--pixel_pitch", type=float, default=3.74e-6, help="Pixel pitch")
    parser.add_argument("--wave_length", nargs="+", type=float,
                        default=[638e-9, 520e-9, 450e-9], help="Wavelengths for RGB channels")
    parser.add_argument("--distance", type=float, default=1e-3, help="Distance for propagation")
    parser.add_argument("--filter_radius_coefficient", type=float, default=0.35,
                        help="Filter radius coefficient")

    # Optional propagation parameters
    parser.add_argument("--propagate", action="store_true", help="Flag to enable propagation")
    parser.add_argument("--min_distance", type=float, default=4e-4, help="Minimum distance for propagation")
    parser.add_argument("--max_distance", type=float, default=10e-4, help="Maximum distance for propagation")
    parser.add_argument("--num_intervals", type=int, default=1, help="Number of intervals for propagation distances")
    parser.add_argument("--output_image_dir", type=str, default=None, help="Directory to save propagated images")

    # TPU options (extensions beyond the reference CLI)
    parser.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--unet_base_features", type=int, default=64,
                        help="UNet width multiplier (reference architecture = 64).")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="Shard the focal-stack distance axis over this many devices.")

    main(parser.parse_args())

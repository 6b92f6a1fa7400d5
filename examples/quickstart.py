#!/usr/bin/env python
"""End-to-end quickstart on synthetic data (no dataset download needed).

Runs in ~a minute on CPU (set JAX_PLATFORMS=cpu) and exercises the whole
stack the way the reference's README walkthrough does: build the trainer,
train a few non-adversarial steps at toy size, checkpoint, reload, generate a
POH, and propagate a focal stack to PNGs.
"""

import os
import sys

import numpy as np

# allow running straight from a checkout: examples/.. is the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_dir="output/quickstart"):
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.ops import asm
    from learned_hologram_gan_tpu.train import Watermelon, checkpoint as ckpt
    from learned_hologram_gan_tpu.utils import tensor_normalizor_2d
    from learned_hologram_gan_tpu.utils.plotting import multi_sample_plotter

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)

    def batches(n):
        return [
            (
                rng.random((2, 4, 32, 32)).astype(np.float32),   # RGBD
                rng.random((2, 3, 32, 32)).astype(np.float32),   # target amp
                rng.random((2, 3, 32, 32)).astype(np.float32),   # target phs [0,1]
            )
            for _ in range(n)
        ]

    trainer = Watermelon(
        filter_radius_coefficient=0.45,
        pad_size=16,
        distance_stack=np.linspace(-4e-4, 0.0, 9)[:-1],
        input_shape=(2, 4, 32, 32),
        use_gan=False,            # reference CLI default (watermelon_without_GAN)
        perceptual="none",        # enable "vgg19" once weights are converted
        unet_base_features=8,     # toy width; the reference architecture is 64
    )

    history = trainer.train(
        data_loader_train=lambda: iter(batches(4)),
        data_loader_val=lambda: iter(batches(1)),
        epoch_num=2,
        info_print_interval=2,
        checkpoint_iterval=1,
        save_path_G=os.path.join(out_dir, "G.msgpack"),
        save_path_D=None,
        loss_metrics_file=os.path.join(out_dir, "history.json"),
    )
    print("final G loss:", history["train_losses_tensor"]["G_loss"][-1])

    # reload the checkpoint and run inference + focal-stack propagation
    trainer2 = Watermelon(
        filter_radius_coefficient=0.45, pad_size=16,
        distance_stack=np.linspace(-4e-4, 0.0, 9)[:-1],
        input_shape=(1, 4, 32, 32), use_gan=False, perceptual="none",
        unet_base_features=8,
        pretrained_model_path_G=os.path.join(out_dir, "G.msgpack"),
    )
    rgbd = jnp.asarray(rng.random((1, 4, 32, 32)).astype(np.float32))
    poh = trainer2.generate(rgbd)
    print("POH:", poh.shape)

    plan = asm.make_plan(
        trainer2.gen_config.optics(), distances=np.linspace(4e-4, 1e-3, 4)
    )
    recon = asm.propagate_batch_multi(plan, jnp.ones_like(poh), poh)
    paths = multi_sample_plotter(
        np.asarray(tensor_normalizor_2d(recon)), save_dir=out_dir
    )
    print("focal stack PNGs:", paths)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Quantify the random-VGG perceptual term (docs/perceptual_fallback.md).

Pretrained VGG19 weights cannot be obtained in this environment (no network
egress, no torchvision), so the reference's perceptual objective
(loss_func.py:12-51) cannot be reproduced exactly.  This study bounds what
the *random*-VGG stand-in (explicit ``perceptual='random'`` opt-in) does to
training: two otherwise-identical short runs — one with the random-VGG term
at the reference weight (0.1), one without the term — and reports the
PSNR/SSIM/pixel-loss deltas.

Run on CPU (JAX_PLATFORMS=cpu); tiny config so it finishes in minutes:

    JAX_PLATFORMS=cpu python tools/perceptual_study.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU study: the env may pre-import jax against a TPU (sitecustomize), so
# the env var alone is not enough — update the live config too.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def run(perceptual: str, steps: int = 24, seed: int = 7):
    from learned_hologram_gan_tpu.train import Watermelon

    rng = np.random.default_rng(123)
    batches = [
        (
            rng.random((2, 4, 32, 32)).astype(np.float32),
            rng.random((2, 3, 32, 32)).astype(np.float32),
            rng.random((2, 3, 32, 32)).astype(np.float32),
        )
        for _ in range(steps)
    ]
    trainer = Watermelon(
        filter_radius_coefficient=0.45,
        pad_size=8,
        distance_stack=np.linspace(-4e-4, 0.0, 9)[:-1],
        input_shape=(2, 4, 32, 32),
        use_gan=False,
        perceptual=perceptual,
        unet_base_features=8,
        feature_d=4,
    )
    hist = trainer.train(
        data_loader_train=lambda: iter(batches),
        data_loader_val=lambda: iter(batches[:2]),
        perceptual_loss_weight=1e-1,  # reference trainingModel.py:94
        epoch_num=1,
        info_print_interval=4,
        checkpoint_iterval=10,
        seed=seed,
    )
    return hist


def main():
    results = {}
    for mode in ("none", "random"):
        hist = run(mode)
        results[mode] = {
            "final_PSNR": hist["train_metrics_tensor"]["PSNR"][-1],
            "final_SSIM": hist["train_metrics_tensor"]["SSIM"][-1],
            "final_pixel_loss": hist["train_losses_tensor"]["pixel_loss"][-1],
            "final_perceptual_loss": hist["train_losses_tensor"]["perceptual_loss"][-1],
            "PSNR_trajectory": hist["train_metrics_tensor"]["PSNR"],
        }
    delta = {
        k: results["random"][f"final_{k}"] - results["none"][f"final_{k}"]
        for k in ("PSNR", "SSIM", "pixel_loss")
    }
    print(json.dumps({"runs": results, "random_minus_none": delta}, indent=2))


if __name__ == "__main__":
    main()

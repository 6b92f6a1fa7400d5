#!/usr/bin/env python
"""Convert torchvision VGG19 feature weights to the npz layout this repo loads.

Run this in any environment with torchvision installed:

    python tools/convert_vgg19.py --out weights/vgg19_features.npz

The output feeds ``learned_hologram_gan_tpu.losses.perceptual.load_vgg19_params``:
keys conv_{i}_kernel (HWIO) / conv_{i}_bias for the 14 conv layers through
relu5_2 (torchvision ``features`` indices 0..30).
"""

import argparse
import os


def main(out_path: str) -> None:
    import numpy as np
    import torch
    import torchvision

    vgg = torchvision.models.vgg19(
        weights=torchvision.models.VGG19_Weights.DEFAULT
    ).features.eval()

    arrays = {}
    conv_idx = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            # torch OIHW -> flax HWIO
            k = layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            arrays[f"conv_{conv_idx}_kernel"] = k.astype(np.float32)
            arrays[f"conv_{conv_idx}_bias"] = (
                layer.bias.detach().numpy().astype(np.float32)
            )
            conv_idx += 1
            if conv_idx == 14:  # through conv5_2 (relu5_2 tap)
                break

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **arrays)
    print(f"wrote {conv_idx} conv layers to {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="weights/vgg19_features.npz")
    args = p.parse_args()
    main(args.out)

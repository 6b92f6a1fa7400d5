#!/usr/bin/env python
"""Convert reference (WeijieXie/learned_hologram_gan) checkpoints to this repo.

Maps a torch ``state_dict`` saved by the reference pipeline onto this
framework's Flax parameter tree and writes the msgpack file that
``pretrained_model_path_G/D`` / ``generatePOH.py --model_path`` consume.

Supported checkpoint kinds (``--kind``):
  generator       reference Generator (generator.py:15) — part1 RGBD2AP UNet +
                  part2 AP2POH symmetric convs
  rgbd2ap         stage-1 only (RGBD2AP.py:15)
  ap2poh          stage-2 only (AP2POH.py:16)
  discriminator   WGANGPDiscriminator192 (discriminator.py:5)

Usage:
    python tools/convert_reference_weights.py --kind generator \
        --in watermelon_GAN_GENERATOR.pth --out G.msgpack

Key-map summary (torch -> flax):
  UNet  encoder{i+1}.{0|1}.<ResidualBlock>   -> unet/enc_{i}/...
        bottleneck.1 / bottleneck.2 (ConvT)  -> unet/bottleneck, unet/ConvTranspose_0
        decoder{j}.0 / decoder{j}.1 (ConvT)  -> unet/dec_{4-j}, unet/ConvTranspose_{j}
        final_layer.0                        -> unet/Conv_0
  ResidualBlock convolution_layer_{1,2,3}    -> Conv_{0,1,2}
                batch_norm_layer_{1,2}       -> BatchNorm_{0,1} (+ batch_stats)
  AP2POH part1.conv_{r,g,b}.{params,bias}    -> modulation/conv_{r,g,b}/
                                                {radial_weights,bias}
  Critic block1.0, block{2..6}.{0,1}, conv   -> Conv_0..6 + BatchNorm_0..4

Conv kernels transpose OIHW -> HWIO; ConvTranspose IOHW -> HWIO.
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple


def _conv(sd, prefix):
    import numpy as np

    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].numpy().transpose(2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"].numpy()
    return out


def _conv_t(sd, prefix):
    import numpy as np

    # torch ConvTranspose2d weight: (in, out, kh, kw) -> flax (kh, kw, in, out)
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].numpy().transpose(2, 3, 0, 1))}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"].numpy()
    return out


def _bn(sd, prefix) -> Tuple[dict, dict]:
    params = {
        "scale": sd[prefix + ".weight"].numpy(),
        "bias": sd[prefix + ".bias"].numpy(),
    }
    stats = {
        "mean": sd[prefix + ".running_mean"].numpy(),
        "var": sd[prefix + ".running_var"].numpy(),
    }
    return params, stats


def _residual_block(sd, prefix) -> Tuple[dict, dict]:
    params, stats = {}, {}
    params["Conv_0"] = _conv(sd, prefix + ".convolution_layer_1")
    params["Conv_1"] = _conv(sd, prefix + ".convolution_layer_2")
    if prefix + ".convolution_layer_3.weight" in sd:
        params["Conv_2"] = _conv(sd, prefix + ".convolution_layer_3")
    p0, s0 = _bn(sd, prefix + ".batch_norm_layer_1")
    p1, s1 = _bn(sd, prefix + ".batch_norm_layer_2")
    params["BatchNorm_0"], stats["BatchNorm_0"] = p0, s0
    params["BatchNorm_1"], stats["BatchNorm_1"] = p1, s1
    return params, stats


def convert_unet(sd, prefix="part1.") -> Tuple[dict, dict]:
    """Reference UNet (neural_network_components.py:241-315) -> our UNet tree."""
    params, stats = {}, {}
    # encoder1 has no MaxPool prefix; encoders 2..4 are Sequential(pool, block)
    for i in range(4):
        sub = f"{prefix}encoder{i+1}.{0 if i == 0 else 1}.0"
        params[f"enc_{i}"], stats[f"enc_{i}"] = _residual_block(sd, sub)
    params["bottleneck"], stats["bottleneck"] = _residual_block(
        sd, prefix + "bottleneck.1.0"
    )
    params["ConvTranspose_0"] = _conv_t(sd, prefix + "bottleneck.2")
    # reference decoder1..3 = Sequential(block, convT); decoder4 = block.
    # our dec_3..dec_1 mirror decoder1..3; dec_0 mirrors decoder4.
    for j in range(1, 4):
        ours = f"dec_{4 - j}"
        params[ours], stats[ours] = _residual_block(sd, f"{prefix}decoder{j}.0.0")
        params[f"ConvTranspose_{j}"] = _conv_t(sd, f"{prefix}decoder{j}.1")
    params["dec_0"], stats["dec_0"] = _residual_block(sd, prefix + "decoder4.0")
    params["Conv_0"] = _conv(sd, prefix + "final_layer.0")
    return params, stats


def convert_rgbd2ap(sd, prefix="") -> Tuple[dict, dict]:
    unet_p, unet_s = convert_unet(sd, prefix + "part1.")
    return {"unet": unet_p}, {"unet": unet_s}


def convert_ap2poh(sd, prefix="") -> Tuple[dict, dict]:
    params = {"modulation": {}}
    for c in ("r", "g", "b"):
        params["modulation"][f"conv_{c}"] = {
            "radial_weights": sd[f"{prefix}part1.conv_{c}.params"].numpy(),
            "bias": sd[f"{prefix}part1.conv_{c}.bias"].numpy(),
        }
    return params, {}


def convert_generator(sd) -> Tuple[dict, dict]:
    p1, s1 = convert_rgbd2ap(sd, "part1.")
    p2, s2 = convert_ap2poh(sd, "part2.")
    return {"part1": p1, "part2": p2}, {"part1": s1, "part2": s2}


def convert_discriminator(sd) -> Tuple[dict, dict]:
    """WGANGPDiscriminator192 (discriminator.py:5-51) -> our critic tree."""
    params, stats = {}, {}
    params["Conv_0"] = _conv(sd, "block1.0")
    for i in range(2, 7):  # block2..block6: Sequential(conv, bn, lrelu)
        params[f"Conv_{i-1}"] = _conv(sd, f"block{i}.0")
        p, s = _bn(sd, f"block{i}.1")
        params[f"BatchNorm_{i-2}"], stats[f"BatchNorm_{i-2}"] = p, s
    params["Conv_6"] = _conv(sd, "conv")
    return params, stats


CONVERTERS = {
    "generator": convert_generator,
    "rgbd2ap": convert_rgbd2ap,
    "ap2poh": convert_ap2poh,
    "discriminator": convert_discriminator,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=sorted(CONVERTERS), required=True)
    ap.add_argument("--in", dest="inp", required=True, help="reference .pth path")
    ap.add_argument("--out", required=True, help="output .msgpack path")
    args = ap.parse_args()

    import torch
    from flax import serialization
    import jax

    sd = torch.load(args.inp, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, stats = CONVERTERS[args.kind](sd)
    blob = serialization.to_bytes(
        jax.tree.map(lambda x: x, {"params": params, "batch_stats": stats})
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()

"""VGG19 perceptual loss (reference loss_func.py:12-63).

A Flax reimplementation of torchvision VGG19's feature trunk up to relu5_2,
tapping the feature maps the reference uses (torchvision ``features`` indices
[3, 8, 13, 22, 31] == relu1_2, relu2_2, relu3_2, relu4_2, relu5_2), with
ImageNet normalization and the MSE-per-tap average.

Weights: torchvision isn't available in this environment, so pretrained
weights are loaded from an ``.npz`` produced by ``tools/convert_vgg19.py``
(run it anywhere torchvision is installed, ship the file).  There is NO
silent fallback: requesting ``vgg19`` without a weights file raises, and a
*fixed random* VGG19 (deterministic seed; random-CNN perceptual distances
are a known usable metric) is available only as the explicit opt-in
``mode="random"``.  See docs/perceptual_fallback.md for the quantified
effect of the random-VGG term.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import freeze

# (convs_in_stage, channels); tap always follows the 2nd conv of a stage.
_STAGES: Tuple[Tuple[int, int], ...] = ((2, 64), (2, 128), (4, 256), (4, 512), (2, 512))
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "weights",
    "vgg19_features.npz",
)


class VGG19Features(nn.Module):
    """VGG19 trunk through relu5_2; returns the 5 tapped feature maps.

    Input: (B, 3, H, W) float32 in [0, 1] (NCHW, like the reference).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_nchw: jnp.ndarray) -> List[jnp.ndarray]:
        x = (x_nchw - _IMAGENET_MEAN[None, :, None, None]) / _IMAGENET_STD[
            None, :, None, None
        ]
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        taps = []
        conv_idx = 0
        for stage_i, (n_convs, feats) in enumerate(_STAGES):
            if stage_i > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for c in range(n_convs):
                x = nn.Conv(
                    feats, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv_{conv_idx}"
                )(x)
                x = nn.relu(x)
                conv_idx += 1
                if c == 1:  # tap after relu of the stage's 2nd conv
                    taps.append(x.astype(jnp.float32))
                if stage_i == len(_STAGES) - 1 and c == 1:
                    return taps
        return taps


def init_vgg19_params(seed: int = 0) -> Any:
    """Deterministic random init (fallback when no pretrained weights exist)."""
    module = VGG19Features()
    dummy = jnp.zeros((1, 3, 32, 32), dtype=jnp.float32)
    return module.init(jax.random.key(seed), dummy)["params"]


def load_vgg19_params(
    path: Optional[str] = None, mode: str = "vgg19"
) -> Tuple[Any, bool]:
    """Load pretrained VGG19 conv params from ``.npz``.

    ``mode="vgg19"`` requires the weights file (raises ``FileNotFoundError``
    otherwise — no silent quality degradation); ``mode="random"`` is the
    explicit opt-in for the fixed random VGG19.  Returns
    (params, pretrained_flag).  The npz layout is ``conv_{i}_kernel`` (HWIO) /
    ``conv_{i}_bias`` for i in 0..13, as written by ``tools/convert_vgg19.py``.
    """
    if mode == "random":
        print(
            "[learned_hologram_gan_tpu] NOTE: perceptual loss uses a FIXED "
            "RANDOM VGG19 (explicit perceptual='random'). Training quality is "
            "NOT comparable to the reference's pretrained-VGG objective; see "
            "docs/perceptual_fallback.md for the measured effect."
        )
        return init_vgg19_params(), False
    if mode != "vgg19":
        raise ValueError(f"unknown perceptual mode {mode!r}")
    path = path or DEFAULT_WEIGHTS_PATH
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"perceptual='vgg19' needs pretrained weights, none at {path!r}. "
            "Generate them with tools/convert_vgg19.py on a machine with "
            "torchvision, or opt in to the untrained fallback explicitly "
            "with perceptual='random' (CLI: --perceptual random), or disable "
            "the term with perceptual='none'."
        )
    raw = np.load(path)
    params = {}
    i = 0
    while f"conv_{i}_kernel" in raw:
        params[f"conv_{i}"] = {
            "kernel": jnp.asarray(raw[f"conv_{i}_kernel"]),
            "bias": jnp.asarray(raw[f"conv_{i}_bias"]),
        }
        i += 1
    return freeze(params), True


def perceptual_loss(
    vgg_params: Any, hat: jnp.ndarray, target: jnp.ndarray
) -> jnp.ndarray:
    """Mean over taps of MSE(feat(hat), feat(target)) (reference :38-51).

    Runs hat and target through one concatenated batch like the reference
    (loss_func.py:41) — a single VGG pass.
    """
    x = jnp.concatenate([hat, target], axis=0)
    taps = VGG19Features().apply({"params": vgg_params}, x)
    b = hat.shape[0]
    loss = jnp.float32(0.0)
    for t in taps:
        loss = loss + jnp.mean((t[:b] - t[b:]) ** 2)
    return loss / len(taps)

"""Fused eval-mode UNet forward: BN folded, residual blocks in one kernel.

The eval-mode UNet (reference neural_network_components.py:241-315 at
inference, generatePOH.py:41-43) is bandwidth-bound on TPU: each of the ten
residual blocks runs as five separate XLA ops whose (B, H, W, C) activations
round-trip HBM.  This module walks the *trained param tree* of
:class:`~learned_hologram_gan_tpu.nn.blocks.UNet` (no module re-init, so any
checkpoint works), folds every eval-mode BatchNorm into its preceding conv
(exact — :func:`~learned_hologram_gan_tpu.ops.pallas.conv_block.fold_conv_bn`)
and computes each block with the fused Pallas kernel
(:func:`~learned_hologram_gan_tpu.ops.pallas.conv_block.fused_residual_block`)
when the geometry fits the VMEM budget; blocks that do not fit (the
1024-channel bottleneck, the 1024-in decoder head) fall back to the identical
unfused math.  Pool / up-conv / head layers reproduce the module ops exactly
(max_pool, GEMM+pixel-shuffle, 1x1 conv + sigmoid).

Training keeps the Flax module path (BN statistics + autodiff); this is the
inference fast path used by bench.py / build_infer_fn / serving.
Equivalence vs ``UNet.apply(train=False)`` is pinned by
tests/test_fused_unet.py in both f32 and bf16.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas import conv_block as cb

Dtype = Any


def _block_eval(p: Dict, bs: Dict, x: jnp.ndarray, use_pallas: bool) -> jnp.ndarray:
    """One eval-mode ResidualBlock from its param/stat subtree."""
    w1, b1 = cb.fold_conv_bn(p["Conv_0"], p["BatchNorm_0"], bs["BatchNorm_0"])
    w2, b2 = cb.fold_conv_bn(p["Conv_1"], p["BatchNorm_1"], bs["BatchNorm_1"])
    w3, b3 = p["Conv_2"]["kernel"], p["Conv_2"]["bias"]
    _, h, w, cin = x.shape
    cout = w1.shape[-1]
    if use_pallas and cb.supported(h, w, cin, cout, x.dtype.itemsize):
        return cb.fused_residual_block(x, w1, b1, w2, b2, w3, b3)
    return cb.residual_block_reference(x, w1, b1, w2, b2, w3, b3)


def _pixel_shuffle_up(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """GEMM + pixel-shuffle 2x up-conv (PixelShuffleConvTranspose math)."""
    kernel, bias = p["kernel"], p["bias"]
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    wmat = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3)).reshape(cin, 4 * cout)
    y = jnp.dot(x, wmat.astype(x.dtype))
    y = y.reshape(n, h, w, 2, 2, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * w, cout)
    return y + bias.astype(x.dtype)


def supported(params: Dict) -> bool:
    """True when the tree is a plain conv UNet this fast path understands."""
    if "enc_0" not in params or "Conv_0" not in params:
        return False
    # FourierBlock trees nest ResidualBlocks one level deeper
    return "Conv_0" in params["enc_0"]


def unet_apply_fused(
    params: Dict,
    batch_stats: Dict,
    x: jnp.ndarray,
    *,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Eval-mode ``UNet.__call__`` from the param tree (NHWC in/out).

    ``params`` / ``batch_stats`` are the UNet's own subtrees (e.g.
    ``variables["params"]["part1"]["unet"]``).  Mirrors blocks.UNet.__call__
    exactly; levels are inferred from the ``enc_i`` keys.
    """
    levels = sum(1 for k in params if k.startswith("enc_"))
    skips = []
    y = x
    for i in range(levels):
        y = _block_eval(params[f"enc_{i}"], batch_stats[f"enc_{i}"], y, use_pallas)
        skips.append(y)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
    y = _block_eval(params["bottleneck"], batch_stats["bottleneck"], y, use_pallas)
    y = _pixel_shuffle_up(params["ConvTranspose_0"], y)
    for i in reversed(range(levels)):
        y = jnp.concatenate([skips[i], y], axis=-1)
        y = _block_eval(params[f"dec_{i}"], batch_stats[f"dec_{i}"], y, use_pallas)
        if i > 0:
            y = _pixel_shuffle_up(params[f"ConvTranspose_{levels - i}"], y)
    # final 1x1 conv + sigmoid (auto-named Conv_0 at UNet scope)
    head = params["Conv_0"]
    y = jnp.dot(y, head["kernel"][0, 0].astype(y.dtype)) + head["bias"].astype(y.dtype)
    return nn.sigmoid(y)

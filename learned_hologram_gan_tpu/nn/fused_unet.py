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
    """2x2/stride-2 up-conv (PixelShuffleConvTranspose, conv_transpose impl).

    The GEMM+shuffle form measured slower end-to-end on this chip (headline
    bench 225 -> 196 POH/s at its adoption commit; per-geometry A/B in
    tools/probe_upconv.py) — the dilated-conv lowering wins here.
    """
    import jax

    kernel, bias = p["kernel"], p["bias"]
    y = jax.lax.conv_transpose(
        x, kernel.astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(x.dtype)


# ---------------------------------------------------------------------------
# Polyphase (space-to-depth) level 0 — primitives shared with blocks.UNet's
# training-mode flag; see nn/polyphase.py for the derivation and the
# profile_unet.py numbers that motivate it.
# ---------------------------------------------------------------------------

from .polyphase import (  # noqa: E402  (section grouping)
    depth_to_space,
    poly_concat,
    poly_conv1x1,
    poly_conv3x3,
    poly_pool,
    poly_upconv_gemm,
    space_to_depth,
)


def _block_eval_poly(p: Dict, bs: Dict, x4: jnp.ndarray) -> jnp.ndarray:
    """Eval-mode ResidualBlock, phase domain (BN folded as in _block_eval)."""
    w1, b1 = cb.fold_conv_bn(p["Conv_0"], p["BatchNorm_0"], bs["BatchNorm_0"])
    w2, b2 = cb.fold_conv_bn(p["Conv_1"], p["BatchNorm_1"], bs["BatchNorm_1"])
    w3, b3 = p["Conv_2"]["kernel"], p["Conv_2"]["bias"]
    y = nn.relu(poly_conv3x3(x4, w1, b1))
    y = poly_conv3x3(y, w2, b2)
    sc = poly_conv1x1(x4, w3, b3)
    return nn.relu(y + sc)


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
    polyphase_level0: bool = False,
) -> jnp.ndarray:
    """Eval-mode ``UNet.__call__`` from the param tree (NHWC in/out).

    ``params`` / ``batch_stats`` are the UNet's own subtrees (e.g.
    ``variables["params"]["part1"]["unet"]``).  Mirrors blocks.UNet.__call__
    exactly; levels are inferred from the ``enc_i`` keys.

    ``polyphase_level0`` computes enc_0 / the last up-conv / dec_0 / head in
    the space-to-depth phase domain (exact; see the section comment above) —
    the inference fast path for the 384^2-class bandwidth-bound level.
    """
    levels = sum(1 for k in params if k.startswith("enc_"))
    skips = []
    poly = polyphase_level0 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    if poly:
        x4 = space_to_depth(x)
        s0 = _block_eval_poly(params["enc_0"], batch_stats["enc_0"], x4)
        skips.append(s0)  # kept in phase layout
        y = poly_pool(s0)
    else:
        y = _block_eval(params["enc_0"], batch_stats["enc_0"], x, use_pallas)
        skips.append(y)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
    for i in range(1, levels):
        y = _block_eval(params[f"enc_{i}"], batch_stats[f"enc_{i}"], y, use_pallas)
        skips.append(y)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
    y = _block_eval(params["bottleneck"], batch_stats["bottleneck"], y, use_pallas)
    if levels > 1:  # levels == 1: the bottleneck up IS the final up (below)
        y = _pixel_shuffle_up(params["ConvTranspose_0"], y)
    for i in reversed(range(1, levels)):
        y = jnp.concatenate([skips[i], y], axis=-1)
        y = _block_eval(params[f"dec_{i}"], batch_stats[f"dec_{i}"], y, use_pallas)
        if i > 1:
            y = _pixel_shuffle_up(params[f"ConvTranspose_{levels - i}"], y)
    head = params["Conv_0"]  # final 1x1 conv (auto-named at UNet scope)
    if poly:
        up = params[f"ConvTranspose_{levels - 1}"]
        y = poly_upconv_gemm(y, up["kernel"], up["bias"])
        y = poly_concat(skips[0], y)
        y = _block_eval_poly(params["dec_0"], batch_stats["dec_0"], y)
        y = poly_conv1x1(y, head["kernel"], head["bias"])
        return nn.sigmoid(depth_to_space(y))
    y = _pixel_shuffle_up(params[f"ConvTranspose_{levels - 1}"], y)
    y = jnp.concatenate([skips[0], y], axis=-1)
    y = _block_eval(params["dec_0"], batch_stats["dec_0"], y, use_pallas)
    y = jnp.dot(y, head["kernel"][0, 0].astype(y.dtype)) + head["bias"].astype(y.dtype)
    return nn.sigmoid(y)

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


# ---------------------------------------------------------------------------
# Polyphase (space-to-depth) level 0
#
# tools/profile_unet.py on the v5e: the 384^2 64-channel stages run 4-11x
# above their rooflines (enc_0 5.2x, dec_0 4.0x, the up-conv pixel shuffle
# 11x, head 4.6x) while the SAME arithmetic at 192^2x128+ geometry (enc_1)
# runs at 85% MXU.  Cause: 64-channel bf16 tensors fill half of the 128-lane
# tile and the d2s transpose is lane-hostile.  Fix (the standard TPU CNN
# space-to-depth trick): run the whole level 0 in the (H/2, W/2, 4C) phase
# domain — every 3x3 conv decomposes EXACTLY into four phase-aligned 2x2
# convs over 4*Cin channels (1.78x the FLOPs, but MXU-shaped), the 2x2
# max-pool becomes a max over the 4 phase channels, the decoder up-conv GEMM
# *already* produces phase-major channels so its pixel-shuffle transpose
# disappears, and only the 6-channel head output pays one depth-to-space.
# ---------------------------------------------------------------------------


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), phase-major: ch = (di*2+dj)*C + c."""
    n, h, w, c = x.shape
    y = x.reshape(n, h // 2, 2, w // 2, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    n, h2, w2, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, h2, w2, 2, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(n, 2 * h2, 2 * w2, c)


def _tile4(b: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector -> phase-major 4C layout (same value every phase)."""
    return jnp.tile(b, 4)


def _poly_conv3x3(x4: jnp.ndarray, k: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact 3x3 SAME conv in the phase domain.

    ``x4`` (N, h, w, 4*Cin) phase-major; ``k`` (3, 3, Cin, Cout) the original
    spatial kernel.  Output phase (do, dj) draws input rows 2i+do+u =
    2(i+p)+q with q=(do+u) mod 2, p=floor((do+u)/2) in {do-1, do} — i.e. a
    2x2 conv over all four input phases with asymmetric SAME padding
    ((1-do, do), (1-dj, dj)).  Each original tap lands in exactly one of the
    2x2x4 kernel slots; the 7 unused slots are zero.
    """
    cin, cout = k.shape[2], k.shape[3]
    outs = []
    for do in (0, 1):
        for dj in (0, 1):
            kp = jnp.zeros((2, 2, 4, cin, cout), k.dtype)
            for u in (-1, 0, 1):
                qi = (do + u) % 2
                pi = (do + u) // 2 - (do - 1)
                for v in (-1, 0, 1):
                    qj = (dj + v) % 2
                    pj = (dj + v) // 2 - (dj - 1)
                    kp = kp.at[pi, pj, qi * 2 + qj].set(k[u + 1, v + 1])
            o = jax.lax.conv_general_dilated(
                x4,
                kp.reshape(2, 2, 4 * cin, cout).astype(x4.dtype),
                (1, 1),
                padding=((1 - do, do), (1 - dj, dj)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            outs.append(o)
    y = jnp.stack(outs, axis=3)  # (n, h, w, 4, cout), phase-major
    y = y.reshape(*y.shape[:3], 4 * cout)
    return y + _tile4(b).astype(y.dtype)


def _poly_conv1x1(x4: jnp.ndarray, k: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv applied per phase: (N, h, w, 4Cin) -> (N, h, w, 4Cout)."""
    n, h, w, c4 = x4.shape
    cin, cout = k.shape[-2], k.shape[-1]
    y = x4.reshape(n, h, w, 4, cin)
    y = jnp.dot(y, k.reshape(cin, cout).astype(x4.dtype))
    return y.reshape(n, h, w, 4 * cout) + _tile4(b).astype(x4.dtype)


def _block_eval_poly(p: Dict, bs: Dict, x4: jnp.ndarray) -> jnp.ndarray:
    """Eval-mode ResidualBlock, phase domain (BN folded as in _block_eval)."""
    w1, b1 = cb.fold_conv_bn(p["Conv_0"], p["BatchNorm_0"], bs["BatchNorm_0"])
    w2, b2 = cb.fold_conv_bn(p["Conv_1"], p["BatchNorm_1"], bs["BatchNorm_1"])
    w3, b3 = p["Conv_2"]["kernel"], p["Conv_2"]["bias"]
    y = nn.relu(_poly_conv3x3(x4, w1, b1))
    y = _poly_conv3x3(y, w2, b2)
    sc = _poly_conv1x1(x4, w3, b3)
    return nn.relu(y + sc)


def _gemm_upconv_poly(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """2x up-conv GEMM, output kept phase-major (the shuffle vanishes).

    The PixelShuffleConvTranspose weight matrix's columns are already
    ordered (di*2+dj)*Cout + co — exactly this file's phase-major layout —
    so dropping the transpose IS the phase-domain output.
    """
    kernel, bias = p["kernel"], p["bias"]
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    wmat = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3)).reshape(cin, 4 * cout)
    return jnp.dot(x, wmat.astype(x.dtype)) + _tile4(bias).astype(x.dtype)


def _poly_concat(a4: jnp.ndarray, b4: jnp.ndarray) -> jnp.ndarray:
    """Channel concat in the phase domain (per-phase interleaved layout)."""
    n, h, w, ca = a4.shape
    cb_ = b4.shape[-1]
    a = a4.reshape(n, h, w, 4, ca // 4)
    b = b4.reshape(n, h, w, 4, cb_ // 4)
    return jnp.concatenate([a, b], axis=-1).reshape(n, h, w, ca + cb_)


def _poly_pool(x4: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool == max over the 4 phases, back to standard."""
    n, h, w, c4 = x4.shape
    return x4.reshape(n, h, w, 4, c4 // 4).max(axis=3)


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
        y = _poly_pool(s0)
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
        y = _gemm_upconv_poly(params[f"ConvTranspose_{levels - 1}"], y)
        y = _poly_concat(skips[0], y)
        y = _block_eval_poly(params["dec_0"], batch_stats["dec_0"], y)
        y = _poly_conv1x1(y, head["kernel"], head["bias"])
        return nn.sigmoid(depth_to_space(y))
    y = _pixel_shuffle_up(params[f"ConvTranspose_{levels - 1}"], y)
    y = jnp.concatenate([skips[0], y], axis=-1)
    y = _block_eval(params["dec_0"], batch_stats["dec_0"], y, use_pallas)
    y = jnp.dot(y, head["kernel"][0, 0].astype(y.dtype)) + head["bias"].astype(y.dtype)
    return nn.sigmoid(y)

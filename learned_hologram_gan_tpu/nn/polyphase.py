"""Polyphase (space-to-depth) convolution primitives.

tools/profile_unet.py on the v5e: the 384^2-class 64-channel UNet stages run
4-11x above their rooflines in BOTH eval and train mode (enc_0 5-6x, dec_0
4-4.6x, the up-conv pixel shuffle 11-13x, head 4.6-7x) while the SAME
arithmetic at 192^2 x 128+ channels (enc_1) runs at 85-100% MXU.  Cause:
64-channel bf16 tensors fill half of the TPU's 128-lane tile, and the
depth-to-space transpose is lane-hostile.

Fix — the standard TPU CNN space-to-depth transform: compute the whole UNet
level 0 in the (H/2, W/2, 4C) phase domain, phase-major channel layout
``ch = (di*2 + dj)*C + c``:

- a 3x3 SAME conv decomposes EXACTLY into four phase-aligned 2x2 convs over
  4*Cin channels (1.78x the FLOPs, but MXU-shaped): output phase (do, dj)
  draws input rows 2i+do+u = 2(i+p)+q with q = (do+u) mod 2 and
  p = floor((do+u)/2) in {do-1, do} — a 2-tap window with asymmetric SAME
  padding ((1-do, do), (1-dj, dj)); each original tap lands in exactly one
  of the 2x2x4 kernel slots, the other 7 are zero;
- the 2x2/stride-2 max-pool is a max over the 4 phase channels;
- the 2x2/stride-2 up-conv GEMM (PixelShuffleConvTranspose) already emits
  phase-major columns, so its pixel-shuffle transpose vanishes;
- 1x1 convs and every elementwise op apply per phase.

Used by nn/fused_unet.py (eval fast path) and by blocks.UNet's
``polyphase_level0`` flag (training: BN batch statistics reduce over the
phase axis too, so they equal the standard-domain statistics exactly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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


def tile4(b: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector -> phase-major 4C layout (same value every phase)."""
    return jnp.tile(b, 4)


def poly_conv3x3(x4: jnp.ndarray, k: jnp.ndarray, b=None) -> jnp.ndarray:
    """Exact 3x3 SAME conv in the phase domain (see module docstring).

    ``x4`` (N, h, w, 4*Cin) phase-major; ``k`` (3, 3, Cin, Cout) the original
    spatial kernel; ``b`` optional (Cout,) bias.
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
    if b is not None:
        y = y + tile4(b).astype(y.dtype)
    return y


def poly_conv1x1(x4: jnp.ndarray, k: jnp.ndarray, b=None) -> jnp.ndarray:
    """1x1 conv applied per phase: (N, h, w, 4Cin) -> (N, h, w, 4Cout)."""
    n, h, w, c4 = x4.shape
    cin, cout = k.shape[-2], k.shape[-1]
    y = x4.reshape(n, h, w, 4, cin)
    y = jnp.dot(y, k.reshape(cin, cout).astype(x4.dtype))
    y = y.reshape(n, h, w, 4 * cout)
    if b is not None:
        y = y + tile4(b).astype(y.dtype)
    return y


def poly_upconv_gemm(x: jnp.ndarray, kernel: jnp.ndarray, bias=None) -> jnp.ndarray:
    """2x up-conv GEMM with the output kept phase-major (no pixel shuffle).

    ``kernel`` (2, 2, Cin, Cout) in ConvTranspose HWIO layout; the flipped-
    transposed weight matrix's columns are ordered (di*2+dj)*Cout + co —
    exactly the phase-major layout — so dropping the shuffle IS the
    phase-domain output (PixelShuffleConvTranspose math, blocks.py).
    """
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    wmat = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3)).reshape(cin, 4 * cout)
    y = jnp.dot(x, wmat.astype(x.dtype))
    if bias is not None:
        y = y + tile4(bias).astype(x.dtype)
    return y


def poly_concat(a4: jnp.ndarray, b4: jnp.ndarray) -> jnp.ndarray:
    """Channel concat in the phase domain (per-phase interleaved layout)."""
    n, h, w, ca = a4.shape
    cb = b4.shape[-1]
    a = a4.reshape(n, h, w, 4, ca // 4)
    b = b4.reshape(n, h, w, 4, cb // 4)
    return jnp.concatenate([a, b], axis=-1).reshape(n, h, w, ca + cb)


def poly_pool(x4: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool == max over the 4 phases, back to standard."""
    n, h, w, c4 = x4.shape
    return x4.reshape(n, h, w, 4, c4 // 4).max(axis=3)

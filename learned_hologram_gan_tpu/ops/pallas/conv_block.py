"""Fused inference residual block (conv3x3-BN-ReLU-conv3x3-BN + 1x1 shortcut).

The UNet's level-0/1 residual blocks (reference neural_network_components.py:
6-32, used at :241-315) are bandwidth-bound on TPU: run as separate XLA ops,
each conv materializes its (B, H, W, C) output in HBM, so one block moves
~2-2.5 GB at the 384^2 bench shapes against a measured ~185 GB/s effective
ceiling (BASELINE.md "Measured hardware ceilings").  This kernel computes the
ENTIRE block per (batch, row-stripe) grid step with every intermediate in
VMEM: x is read once (double-buffered manual DMA with a 2-row halo for the
two chained 3x3 convs) and only the final ReLU output is written — HBM
traffic drops to `read x + write out`, a 3-4x cut at the wide levels.

Inference only: BatchNorm folds into the conv weights/biases outside the
kernel (:func:`fold_conv_bn`), which is exact at eval time
(use_running_average=True).  Training keeps the XLA path (stats + autodiff).

Numerics: taps accumulate in f32 (`preferred_element_type`), the ReLU'd
intermediate is rounded to the input dtype between convs — the same rounding
points XLA uses for bf16 convs, so outputs track the unfused module within
bf16 tolerance (tests/test_conv_block.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Mosaic stack-allocates a temporary for every materialized slice, so the
# dominant VMEM cost is the 9 shifted tap slices of each conv's input (the
# unrolled 3x3).  The itemized model below reproduces the compiler's
# reported scoped sizes within ~15% on this chip (measured: 18.3M at
# w=192/c=128/rb=8, 31.0M at w=384/c=64/rb=8, <=16M at w=96/c=64/rb=16),
# scaled by the observed 0.85 lifetime-overlap factor.
_VMEM_BUDGET = 14 * 1024 * 1024


def _vmem_bytes(row_block: int, w: int, cin: int, cout: int, itemsize: int) -> int:
    def lanes(c):  # Mosaic pads the minor (channel) dim to full 128 lanes
        return max(c, 128)

    rb = row_block
    li, lo = lanes(cin) * itemsize, lanes(cout) * itemsize
    weights = (9 * cin + cin) * cout * itemsize + 9 * cout * cout * itemsize
    xblocks = 3 * 2 * rb * w * li  # 3 stripes, double-buffered
    halo = 3 * (rb + 4) * (w + 4) * li  # concat + mask + col-pad temps
    xp_taps = 9 * (rb + 2) * (w + 2) * li
    acc1 = 2 * (rb + 2) * (w + 2) * lanes(cout) * 4
    y1 = 2 * (rb + 2) * (w + 2) * lo
    y1_taps = 9 * rb * w * lo
    acc2 = 2 * rb * w * lanes(cout) * 4
    sc_out = 3 * rb * w * lo
    total = (weights + xblocks + halo + xp_taps + acc1 + y1 + y1_taps
             + acc2 + sc_out)
    return int(total * 0.85)


def pick_row_block(h: int, w: int, cin: int, cout: int, itemsize: int = 2) -> Optional[int]:
    """Largest row stripe in {32, 16, 8} that divides H, leaves room for the
    2-row halo (H >= rb + 4), and fits the VMEM budget."""
    for rb in (32, 16, 8):
        if h % rb == 0 and h >= rb + 4 and _vmem_bytes(rb, w, cin, cout, itemsize) <= _VMEM_BUDGET:
            return rb
    return None


def supported(h: int, w: int, cin: int, cout: int, itemsize: int = 2) -> bool:
    return pick_row_block(h, w, cin, cout, itemsize) is not None


def fold_conv_bn(conv_params, bn_params, bn_stats, eps: float = 1e-5):
    """Fold an eval-mode BatchNorm into the preceding conv (exact).

    bn(conv(x, W) + b) == conv(x, W * s) + (b - mean) * s + beta with
    s = scale / sqrt(var + eps)  (flax BatchNorm, use_running_average=True).
    Returns (W_folded (kh, kw, cin, cout) f32, b_folded (cout,) f32).
    """
    w = jnp.asarray(conv_params["kernel"], jnp.float32)
    b = jnp.asarray(conv_params["bias"], jnp.float32)
    scale = jnp.asarray(bn_params["scale"], jnp.float32)
    beta = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    s = scale * jax.lax.rsqrt(var + eps)
    return w * s, (b - mean) * s + beta


def _block_kernel(
    xm1, x0, xp1, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
    *, rb: int, h: int, w: int, n_row_blocks: int,
):
    g = pl.program_id(0)
    i = jax.lax.rem(g, n_row_blocks)
    row0 = i * rb

    # Assemble the 2-row halo from the three pipelined stripes (the
    # prev/next index maps clamp at the image edges; the garbage rows they
    # deliver there are zeroed by the row-validity mask below, matching the
    # SAME-padding zeros of the reference conv).
    top2 = xm1[0, rb - 2 : rb]
    bot2 = xp1[0, 0:2]
    xrows = jnp.concatenate([top2, x0[0], bot2], axis=0)  # (rb+4, w, cin)
    rows = jax.lax.broadcasted_iota(jnp.int32, (rb + 4, 1, 1), 0) + (row0 - 2)
    xrows = jnp.where(
        (rows >= 0) & (rows < h), xrows, jnp.zeros_like(xrows)
    )
    xp = jnp.pad(xrows, ((0, 0), (2, 2), (0, 0)))  # 2-col zero halo

    dn = (((2,), (0,)), ((), ()))
    f32 = jnp.float32

    # conv1 (+1-ring for conv2): y1 extent rows [row0-1, row0+rb+1),
    # cols [-1, w+1)
    acc = jax.lax.dot_general(
        xp[0 : rb + 2, 0 : w + 2], w1_ref[0], dn, preferred_element_type=f32
    )
    for dr in range(3):
        for dc in range(3):
            if dr == 0 and dc == 0:
                continue
            acc = acc + jax.lax.dot_general(
                xp[dr : dr + rb + 2, dc : dc + w + 2],
                w1_ref[dr * 3 + dc],
                dn,
                preferred_element_type=f32,
            )
    acc = acc + b1_ref[0]
    y1 = jnp.maximum(acc, 0.0).astype(xrows.dtype)
    # Zero the ring where it falls outside the image: XLA's SAME conv2 pads
    # the conv1 *output* with zeros there, while our ring holds conv1
    # evaluated on zero-padded x — different values at the borders.
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (rb + 2, w + 2, 1), 0) + (row0 - 1)
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (rb + 2, w + 2, 1), 1) - 1
    valid = (rows1 >= 0) & (rows1 < h) & (cols1 >= 0) & (cols1 < w)
    y1 = jnp.where(valid, y1, jnp.zeros_like(y1))

    # conv2 -> (rb, w, cout)
    acc2 = jax.lax.dot_general(
        y1[0:rb, 0:w], w2_ref[0], dn, preferred_element_type=f32
    )
    for dr in range(3):
        for dc in range(3):
            if dr == 0 and dc == 0:
                continue
            acc2 = acc2 + jax.lax.dot_general(
                y1[dr : dr + rb, dc : dc + w],
                w2_ref[dr * 3 + dc],
                dn,
                preferred_element_type=f32,
            )
    acc2 = acc2 + b2_ref[0]

    # 1x1 shortcut on the stripe center
    sc = jax.lax.dot_general(
        xp[2 : 2 + rb, 2 : 2 + w], w3_ref[:], dn, preferred_element_type=f32
    )
    sc = sc + b3_ref[0]

    out_ref[0] = jnp.maximum(acc2 + sc, 0.0).astype(out_ref.dtype)


def fused_residual_block(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    w3: jnp.ndarray,
    b3: jnp.ndarray,
    *,
    row_block: Optional[int] = None,
) -> jnp.ndarray:
    """relu(conv3x3(relu(conv3x3(x, w1)+b1), w2)+b2 + conv1x1(x, w3)+b3).

    x: (B, H, W, Cin); w1 (3,3,Cin,C); w2 (3,3,C,C); w3 (Cin,C) or (1,1,Cin,C);
    biases (C,).  SAME padding, stride 1 — exactly the eval-mode
    :class:`~learned_hologram_gan_tpu.nn.blocks.ResidualBlock` with its two
    BatchNorms pre-folded via :func:`fold_conv_bn`.
    """
    if w3.ndim == 4:
        w3 = w3[0, 0]
    bsz, h, w, cin = x.shape
    cout = w1.shape[-1]
    rb = row_block or pick_row_block(h, w, cin, cout, x.dtype.itemsize)
    if rb is None:
        raise ValueError(f"unsupported geometry ({h}x{w}, {cin}->{cout})")
    n_row_blocks = h // rb
    dt = x.dtype
    # 3x3 kernels go in as (9, cin, cout): leading-dim indexing is the only
    # tap access Mosaic accepts (a (3,3,cin,cout) slice would cut the tiled
    # minor pair).
    args = (
        x,
        w1.reshape(9, cin, cout).astype(dt),
        b1.astype(jnp.float32).reshape(1, -1),
        w2.reshape(9, cout, cout).astype(dt),
        b2.astype(jnp.float32).reshape(1, -1),
        w3.astype(dt), b3.astype(jnp.float32).reshape(1, -1),
    )
    vspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    nrb = n_row_blocks

    def stripe(di):
        # block index map for the stripe at row-block i+di, clamped at the
        # image edges (garbage rows there are masked in-kernel)
        return pl.BlockSpec(
            (1, rb, w, cin),
            lambda g, d=di: (
                g // nrb, jnp.clip(jax.lax.rem(g, nrb) + d, 0, nrb - 1), 0, 0
            ),
        )

    return pl.pallas_call(
        functools.partial(
            _block_kernel, rb=rb, h=h, w=w, n_row_blocks=n_row_blocks
        ),
        grid=(bsz * n_row_blocks,),
        in_specs=[
            # x rides in three standard pipelined stripes (prev/cur/next) —
            # a manual halo DMA would need lane-tiling-aligned slices, which
            # 64-channel NHWC buffers cannot satisfy on TPU.
            stripe(-1), stripe(0), stripe(+1),
            vspec(), vspec(), vspec(), vspec(), vspec(), vspec(),
        ],
        out_specs=pl.BlockSpec(
            (1, rb, w, cout),
            lambda g: (g // n_row_blocks, jax.lax.rem(g, n_row_blocks), 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), dt),
        interpret=_interpret(),
    )(x, x, *args)


def residual_block_reference(x, w1, b1, w2, b2, w3, b3):
    """Unfused XLA oracle for the same folded block (tests + fallback).

    Conv outputs stay in the compute dtype (XLA still accumulates the MXU
    dots in f32 internally): forcing ``preferred_element_type=f32`` here
    would double the HBM bytes of every conv output — measured 10% slower
    over the whole 384^2 UNet — for rounding the module path never had.
    """
    if w3.ndim == 2:
        w3 = w3[None, None]
    dn = ("NHWC", "HWIO", "NHWC")
    dt = x.dtype
    y = jax.lax.conv_general_dilated(
        x, w1.astype(dt), (1, 1), "SAME", dimension_numbers=dn,
    ) + b1.astype(dt)
    y = jnp.maximum(y, 0.0)
    y = jax.lax.conv_general_dilated(
        y, w2.astype(dt), (1, 1), "SAME", dimension_numbers=dn,
    ) + b2.astype(dt)
    sc = jax.lax.conv_general_dilated(
        x, w3.astype(dt), (1, 1), "VALID", dimension_numbers=dn,
    ) + b3.astype(dt)
    return jnp.maximum(y + sc, 0.0)

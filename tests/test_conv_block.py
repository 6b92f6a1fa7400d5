"""Fused inference residual block (ops/pallas/conv_block.py).

The kernel must reproduce (1) the unfused XLA oracle on the same folded
weights, and (2) the actual eval-mode ResidualBlock module after BN folding —
including the image-border rows/cols where the halo ring must be re-zeroed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.nn import blocks
from learned_hologram_gan_tpu.ops.pallas import conv_block as cb

RNG = np.random.default_rng(17)


def _rand(shape, dtype=jnp.float32):
    return jnp.asarray(RNG.normal(size=shape).astype(np.float32), dtype)


@pytest.mark.parametrize("shape", [(2, 16, 16, 8, 8), (1, 24, 16, 4, 8)])
def test_fused_block_matches_xla_oracle(shape):
    b, h, w, cin, cout = shape
    x = _rand((b, h, w, cin))
    w1, b1 = _rand((3, 3, cin, cout)), _rand((cout,))
    w2, b2 = _rand((3, 3, cout, cout)), _rand((cout,))
    w3, b3 = _rand((cin, cout)), _rand((cout,))
    want = np.asarray(cb.residual_block_reference(x, w1, b1, w2, b2, w3, b3))
    got = np.asarray(cb.fused_residual_block(x, w1, b1, w2, b2, w3, b3,
                                             row_block=8))
    # f32 accumulation order differs (9 chained dots vs XLA conv): ~1e-4.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_block_matches_residual_block_module():
    """End-to-end vs the flax module: fold eval-mode BN, compare outputs."""
    cin, cout, h, w = 8, 16, 16, 16
    blk = blocks.ResidualBlock(cout, use_1x1conv=True)
    x = _rand((2, h, w, cin))
    variables = blk.init(jax.random.key(0), x, True)
    # give BN non-trivial running stats
    p = variables["params"]
    stats = jax.tree.map(
        lambda a: jnp.asarray(RNG.random(a.shape), a.dtype) + 0.5,
        variables["batch_stats"],
    )
    want = np.asarray(
        blk.apply({"params": p, "batch_stats": stats}, x, False)
    )
    w1, b1 = cb.fold_conv_bn(p["Conv_0"], p["BatchNorm_0"], stats["BatchNorm_0"])
    w2, b2 = cb.fold_conv_bn(p["Conv_1"], p["BatchNorm_1"], stats["BatchNorm_1"])
    got = np.asarray(cb.fused_residual_block(
        x, w1, b1, w2, b2, p["Conv_2"]["kernel"], p["Conv_2"]["bias"],
        row_block=8,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pick_row_block_budget():
    # Calibrated against Mosaic's reported scoped-VMEM sizes on v5e (see
    # _vmem_bytes): 96-wide 128->256 stripes compile; 384-wide stripes blow
    # the 16 MB scoped VMEM (measured 31 MB at rb=8) and must be rejected.
    assert cb.pick_row_block(96, 96, 128, 256) in (32, 16, 8)
    assert cb.pick_row_block(384, 384, 128, 64) is None  # tap temps blow VMEM
    assert cb.pick_row_block(48, 48, 1024, 512) is None  # weights blow VMEM
    assert cb.pick_row_block(10, 16, 8, 8) is None  # no divisor with halo room

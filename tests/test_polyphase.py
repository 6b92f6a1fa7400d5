"""Polyphase (space-to-depth) level-0 UNet: TRAINING-path equivalence.

``UNet(polyphase_level0=True)`` must be interchangeable with the standard
module: identical parameter/stat tree (same names, shapes, AND init values —
the raw-param declarations fold the same RNG paths), matching forward in
both modes, matching BatchNorm statistics updates (phase-domain statistics
reduce over the phase axis, equalling the standard statistics exactly), and
matching gradients.  nn/polyphase.py documents the derivation; the fused
eval path's exactness is pinned in tests/test_fused_unet.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.nn.blocks import UNet

RNG = np.random.default_rng(31)


def _trees(levels=2, size=16, dtype=jnp.float32, remat=False):
    a = UNet(output_channels=6, base_features=4, levels=levels, dtype=dtype,
             remat=remat)
    b = UNet(output_channels=6, base_features=4, levels=levels, dtype=dtype,
             remat=remat, polyphase_level0=True)
    x = jnp.asarray(RNG.random((2, size, size, 4)).astype(np.float32), dtype)
    va = a.init(jax.random.key(7), x, True)
    vb = b.init(jax.random.key(7), x, True)
    return a, b, x, va, vb


def test_param_tree_identical_values():
    _, _, _, va, vb = _trees()
    # same structure AND same init values: checkpoints interchange freely
    jax.tree.map(
        lambda p, q: np.testing.assert_array_equal(np.asarray(p), np.asarray(q)),
        va, vb,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_eval_matches(dtype):
    a, b, x, va, _ = _trees(dtype=dtype)
    stats = jax.tree.map(
        lambda s: jnp.asarray(0.5 + RNG.random(s.shape), s.dtype),
        va["batch_stats"],
    )
    v = {"params": va["params"], "batch_stats": stats}
    tol = 3e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(b.apply(v, x, False), np.float32),
        np.asarray(a.apply(v, x, False), np.float32),
        rtol=tol, atol=tol,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_train_and_stats_match(dtype):
    a, b, x, va, _ = _trees(dtype=dtype)
    ya, sa = a.apply(va, x, True, mutable=["batch_stats"])
    yb, sb = b.apply(va, x, True, mutable=["batch_stats"])
    tol = 3e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(yb, np.float32), np.asarray(ya, np.float32),
        rtol=tol, atol=tol,
    )
    # the updated running statistics must match too (phase-partition lemma)
    stol = 1e-5 if dtype == jnp.float32 else 5e-3
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p, np.float32), np.asarray(q, np.float32),
            rtol=stol, atol=stol,
        ),
        sa["batch_stats"], sb["batch_stats"],
    )


@pytest.mark.slow  # tiering: 73s; polyphase is opt-in (f64 gradient oracle)
def test_gradients_match_x64():
    """Gradient-path equivalence, proven in float64.

    At f32 the two (mathematically identical) programs associate their
    reductions differently; the resulting ~1e-7-level forward noise flips
    relu/max subgradient ties and is amplified by the BN rsqrt, so f32
    gradients agree only to ~1% — meaningless as a correctness gate.  In
    f64 the same comparison is tight.
    """
    jax.config.update("jax_enable_x64", True)
    try:
        a = UNet(output_channels=6, base_features=4, levels=2,
                 dtype=jnp.float64)
        b = UNet(output_channels=6, base_features=4, levels=2,
                 dtype=jnp.float64, polyphase_level0=True)
        x = jnp.asarray(RNG.random((2, 16, 16, 4)))
        va = a.init(jax.random.key(7), x, True)
        va = jax.tree.map(lambda p: p.astype(jnp.float64), va)

        def loss(net):
            def f(params):
                y, _ = net.apply(
                    {"params": params, "batch_stats": va["batch_stats"]},
                    x, True, mutable=["batch_stats"],
                )
                return jnp.sum(y * y)
            return f

        ga = jax.grad(loss(a))(va["params"])
        gb = jax.grad(loss(b))(va["params"])
        # 1e-6: the running-stat leaves stay f32 in BOTH nets (flax inits
        # batch_stats at f32), leaving an f32-epsilon-level residue; the
        # f32-noise floor this test exists to see past is ~1e-2.
        jax.tree.map(
            lambda p, q: np.testing.assert_allclose(
                np.asarray(p), np.asarray(q), rtol=1e-6, atol=1e-6,
            ),
            ga, gb,
        )
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow  # tiering: 36s; polyphase is opt-in
def test_remat_polyphase_compiles():
    _, b, x, _, vb = _trees(remat=True)
    y, _ = jax.jit(
        lambda v, x: b.apply(v, x, True, mutable=["batch_stats"])
    )(vb, x)
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_odd_size_falls_back():
    """Odd spatial sizes can't split into phases; the flag must no-op."""
    b = UNet(output_channels=2, base_features=4, levels=2,
             polyphase_level0=True)
    a = UNet(output_channels=2, base_features=4, levels=2)
    # 18x18: even, poly active; oddness is guarded at trace time via shape
    x = jnp.asarray(RNG.random((1, 20, 20, 3)).astype(np.float32))
    va = a.init(jax.random.key(0), x, True)
    ya = a.apply(va, x, False)
    yb = b.apply(va, x, False)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=3e-5, atol=3e-5)

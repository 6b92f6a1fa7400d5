"""Pallas transfer-apply kernel vs the cached-H jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from learned_hologram_gan_tpu.config import OpticsConfig
from learned_hologram_gan_tpu.ops import asm
from learned_hologram_gan_tpu.ops.pallas import (
    apply_transfer_stack,
    apply_transfer_stack_reference,
)

RNG = np.random.default_rng(31)


def test_pallas_transfer_matches_cached_h():
    optics = OpticsConfig(rows=16, cols=16, pad_size=0,
                          filter_radius_coefficient=0.45)
    ds = np.linspace(4e-4, 1e-3, 3).astype(np.float32)
    plan = asm.make_plan(optics, distances=ds)
    g0 = jnp.asarray(
        (RNG.random((2, 3, 16, 16)) + 1j * RNG.random((2, 3, 16, 16))).astype(np.complex64)
    )

    want = np.asarray(g0[:, None] * (plan.H * plan.mask)[None])

    got_ref = np.asarray(
        apply_transfer_stack_reference(g0, plan.w_grid, plan.mask, jnp.asarray(ds))
    )
    np.testing.assert_allclose(got_ref, want, atol=1e-6)

    got_pl = np.asarray(
        apply_transfer_stack(
            g0, plan.w_grid, plan.mask, jnp.asarray(ds),
            tile_rows=8, interpret=True,
        )
    )
    np.testing.assert_allclose(got_pl, want, atol=1e-6)


def test_pallas_transfer_uneven_batch_and_tiles():
    optics = OpticsConfig(rows=32, cols=16, pad_size=0,
                          filter_radius_coefficient=0.45)
    ds = np.array([1e-3], dtype=np.float32)
    plan = asm.make_plan(optics, distances=ds)
    g0 = jnp.asarray(
        (RNG.random((1, 3, 32, 16)) + 1j * RNG.random((1, 3, 32, 16))).astype(np.complex64)
    )
    want = np.asarray(g0[:, None] * (plan.H * plan.mask)[None])
    got = np.asarray(
        apply_transfer_stack(g0, plan.w_grid, plan.mask, jnp.asarray(ds),
                             tile_rows=16, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)

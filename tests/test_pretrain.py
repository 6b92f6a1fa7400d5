"""Per-stage pre-training loops: run + loss decreases + checkpoints."""

import os

import jax
import numpy as np
import pytest

from learned_hologram_gan_tpu.config import OpticsConfig
from learned_hologram_gan_tpu.models import AP2POH, RGBD2AP
from learned_hologram_gan_tpu.ops import asm
from learned_hologram_gan_tpu.train.pretrain import (
    ReduceLROnPlateau,
    train_ap2poh,
    train_rgbd2ap,
)

RNG = np.random.default_rng(11)


def test_reduce_lr_on_plateau_semantics():
    s = ReduceLROnPlateau(lr=1.0, factor=0.1, patience=2, threshold=1e-3)
    assert s.step(1.0) == 1.0          # first value becomes best
    assert s.step(0.5) == 1.0          # improvement
    assert s.step(0.5) == 1.0          # bad 1
    assert s.step(0.5) == 1.0          # bad 2 (== patience)
    assert s.step(0.5) == 0.1          # bad 3 > patience -> decay
    # floors at min_lr
    s2 = ReduceLROnPlateau(lr=1e-6, factor=0.1, patience=0)
    s2.step(1.0)
    assert s2.step(1.0) == 1e-6


@pytest.mark.slow  # tiering: 83s; ap2poh smoke + quality_run cover the loop
def test_train_rgbd2ap_smoke(tmp_path):
    model = RGBD2AP(base_features=2)
    rgbd = RNG.random((2, 4, 16, 16)).astype(np.float32)
    amp = RNG.random((2, 3, 16, 16)).astype(np.float32)
    phs = RNG.random((2, 3, 16, 16)).astype(np.float32)
    variables = model.init(jax.random.key(0), rgbd)
    batches = lambda: iter([(rgbd, amp, phs)] * 3)
    save = str(tmp_path / "rgbd2ap.msgpack")
    params, bs, train_hist, val_hist = train_rgbd2ap(
        model, variables["params"], variables["batch_stats"],
        batches, lambda: iter([(rgbd, amp, phs)]),
        epochs=3, lr=1e-2, save_path=save, checkpoint_iterval=2,
    )
    assert train_hist[-1] < train_hist[0]
    assert os.path.exists(save)
    assert os.path.exists(str(tmp_path / "rgbd2ap_epoch2.msgpack"))


def test_train_ap2poh_smoke(tmp_path):
    optics = OpticsConfig(rows=16, cols=16, pad_size=4,
                          filter_radius_coefficient=0.45)
    plan = asm.make_plan(optics, distances=[1e-3])
    model = AP2POH(kernel_size=3)
    amp = RNG.random((2, 3, 16, 16)).astype(np.float32)
    phs = (RNG.random((2, 3, 16, 16)).astype(np.float32)) * 2 * np.pi
    variables = model.init(jax.random.key(0), plan, amp, phs)
    params, bs, train_hist, val_hist = train_ap2poh(
        model, plan, variables["params"],
        lambda: iter([(amp, phs)] * 3), lambda: iter([(amp, phs)]),
        epochs=2, lr=1e-2, save_path=str(tmp_path / "ap2poh.msgpack"),
    )
    assert np.isfinite(train_hist).all()
    assert os.path.exists(str(tmp_path / "ap2poh.msgpack"))


def test_train_ap2poh_under_spatial_mesh(tmp_path):
    """Stage-2 pretraining (the natural high-res pretraining user) must run
    spatially sharded via asm.spatial_mesh with finite decreasing loss —
    no double-grad here, so the whole loop rides the pencil FFTs directly."""
    from learned_hologram_gan_tpu.parallel import make_mesh

    optics = OpticsConfig(rows=16, cols=16, pad_size=8,  # padded 32 % 8 == 0
                          filter_radius_coefficient=0.45)
    plan = asm.make_plan(optics, distances=[1e-3])
    model = AP2POH(kernel_size=3)
    amp = RNG.random((2, 3, 16, 16)).astype(np.float32)
    phs = (RNG.random((2, 3, 16, 16)).astype(np.float32)) * 2 * np.pi
    variables = model.init(jax.random.key(0), plan, amp, phs)
    with asm.spatial_mesh(make_mesh()):
        params, bs, train_hist, val_hist = train_ap2poh(
            model, plan, variables["params"],
            lambda: iter([(amp, phs)] * 3), lambda: iter([(amp, phs)]),
            epochs=2, lr=1e-2, save_path=str(tmp_path / "ap2poh.msgpack"),
        )
    assert np.isfinite(train_hist).all()

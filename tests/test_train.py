"""End-to-end training smoke tests on tiny shapes (synthetic data).

Mirrors the reference test strategy gap (SURVEY.md section 4): train a few
steps, assert losses are finite / decrease, checkpoints roundtrip, ablation
variants run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learned_hologram_gan_tpu.train import (
    Watermelon,
    checkpoint as ckpt_lib,
    watermelon_without_GAN,
)

RNG = np.random.default_rng(9)
SHAPE = dict(rows=16, cols=16)


def tiny_trainer(**kw):
    defaults = dict(
        filter_radius_coefficient=0.45,
        pad_size=4,
        distance_stack=np.linspace(-4e-4, 0.0, 5)[:-1],
        input_shape=(2, 4, 16, 16),
        use_gan=True,
        perceptual="none",
        unet_base_features=2,
        feature_d=2,
    )
    defaults.update(kw)
    return Watermelon(**defaults)


def synthetic_batches(n_batches=2, batch=2):
    out = []
    for _ in range(n_batches):
        rgbd = RNG.random((batch, 4, 16, 16)).astype(np.float32)
        amp = RNG.random((batch, 3, 16, 16)).astype(np.float32)
        phs = RNG.random((batch, 3, 16, 16)).astype(np.float32)
        out.append((rgbd, amp, phs))
    return out


def test_gan_training_runs_and_records_history(tmp_path):
    trainer = tiny_trainer()
    train_data = synthetic_batches(2)
    val_data = synthetic_batches(1)
    hist = trainer.train(
        data_loader_train=lambda: iter(train_data),
        data_loader_val=lambda: iter(val_data),
        epoch_num=2,
        info_print_interval=2,
        info_plot_interval=1000,
        checkpoint_iterval=1,
        discriminator_train_ratio=2,
        save_path_G=str(tmp_path / "G.msgpack"),
        save_path_D=str(tmp_path / "D.msgpack"),
        loss_metrics_file=str(tmp_path / "hist.json"),
    )
    # history recorded with the reference's key layout
    assert hist["n_batch"] == [2, 4]
    for k in ("focal_phase_gradient_loss", "G_loss", "D_loss"):
        assert len(hist["train_losses_tensor"][k]) == 2
        assert np.isfinite(hist["train_losses_tensor"][k]).all()
    assert os.path.exists(tmp_path / "hist.json")
    # epoch checkpoints + final saves exist
    assert os.path.exists(tmp_path / "G_epoch0.msgpack")
    assert os.path.exists(tmp_path / "G.msgpack")
    assert os.path.exists(tmp_path / "D.msgpack")


@pytest.mark.slow  # tiering: 65s; default tier keeps the composed-path GAN e2e
def test_two_h_hat_step_tracks_composed_path():
    """One train step with two_h_hat=True stays within the documented O(1e-3)
    deviation of the composed-spectrum path (same seed, same batch)."""
    from learned_hologram_gan_tpu.config import LossConfig
    from learned_hologram_gan_tpu.train.steps import build_train_step

    batch = jax.tree.map(jnp.asarray, synthetic_batches(1)[0])
    metrics = {}
    for flag in (False, True):
        trainer = tiny_trainer(two_h_hat=flag)
        trainer._init_state(7, 1e-3, 1e-3)
        loss_cfg = LossConfig(perceptual="none")
        step = build_train_step(
            trainer.generator, trainer.discriminator, trainer.tx_G,
            trainer.tx_D, loss_cfg, use_gan=True,
            discriminator_train_ratio=2, discriminator_lambda=10.0,
            two_h_hat=flag,
        )
        _, m = step(trainer.state, batch, trainer.gen_plan, trainer.multi_plan)
        metrics[flag] = {k: float(v) for k, v in m.items()}
    for k, v in metrics[False].items():
        assert np.isfinite(metrics[True][k]), k
        np.testing.assert_allclose(
            metrics[True][k], v, rtol=2e-2, atol=2e-3, err_msg=k
        )


@pytest.mark.slow
def test_without_gan_matches_reference_overrides(tmp_path):
    trainer = watermelon_without_GAN(
        filter_radius_coefficient=0.45, pad_size=4,
        distance_stack=np.linspace(-4e-4, 0.0, 5)[:-1],
        input_shape=(2, 4, 16, 16), perceptual="none",
        unet_base_features=2, feature_d=2,
    )
    hist = trainer.train(
        data_loader_train=lambda: iter(synthetic_batches(2)),
        data_loader_val=lambda: iter(synthetic_batches(1)),
        epoch_num=1, info_print_interval=2, checkpoint_iterval=5,
    )
    # D never trained, gan term zero
    assert hist["train_losses_tensor"]["D_loss"] == [0.0]
    assert hist["train_losses_tensor"]["gan_loss"] == [0.0]


def test_training_reduces_loss_on_fixed_batch():
    """Overfit one batch for a few steps; the pixel loss must go down.

    (The total G loss is dominated by the focal phase-gradient term, whose
    target changes with the per-step random distance draw — the pixel MSE is
    the stable signal to assert on.)
    """
    trainer = tiny_trainer(use_gan=False)
    batch = synthetic_batches(1)[0]
    data = [batch] * 6
    hist = trainer.train(
        data_loader_train=lambda: iter(data),
        data_loader_val=lambda: iter([batch]),
        epoch_num=1, info_print_interval=1, checkpoint_iterval=10,
        discriminator_train_ratio=0,
    )
    losses = hist["train_losses_tensor"]["pixel_loss"]
    assert losses[-1] < losses[0]


def test_generator_checkpoint_roundtrip(tmp_path):
    trainer = tiny_trainer(use_gan=False)
    trainer._init_state(0, 1e-3, 1e-3)
    path = str(tmp_path / "gen.msgpack")
    ckpt_lib.save_generator(trainer.state, path)

    trainer2 = tiny_trainer(use_gan=False, pretrained_model_path_G=path)
    trainer2._init_state(1, 1e-3, 1e-3)
    for a, b in zip(
        jax.tree.leaves(trainer.state.params_G),
        jax.tree.leaves(trainer2.state.params_G),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_full_state_roundtrip(tmp_path):
    trainer = tiny_trainer(use_gan=False)
    trainer._init_state(0, 1e-3, 1e-3)
    d = str(tmp_path / "ckpts")
    ckpt_lib.save_train_state(trainer.state, d, step=3)
    restored = ckpt_lib.restore_latest(d, trainer.state)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(trainer.state.params_G),
                    jax.tree.leaves(restored.params_G)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_async_save_then_wait_roundtrip(tmp_path):
    """wait=False saves finalize after wait_for_saves(); newest wins restore."""
    trainer = tiny_trainer(use_gan=False)
    trainer._init_state(0, 1e-3, 1e-3)
    d = str(tmp_path / "ckpts")
    ckpt_lib.save_train_state(trainer.state, d, step=1, wait=False)
    ckpt_lib.save_train_state(trainer.state, d, step=7, wait=False)
    ckpt_lib.wait_for_saves()
    assert ckpt_lib.latest_step_dir(d).endswith("step_7")
    restored = ckpt_lib.restore_latest(d, trainer.state)
    for a, b in zip(jax.tree.leaves(trainer.state.params_G),
                    jax.tree.leaves(restored.params_G)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_determinism_same_seed_same_step():
    """Functional PRNG threading: same seed => bitwise-identical step output."""
    batch = synthetic_batches(1)[0]
    results = []
    for _ in range(2):
        trainer = tiny_trainer(use_gan=False)
        hist = trainer.train(
            data_loader_train=lambda: iter([batch]),
            data_loader_val=lambda: iter([batch]),
            epoch_num=1, info_print_interval=1, checkpoint_iterval=10,
            seed=42,
        )
        results.append(hist["train_losses_tensor"]["G_loss"][0])
    assert results[0] == results[1]


@pytest.mark.slow
def test_gan_training_with_vgg_perceptual_path():
    """The VGG perceptual branch must run inside the jitted step
    (explicit random-weight opt-in; 5 taps down to 1x1 at 16x16 input)."""
    trainer = tiny_trainer(use_gan=False, perceptual="random")
    batch = synthetic_batches(1)[0]
    hist = trainer.train(
        data_loader_train=lambda: iter([batch]),
        data_loader_val=lambda: iter([batch]),
        epoch_num=1, info_print_interval=1, checkpoint_iterval=10,
    )
    p = hist["train_losses_tensor"]["perceptual_loss"][0]
    assert np.isfinite(p) and p > 0.0


def test_vgg19_without_weights_is_a_loud_error():
    """perceptual='vgg19' with no converted weights must raise, not silently
    train against a random VGG (round-1 verdict item #6)."""
    with pytest.raises(FileNotFoundError, match="random"):
        tiny_trainer(use_gan=False, perceptual="vgg19")


@pytest.mark.slow
def test_resume_kill_restart(tmp_path):
    """Kill-and-restart with resume_dir must be bitwise-equal to an
    uninterrupted run: full state (params, opt states, RNG key, step) is
    checkpointed and the deterministic loaders fast-forward on resume."""
    batches = synthetic_batches(4)

    def make_loader():
        # 2 batches per epoch, deterministic across runs, keyed off a counter
        state = {"epoch": 0}

        def loader():
            e = state["epoch"] % 2
            state["epoch"] += 1
            return iter(batches[2 * e : 2 * e + 2])

        return loader

    common = dict(
        data_loader_val=lambda: iter(batches[:1]),
        info_print_interval=100, checkpoint_iterval=1,
        discriminator_train_ratio=1, seed=7,
    )

    # uninterrupted 2-epoch run
    t_full = tiny_trainer()
    t_full.train(data_loader_train=make_loader(), epoch_num=2, **common)

    # run 1: train 1 epoch, checkpointing full state into resume_dir
    resume_dir = str(tmp_path / "resume")
    t1 = tiny_trainer()
    t1.train(data_loader_train=make_loader(), epoch_num=1,
             resume_dir=resume_dir, **common)
    assert ckpt_lib.latest_step_dir(resume_dir) is not None

    # run 2 ("restart"): fresh trainer, same resume_dir, full 2-epoch target
    t2 = tiny_trainer()
    t2.train(data_loader_train=make_loader(), epoch_num=2,
             resume_dir=resume_dir, **common)

    assert int(t2.state.step) == int(t_full.state.step)
    for a, b in zip(jax.tree.leaves(t_full.state.params_G),
                    jax.tree.leaves(t2.state.params_G)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(t_full.state.opt_state_G),
                    jax.tree.leaves(t2.state.opt_state_G)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(t_full.state.key)),
        np.asarray(jax.random.key_data(t2.state.key)),
    )


@pytest.mark.slow  # tiering: 83s; kill-restart resume stays in the default gate
def test_resume_chunked_no_fast_forward(tmp_path):
    """Chunked resume (start_epoch + resume_data_fast_forward=False) must be
    bitwise-equal to an uninterrupted run when the caller positions the
    loaders for start_epoch — the streaming-loader escape hatch for the
    relay's pinned-H2D leak (quality_run --streaming --start_epoch)."""
    batches = synthetic_batches(4)

    def make_loader(start=0):
        state = {"epoch": start}

        def loader():
            e = state["epoch"] % 2
            state["epoch"] += 1
            return iter(batches[2 * e : 2 * e + 2])

        return loader

    common = dict(
        data_loader_val=lambda: iter(batches[:1]),
        info_print_interval=100, checkpoint_iterval=1,
        discriminator_train_ratio=1, seed=7,
    )

    t_full = tiny_trainer()
    t_full.train(data_loader_train=make_loader(), epoch_num=2, **common)

    resume_dir = str(tmp_path / "resume")
    t1 = tiny_trainer()
    t1.train(data_loader_train=make_loader(), epoch_num=1,
             resume_dir=resume_dir, **common)

    # chunk 2: fresh process, loader pre-positioned at epoch 1, no replay
    t2 = tiny_trainer()
    t2.train(data_loader_train=make_loader(start=1), epoch_num=2,
             start_epoch=1, resume_data_fast_forward=False,
             resume_dir=resume_dir, **common)

    assert int(t2.state.step) == int(t_full.state.step)
    for a, b in zip(jax.tree.leaves(t_full.state.params_G),
                    jax.tree.leaves(t2.state.params_G)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(t_full.state.opt_state_G),
                    jax.tree.leaves(t2.state.opt_state_G)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_validation_ragged_batches_bounded_compiles_exact_metrics(tmp_path):
    """A short final val batch compiles at most once more (shape-cached, NOT
    once per epoch — round-1 verdict item #10) and its metrics are EXACT:
    an earlier padding-by-edge-repetition scheme hit one compile but
    over-weighted the duplicated tail sample in every recorded scalar."""
    trainer = tiny_trainer(use_gan=False)
    full = synthetic_batches(1, batch=2)[0]
    tail = synthetic_batches(1, batch=1)[0]
    ragged_val = [full, tail]
    trainer.train(
        data_loader_train=lambda: iter(synthetic_batches(1)),
        data_loader_val=lambda: iter(ragged_val),
        epoch_num=2, info_print_interval=1, checkpoint_iterval=10,
    )
    # one signature per distinct val batch shape, NOT per epoch
    assert trainer._eval_cache_size == 2

    # exactness: epoch average == mean of per-batch evals on the raw batches
    from learned_hologram_gan_tpu.config import LossConfig
    from learned_hologram_gan_tpu.train.steps import build_eval_step

    eval_step = build_eval_step(
        trainer.generator, trainer.discriminator,
        LossConfig(perceptual="none", use_gan=False)
        if "use_gan" in LossConfig.__dataclass_fields__
        else LossConfig(perceptual="none"),
    )
    got = trainer._validate(eval_step, lambda: iter(ragged_val))
    m_full = eval_step(trainer.state, tuple(jnp.asarray(x) for x in full),
                       trainer.gen_plan, trainer.multi_plan)
    m_tail = eval_step(trainer.state, tuple(jnp.asarray(x) for x in tail),
                       trainer.gen_plan, trainer.multi_plan)
    for k in ("pixel_loss", "PSNR", "SSIM"):
        want = (float(m_full[k]) + float(m_tail[k])) / 2.0
        np.testing.assert_allclose(got[k], want, rtol=1e-6)


@pytest.mark.parametrize("factory_name,expect", [
    ("watermelon", dict(use_gan=True)),
    ("watermelon_without_GAN", dict(use_gan=False)),
    ("watermelon_without_GAN_without_modulation",
     dict(use_gan=False, use_modulation=False)),
    ("watermelon_without_GAN_without_perceptual_loss",
     dict(use_gan=False, perceptual="none")),
    ("watermelon_without_GAN_and_plain_phase_loss",
     dict(use_gan=False, phase_loss="plain")),
    ("watermelon_without_GAN_and_focal_sincos_phase_loss",
     dict(use_gan=False, phase_loss="focal_sincos")),
    ("watermelon_without_GAN_and_phase_sincos_gradient_loss",
     dict(use_gan=False, phase_loss="sincos_gradient")),
])
@pytest.mark.slow
def test_ablation_factories_train_one_step(factory_name, expect):
    """Each of the reference's 7 trainer variants (watermelon.py:640-938 +
    the base class) must construct with its override and run one step with a
    finite loss."""
    import importlib

    # the train package re-exports the `watermelon` factory *function*, which
    # shadows the submodule attribute — resolve the module explicitly
    wm_mod = importlib.import_module("learned_hologram_gan_tpu.train.watermelon")
    factory = getattr(wm_mod, factory_name)
    trainer = factory(
        filter_radius_coefficient=0.45, pad_size=4,
        distance_stack=np.linspace(-4e-4, 0.0, 5)[:-1],
        input_shape=(2, 4, 16, 16), perceptual=expect.get("perceptual", "none"),
        unet_base_features=2, feature_d=2,
    )
    assert trainer.use_gan == expect["use_gan"]
    if "use_modulation" in expect:
        assert trainer.gen_config.use_modulation == expect["use_modulation"]
    if "phase_loss" in expect:
        assert trainer._loss_defaults["phase_loss"] == expect["phase_loss"]
    batch = synthetic_batches(1)[0]
    hist = trainer.train(
        data_loader_train=lambda: iter([batch]),
        data_loader_val=lambda: iter([batch]),
        epoch_num=1, info_print_interval=1, checkpoint_iterval=10,
        discriminator_train_ratio=1, seed=5,
    )
    assert np.isfinite(hist["train_losses_tensor"]["G_loss"][0])


def test_freeze_part1_pins_part1_while_part2_and_D_move():
    """freeze_part1=True (reference RGBD2AP.py:37-41: requires_grad=False on
    every stage-1 parameter) must leave part1 params BITWISE unchanged over
    several GAN steps while part2 and the critic keep training."""
    trainer = tiny_trainer(freeze_part1=True)
    trainer._init_state(3, 1e-3, 1e-3)
    # the jitted step donates the state buffers — snapshot to host first
    before = jax.device_get(
        {"part1": trainer.state.params_G["part1"],
         "part2": trainer.state.params_G["part2"],
         "D": trainer.state.params_D}
    )
    from learned_hologram_gan_tpu.config import LossConfig
    from learned_hologram_gan_tpu.train.steps import build_train_step

    step = build_train_step(
        trainer.generator, trainer.discriminator, trainer.tx_G, trainer.tx_D,
        LossConfig(perceptual="none"), use_gan=True,
        discriminator_train_ratio=2, discriminator_lambda=10.0,
    )
    state = trainer.state
    for batch in synthetic_batches(3):
        state, _ = step(
            state, jax.tree.map(jnp.asarray, batch),
            trainer.gen_plan, trainer.multi_plan,
        )
    for leaf0, leaf1 in zip(
        jax.tree.leaves(before["part1"]),
        jax.tree.leaves(state.params_G["part1"]),
    ):
        np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(leaf1))
    # part2 and the critic must have actually moved
    moved = lambda a, b: any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )
    assert moved(before["part2"], state.params_G["part2"])
    assert moved(before["D"], state.params_D)


def test_resume_freeze_part1_mismatch_is_a_named_error(tmp_path):
    """Resuming a resume_dir written under the opposite freeze_part1 setting
    must fail LOUDLY with an error naming the flag — the raw failure mode is
    an opt_state structure mismatch deep in deserialization (multi_transform
    with no part1 Adam state vs plain adam) that never mentions freeze_part1
    (round-4 ADVICE)."""
    resume_dir = str(tmp_path / "resume")
    common = dict(
        data_loader_train=lambda: iter([]),
        data_loader_val=lambda: iter([]),
        epoch_num=0,
        resume_dir=resume_dir,
    )
    # first run stamps meta.json with freeze_part1=False
    tiny_trainer().train(**common)
    assert os.path.exists(os.path.join(resume_dir, "meta.json"))
    # opposite setting against the same dir: error that names the flag
    with pytest.raises(ValueError, match="freeze_part1"):
        tiny_trainer(freeze_part1=True).train(**common)
    # same setting is accepted (no checkpoint yet -> fresh start, no raise)
    tiny_trainer().train(**common)


def test_unfrozen_part1_moves():
    """Control for the freeze test: the default optimizer moves part1."""
    trainer = tiny_trainer()
    trainer._init_state(3, 1e-3, 1e-3)
    before = jax.device_get(trainer.state.params_G["part1"])
    from learned_hologram_gan_tpu.config import LossConfig
    from learned_hologram_gan_tpu.train.steps import build_train_step

    step = build_train_step(
        trainer.generator, trainer.discriminator, trainer.tx_G, trainer.tx_D,
        LossConfig(perceptual="none"), use_gan=True,
        discriminator_train_ratio=1, discriminator_lambda=10.0,
    )
    batch = synthetic_batches(1)[0]
    state, _ = step(
        trainer.state, jax.tree.map(jnp.asarray, batch),
        trainer.gen_plan, trainer.multi_plan,
    )
    assert any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(
            jax.tree.leaves(before),
            jax.tree.leaves(state.params_G["part1"]),
        )
    )

"""The "watermelon" GAN trainer: epoch driver + checkpointing + metrics.

Rebuild of reference ``watermelon_hologram/watermelon.py`` (938 LoC).  The
per-batch math lives in jitted pure functions (:mod:`.steps`); this module is
the thin Python orchestration around them: epoch/batch loops, periodic
validation, the nested loss/metric history dict (saved as JSON with the exact
reference key layout, watermelon.py:169-194), Orbax checkpoints with the
reference's ``_epoch{n}`` naming idiom (watermelon.py:361-374), and periodic
reconstruction visualizations (watermelon.py:325-355).

The reference's six ablation subclasses (watermelon.py:640-938) are factory
functions here — ablations differ only in config (phase-loss variant,
perceptual on/off, GAN on/off, modulation on/off), not in code structure.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import optax

from ..config import DiscriminatorConfig, GeneratorConfig, LossConfig
from ..losses import load_vgg19_params
from ..models import make_generator_plan
from ..ops import asm
from ..utils.normalize import tensor_normalizor_2d
from . import checkpoint as ckpt_lib
from .state import TrainState, build_modules, create_train_state
from .steps import build_eval_step, build_infer_fn, build_train_step

LOSS_KEYS = (
    "focal_phase_gradient_loss",
    "perceptual_loss",
    "pixel_loss",
    "TV_loss",
    "gan_loss",
    "G_loss",
    "D_loss",
)
METRIC_KEYS = ("PSNR", "SSIM")


def default_distance_stack() -> np.ndarray:
    """linspace(-1.5e-4, 0, 8)[:-1] (reference watermelon.py:39)."""
    return np.linspace(-1.5e-4, 0.0, 8)[:-1]


class Watermelon:
    """Driver with constructor parity to reference ``watermelon`` (:34-90)."""

    def __init__(
        self,
        filter_radius_coefficient: float = 0.5,
        pad_size: int = 416,
        kernel_size: int = 3,
        distance_stack: Optional[Sequence[float]] = None,
        pretrained_model_path_G: Optional[str] = None,
        pretrained_model_path_D: Optional[str] = None,
        pretrained_part1_path: Optional[str] = None,
        pretrained_part2_path: Optional[str] = None,
        freeze_part1: bool = False,
        input_shape: Tuple[int, int, int, int] = (1, 4, 192, 192),
        # --- rebuild-specific extensions (ablation + precision knobs) ---
        use_gan: bool = True,
        use_modulation: bool = True,
        phase_loss: str = "focal_sincos_gradient",
        perceptual: str = "vgg19",
        perceptual_weights_path: Optional[str] = None,
        dtype: str = "float32",
        unet_base_features: int = 64,
        feature_d: int = 32,
        remat: bool = False,
        cache_h: bool = True,
        spatial_mesh=None,
        critic_batching: str = "pair",
        two_h_hat: bool = False,
        polyphase_level0: bool = False,
        pad_cols_override: Optional[int] = None,
    ):
        # remat + cache_h=False are the single-chip high-resolution levers:
        # activation checkpointing through the UNet, and no cached transfer-
        # function stack in HBM (H computed on the fly / in the fused kernel).
        # spatial_mesh (a jax.sharding.Mesh) is the MULTI-chip one: every
        # propagation FFT becomes a shard_map pencil FFT with the padded row
        # axis split across the mesh (asm.spatial_mesh) — the 4K-training
        # layout where no device holds a full padded plane.
        rows, cols = input_shape[-2], input_shape[-1]
        if distance_stack is None:
            distance_stack = default_distance_stack()
        self.distance_stack = np.asarray(distance_stack, dtype=np.float32)
        self.distance_num = len(self.distance_stack)
        self.input_shape = input_shape

        self.gen_config = GeneratorConfig(
            rows=rows,
            cols=cols,
            pad_size=pad_size,
            filter_radius_coefficient=filter_radius_coefficient,
            kernel_size=kernel_size,
            distance=1e-3,  # reference watermelon.py:58
            use_modulation=use_modulation,
            dtype=dtype,
            unet_base_features=unet_base_features,
            remat=remat,
            polyphase_level0=polyphase_level0,
            # 4K lever: the aspect-derived col pad lands on an FFT-hostile
            # length (2176x3840 + pad 320 -> 4970 = 2*5*7*71, Bluestein OOM);
            # pass utils/fftlen.good_fft_pads' 5-smooth pick instead.
            pad_cols_override=pad_cols_override,
        )
        self.disc_config = DiscriminatorConfig(feature_d=feature_d, dtype=dtype)
        self.spatial_mesh = spatial_mesh
        self.use_gan = use_gan
        self.critic_batching = critic_batching
        self.two_h_hat = two_h_hat
        self._loss_defaults = dict(
            phase_loss=phase_loss,
            perceptual=perceptual,
            perceptual_weights_path=perceptual_weights_path,
        )

        # plans: fixed 1mm for the generator, distance stack for recon losses.
        # A spatial mesh is bound INTO the plans (cache-key-safe, see
        # asm.PropagatorPlan.with_spatial) — every jitted consumer (train/
        # eval/infer) then keys its executable on the spatial mode instead of
        # relying on the ambient asm.spatial_mesh context (round-2 VERDICT #5).
        self.gen_plan = make_generator_plan(self.gen_config, cache_h=cache_h)
        self.multi_plan = asm.make_plan(
            self.gen_config.optics(), distances=self.distance_stack,
            cache_h=cache_h,
        )
        if spatial_mesh is not None:
            self.gen_plan = self.gen_plan.with_spatial(spatial_mesh)
            self.multi_plan = self.multi_plan.with_spatial(spatial_mesh)

        self.generator, self.discriminator = build_modules(
            self.gen_config, self.disc_config, use_gan
        )
        if perceptual == "none":
            self.vgg_params = None
        else:
            # "vgg19" raises without a weights file; "random" is the loud,
            # explicit opt-in (see losses/perceptual.py + VERDICT round 1 #6)
            self.vgg_params, self.vgg_pretrained = load_vgg19_params(
                perceptual_weights_path, mode=perceptual
            )

        self.pretrained_model_path_G = pretrained_model_path_G
        self.pretrained_model_path_D = pretrained_model_path_D
        # per-part pretrained weights for the two-stage pretrain->fine-tune
        # workflow (reference generator.py:26-28 / RGBD2AP.py:37-41)
        self.pretrained_part1_path = pretrained_part1_path
        self.pretrained_part2_path = pretrained_part2_path
        # Reference RGBD2AP.py:37-41: load part1 pretrained and set
        # requires_grad=False on every part1 parameter — train stage 2
        # against a frozen stage 1.  Torch semantics freeze *parameters*
        # only; BatchNorm running stats keep updating in train mode, and so
        # do ours (batch_stats_G['part1'] is not pinned).
        self.freeze_part1 = freeze_part1

        self.state: Optional[TrainState] = None
        self.infer_fn = build_infer_fn(self.generator)

    # ------------------------------------------------------------------
    def _init_state(self, seed: int, lr_G: float, lr_D: float) -> None:
        if self.freeze_part1:
            # Zero every part1 update (reference RGBD2AP.py:37-41's
            # requires_grad=False).  multi_transform keeps NO Adam state for
            # the frozen subtree, so a frozen run cannot drift part1 even
            # through optimizer-state rounding, and checkpoints stay smaller.
            import jax as _jax

            def _labels(params):
                return {
                    k: _jax.tree.map(
                        lambda _: "frozen" if k == "part1" else "trainable", v
                    )
                    for k, v in params.items()
                }

            self.tx_G = optax.multi_transform(
                {"trainable": optax.adam(lr_G), "frozen": optax.set_to_zero()},
                _labels,
            )
        else:
            self.tx_G = optax.adam(lr_G)
        self.tx_D = optax.adam(lr_D)
        self.state = create_train_state(
            seed,
            self.generator,
            self.discriminator,
            self.gen_plan,
            self.tx_G,
            self.tx_D,
            input_shape=self.input_shape,
            vgg_params=self.vgg_params,
        )
        if self.pretrained_model_path_G:
            self.state = ckpt_lib.load_generator(self.state, self.pretrained_model_path_G)
            print(f"Generator loaded from {self.pretrained_model_path_G}")
        if self.pretrained_model_path_D:
            self.state = ckpt_lib.load_discriminator(self.state, self.pretrained_model_path_D)
            print(f"Discriminator loaded from {self.pretrained_model_path_D}")
        if self.pretrained_part1_path:
            self.state = ckpt_lib.load_generator_part(
                self.state, self.pretrained_part1_path, "part1")
        if self.pretrained_part2_path:
            self.state = ckpt_lib.load_generator_part(
                self.state, self.pretrained_part2_path, "part2")

    # ------------------------------------------------------------------
    def train(
        self,
        data_loader_train: Iterable,
        data_loader_val: Iterable,
        phs_gradient_loss_weight: float = 1.0,
        perceptual_loss_weight: float = 1.0,
        pixel_loss_weight: float = 1.0,
        TV_loss_weight: float = 1e-3,
        discriminator_loss_weight: float = 1.0,
        epoch_num: int = 2,
        lr_G: float = 1e-3,
        lr_D: float = 1e-3,
        save_path_G: Optional[str] = None,
        save_path_D: Optional[str] = None,
        info_print_interval: int = 100,
        info_plot_interval: int = 600,
        loss_metrics_file: Optional[str] = None,
        save_path_img: Optional[str] = None,
        checkpoint_iterval: int = 5,
        discriminator_train_ratio: int = 2,
        discriminator_lambda: float = 10.0,
        step_scheduler_G_gamma: float = 0.1,
        step_scheduler_D_gamma: float = 0.9999,
        visualization_RGBD_AP=None,
        seed: int = 122731,
        resume_dir: Optional[str] = None,
        start_epoch: int = 0,
        resume_data_fast_forward: bool = True,
    ) -> Dict[str, Any]:
        """Full GAN training loop (reference watermelon.train, :92-416).

        ``data_loader_{train,val}`` are callables returning a fresh epoch
        iterator of (RGBD, amp, phs) numpy/jnp batch tuples, or reusable
        iterables.  The two ``step_scheduler_*_gamma`` arguments are accepted
        for flag parity; like the reference (LR schedulers commented out,
        watermelon.py:140-160) they are unused.

        ``resume_dir`` enables crash/preemption recovery the reference lacks:
        the full :class:`TrainState` (both nets, both optimizer states, the
        RNG key, the step counter) plus the metrics history are checkpointed
        there at every epoch checkpoint, and a restart with the same
        ``resume_dir`` restores the latest state and fast-forwards the
        (deterministic) loaders to the right batch — bitwise-identical to an
        uninterrupted run (tests/test_train.py::test_resume_kill_restart).

        ``start_epoch`` + ``resume_data_fast_forward=False`` support *chunked*
        runs (N epochs per process, resume, repeat — how multi-hour streaming
        runs bound the axon relay's pinned-H2D-buffer leak, see
        data/device.py): fast-forward replays every already-trained batch
        through the loader just to discard it, which for a streaming loader
        re-transfers O(epochs²) data over the host link across chunks.  With
        fast-forward off, the caller promises the loaders are already
        positioned for ``start_epoch`` (seed them with an epoch offset) and
        the loop simply runs epochs [start_epoch, epoch_num).
        """
        if save_path_G is None:
            print("!!!!!!The save path of the generator is not specified, "
                  "the model will not be saved!!!!!!")
        if save_path_D is None:
            print("!!!!!!The save path of the discriminator is not specified, "
                  "the model will not be saved!!!!!!")

        if not self.use_gan:
            # reference watermelon_without_GAN.train (:667-715)
            discriminator_loss_weight = 0.0
            discriminator_train_ratio = 0
            discriminator_lambda = 0.0

        loss_cfg = LossConfig(
            phs_gradient_loss_weight=phs_gradient_loss_weight,
            perceptual_loss_weight=perceptual_loss_weight,
            pixel_loss_weight=pixel_loss_weight,
            tv_loss_weight=TV_loss_weight,
            discriminator_loss_weight=discriminator_loss_weight,
            **self._loss_defaults,
        )

        self._init_state(seed, lr_G, lr_D)
        train_step = build_train_step(
            self.generator, self.discriminator, self.tx_G, self.tx_D,
            loss_cfg, self.use_gan, discriminator_train_ratio, discriminator_lambda,
            remat=self.gen_config.remat, spatial_mesh=self.spatial_mesh,
            critic_batching=self.critic_batching, two_h_hat=self.two_h_hat,
        )
        eval_step = build_eval_step(self.generator, self.discriminator, loss_cfg)

        history = {
            "epoch": [], "n_batch_in_epoch": [], "n_train": [], "n_batch": [],
            "train_losses_tensor": {k: [] for k in LOSS_KEYS},
            "train_metrics_tensor": {k: [] for k in METRIC_KEYS},
            "validate_losses_tensor": {k: [] for k in LOSS_KEYS},
            "validate_metrics_tensor": {k: [] for k in METRIC_KEYS},
        }

        train_acc = {k: 0.0 for k in LOSS_KEYS + METRIC_KEYS}
        acc_last = dict(train_acc)
        n_train = n_batch = n_batch_last = 0
        pending_metrics = None  # one-step-delayed metric fetch (see hot loop)

        start_step = 0
        if resume_dir is not None:
            # freeze_part1 changes the generator opt_state STRUCTURE
            # (multi_transform with no Adam state for part1 vs plain adam),
            # so restoring a checkpoint written under the opposite setting
            # fails deep inside deserialization with a structure-mismatch
            # error that never mentions the flag.  Guard with explicit
            # metadata and name the flag (round-4 ADVICE).
            meta_path = os.path.join(resume_dir, "meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                if meta.get("freeze_part1") != self.freeze_part1:
                    raise ValueError(
                        f"resume_dir {resume_dir!r} holds checkpoints written "
                        f"with freeze_part1={meta.get('freeze_part1')}, but this "
                        f"trainer was built with freeze_part1={self.freeze_part1}. "
                        "The generator optimizer-state structure differs between "
                        "the two settings, so the checkpoint cannot be restored; "
                        "re-run with the matching --freeze_part1 setting or point "
                        "resume_dir at a fresh directory."
                    )
            else:
                os.makedirs(resume_dir, exist_ok=True)
                with open(meta_path, "w") as f:
                    json.dump({"freeze_part1": self.freeze_part1}, f)
            restored = ckpt_lib.restore_latest(resume_dir, self.state)
            if restored is not None:
                self.state = restored
                start_step = int(self.state.step)
                hist_path = os.path.join(resume_dir, "history.json")
                if os.path.exists(hist_path):
                    with open(hist_path) as f:
                        history = json.load(f)
                n_batch_last = start_step
                print(f"Resumed training from {resume_dir} at step {start_step}")
                if not resume_data_fast_forward:
                    # counters jump straight to the restored step; loaders
                    # are caller-positioned for start_epoch
                    n_batch = start_step
                    if history["n_train"]:
                        n_train = int(history["n_train"][-1])

        for epoch in range(start_epoch, epoch_num):
            for n_batch_in_epoch, batch in enumerate(self._epoch(data_loader_train)):
                n_batch += 1
                if n_batch <= start_step:
                    # fast-forward a resumed run through already-trained
                    # batches (loaders are deterministic in the seed)
                    n_train += int(np.asarray(batch[0]).shape[0])
                    continue
                batch = tuple(jnp.asarray(x) for x in batch)
                n_train += int(batch[0].shape[0])

                # spatial mode rides in the plans (with_spatial above); no
                # ambient context needed
                self.state, metrics = train_step(
                    self.state, batch, self.gen_plan, self.multi_plan
                )
                # Accumulate metrics one step behind: fetching the *previous*
                # step's scalars (already computed) never blocks on the step
                # just dispatched, so the device pipeline stays full — a
                # float() on the current step's metrics would stall the host
                # until the whole step finishes (~one step of idle per step).
                if pending_metrics is not None:
                    for k in train_acc:
                        train_acc[k] += float(pending_metrics[k])
                pending_metrics = metrics

                if n_batch % info_print_interval == 0:
                    for k in train_acc:  # flush so the interval is exact
                        train_acc[k] += float(pending_metrics[k])
                    pending_metrics = None
                    val = self._validate(eval_step, data_loader_val)
                    denom = n_batch - n_batch_last
                    train_iter = {
                        k: (train_acc[k] - acc_last[k]) / denom for k in train_acc
                    }
                    self._print_info(epoch, n_batch_in_epoch, n_train, n_batch,
                                     train_iter, val)
                    self._record(history, epoch, n_batch_in_epoch, n_train,
                                 n_batch, train_iter, val)
                    acc_last = dict(train_acc)
                    n_batch_last = n_batch

                if n_batch % info_plot_interval == 0 and visualization_RGBD_AP is not None:
                    self._visualize(visualization_RGBD_AP, save_path_img,
                                    f"epoch {epoch}, batch {n_batch_in_epoch + 1}")

            if epoch % checkpoint_iterval == 0 and n_batch > start_step:
                if save_path_G is not None:
                    p = ckpt_lib.epoch_path(save_path_G, epoch)
                    ckpt_lib.save_generator(self.state, p)
                    print(f"Generator saved to {p}")
                if save_path_D is not None:
                    p = ckpt_lib.epoch_path(save_path_D, epoch)
                    ckpt_lib.save_discriminator(self.state, p)
                    print(f"Discriminator saved to {p}")
                if loss_metrics_file is not None:
                    self._save_history(history, loss_metrics_file)
                    print(f"losses and metrics saved to {loss_metrics_file}")
                if resume_dir is not None:
                    # async: the write overlaps the next epoch; Orbax
                    # finalizes atomically so restore never sees a partial
                    p = ckpt_lib.save_train_state(self.state, resume_dir, wait=False)
                    self._save_history(history, os.path.join(resume_dir, "history.json"))
                    ckpt_lib.prune_checkpoints(resume_dir, keep=3)
                    print(f"Full train state saving (async) to {p}")
                if visualization_RGBD_AP is not None:
                    self._visualize(visualization_RGBD_AP, save_path_img,
                                    f"epoch {epoch}")

        if save_path_G is not None:
            ckpt_lib.save_generator(self.state, save_path_G)
            print(f"Generator saved to {save_path_G}")
        if save_path_D is not None:
            ckpt_lib.save_discriminator(self.state, save_path_D)
            print(f"Discriminator saved to {save_path_D}")
        if loss_metrics_file is not None:
            self._save_history(history, loss_metrics_file)
            print(f"losses and metrics saved to {loss_metrics_file}")
        if resume_dir is not None and n_batch > start_step:
            ckpt_lib.save_train_state(self.state, resume_dir)
            self._save_history(history, os.path.join(resume_dir, "history.json"))
            ckpt_lib.prune_checkpoints(resume_dir, keep=3)
        ckpt_lib.wait_for_saves()  # drain any in-flight async epoch saves

        try:  # observability: compile count of the eval step (tests assert 1)
            self._eval_cache_size = eval_step._cache_size()
        except Exception:
            self._eval_cache_size = None

        return history

    # ------------------------------------------------------------------
    @staticmethod
    def _epoch(loader) -> Iterable:
        return loader() if callable(loader) else loader

    def _validate(self, eval_step, data_loader_val) -> Dict[str, float]:
        """Full validation pass (reference _validate_generator, :479-552).

        A ragged final batch (``drop_last=False`` loaders) keeps its own
        (smaller) shape — the jitted eval step compiles once per *distinct*
        batch shape, i.e. at most twice per validation config, and its
        metrics are exact.  (An earlier padding-by-edge-repetition scheme
        achieved a single compile but silently over-weighted the repeated
        tail sample in every recorded scalar.)  Like the reference, each
        batch's metrics get equal weight in the epoch average.
        """
        acc = {k: 0.0 for k in LOSS_KEYS + METRIC_KEYS}
        n = 0
        for batch in self._epoch(data_loader_val):
            batch = tuple(jnp.asarray(x) for x in batch)
            metrics = eval_step(self.state, batch, self.gen_plan, self.multi_plan)
            for k in acc:
                acc[k] += float(metrics[k])
            n += 1
        return {k: v / max(n, 1) for k, v in acc.items()}

    @staticmethod
    def _print_info(epoch, n_batch_in_epoch, n_train, n_batch, train, val) -> None:
        def fmt(d):
            return ", ".join(f"{k} {d[k]:.6g}" for k in LOSS_KEYS)

        print(
            f"epoch {epoch}, batch {n_batch_in_epoch + 1} ({n_train} samples and "
            f"{n_batch} batches have been trained):\n"
            f"      train: {fmt(train)};\n"
            f"      train: PSNR {train['PSNR']:.6g}, SSIM {train['SSIM']:.6g};\n"
            f"      validate: {fmt(val)};\n"
            f"      validate: PSNR {val['PSNR']:.6g}, SSIM {val['SSIM']:.6g};\n"
        )

    @staticmethod
    def _record(history, epoch, n_batch_in_epoch, n_train, n_batch, train, val):
        history["epoch"].append(epoch)
        history["n_batch_in_epoch"].append(n_batch_in_epoch)
        history["n_train"].append(n_train)
        history["n_batch"].append(n_batch)
        for k in LOSS_KEYS:
            history["train_losses_tensor"][k].append(train[k])
            history["validate_losses_tensor"][k].append(val[k])
        for k in METRIC_KEYS:
            history["train_metrics_tensor"][k].append(train[k])
            history["validate_metrics_tensor"][k].append(val[k])

    @staticmethod
    def _save_history(history, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(history, f)

    def _visualize(self, visualization_RGBD_AP, save_path_img, tag: str) -> None:
        """Render amp/phs reconstruction of one sample (reference :325-355)."""
        if save_path_img is None:
            return
        from ..utils.plotting import save_rgb_image

        rgbd = jnp.asarray(visualization_RGBD_AP[0])[None]
        # the plan carries the spatial binding: in 4K spatial-sharding mode
        # this eager propagation runs the pencil FFT (no device ever holds a
        # full padded plane) without any ambient context
        poh = self.infer_fn(
            self.state.params_G, self.state.batch_stats_G, self.gen_plan, rgbd
        )
        amp_hat, phs_hat = asm.propagate_poh2ap_forward(self.gen_plan, poh)
        both = tensor_normalizor_2d(jnp.concatenate([amp_hat, phs_hat], axis=0))
        save_rgb_image(np.asarray(both[0]), save_path_img, f"amp_hat in {tag}")
        save_rgb_image(np.asarray(both[1]), save_path_img, f"phs_hat in {tag}")
        print(f"visualization saved at {tag}")

    # ------------------------------------------------------------------
    def generate(self, rgbd: jnp.ndarray) -> jnp.ndarray:
        """Inference: RGBD (B,4,H,W) -> POH (B,3,H,W) (reference generatePOH)."""
        if self.state is None:
            self._init_state(0, 1e-3, 1e-3)
        return self.infer_fn(
            self.state.params_G, self.state.batch_stats_G, self.gen_plan,
            jnp.asarray(rgbd),
        )


# ---------------------------------------------------------------------------
# Ablation factories (reference watermelon.py:640-938) — config, not subclasses
# ---------------------------------------------------------------------------


def watermelon(**kw) -> Watermelon:
    return Watermelon(**kw)


def watermelon_without_GAN(**kw) -> Watermelon:
    kw.setdefault("use_gan", False)
    return Watermelon(**kw)


def watermelon_without_GAN_without_modulation(**kw) -> Watermelon:
    kw.setdefault("use_gan", False)
    kw.setdefault("use_modulation", False)
    return Watermelon(**kw)


def watermelon_without_GAN_without_perceptual_loss(**kw) -> Watermelon:
    kw.setdefault("use_gan", False)
    kw.setdefault("perceptual", "none")
    return Watermelon(**kw)


def watermelon_without_GAN_and_plain_phase_loss(**kw) -> Watermelon:
    kw.setdefault("use_gan", False)
    kw.setdefault("phase_loss", "plain")
    return Watermelon(**kw)


def watermelon_without_GAN_and_focal_sincos_phase_loss(**kw) -> Watermelon:
    kw.setdefault("use_gan", False)
    kw.setdefault("phase_loss", "focal_sincos")
    return Watermelon(**kw)


def watermelon_without_GAN_and_phase_sincos_gradient_loss(**kw) -> Watermelon:
    kw.setdefault("use_gan", False)
    kw.setdefault("phase_loss", "sincos_gradient")
    return Watermelon(**kw)

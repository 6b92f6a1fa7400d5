"""Per-stage pre-training loops (reference RGBD2AP.train_model :52-137 and
AP2POH.train_model :118-218).

Both stages share the same skeleton: Adam + reduce-on-plateau LR, epoch loop
with a full validation pass, ``_epoch{n}`` checkpoints.  The reference's
ReduceLROnPlateau(factor=gamma, patience=4, threshold=1e-3 rel, min_lr=1e-6)
maps onto ``optax.contrib.reduce_on_plateau`` with the same constants.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses import amp_loss, amp_phs_loss
from ..models import AP2POH, RGBD2AP
from ..ops import asm
from . import checkpoint as ckpt_lib


class ReduceLROnPlateau:
    """Epoch-level plateau LR scheduler (reference RGBD2AP.py:79-90 constants:
    factor=gamma, patience=4, threshold=1e-3 relative, min_lr=1e-6)."""

    def __init__(
        self,
        lr: float,
        factor: float = 0.1,
        patience: int = 4,
        threshold: float = 1e-3,
        min_lr: float = 1e-6,
    ):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, value: float) -> float:
        if value < self.best * (1.0 - self.threshold):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


def _plateau_tx(lr: float) -> optax.GradientTransformation:
    """Adam whose learning rate is mutable through inject_hyperparams."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def _set_lr(opt_state, lr: float):
    return opt_state._replace(
        hyperparams={**opt_state.hyperparams, "learning_rate": jnp.asarray(lr)}
    )


def _run_epochs(
    *,
    epochs: int,
    params,
    batch_stats,
    tx,
    scheduler: Optional[ReduceLROnPlateau],
    train_batches: Callable[[], Iterable],
    val_batches: Callable[[], Iterable],
    train_step,
    eval_step,
    save_path: Optional[str],
    checkpoint_interval: int,
):
    opt_state = tx.init(params)
    train_hist, val_hist = [], []
    for epoch in range(epochs):
        train_loss, n_train = 0.0, 0
        pending = None  # one-step-delayed loss fetch: float(loss) on the
        # current step would stall the host on the relay round trip every
        # step, leaving the device idle (same idiom as Watermelon.train)
        for batch in train_batches():
            batch = tuple(jnp.asarray(x) for x in batch)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, batch
            )
            if pending is not None:
                train_loss += float(pending)
            pending = loss
            n_train += int(batch[0].shape[0])
        if pending is not None:
            train_loss += float(pending)

        val_loss, n_val = 0.0, 0
        for batch in val_batches():
            batch = tuple(jnp.asarray(x) for x in batch)
            val_loss += float(eval_step(params, batch_stats, batch))
            n_val += int(batch[0].shape[0])

        avg_train = train_loss / max(n_train, 1)
        avg_val = val_loss / max(n_val, 1)
        train_hist.append(avg_train)
        val_hist.append(avg_val)
        print(f"epoch {epoch + 1}, train loss {avg_train:.7f}, test loss {avg_val:.7f}")

        # feed the plateau scheduler the validation loss (epoch-level)
        if scheduler is not None:
            opt_state = _set_lr(opt_state, scheduler.step(avg_val))

        if epoch % checkpoint_interval == 0 and epoch != 0 and save_path is not None:
            ckpt_lib._write(
                ckpt_lib.epoch_path(save_path, epoch),
                {"params": params, "batch_stats": batch_stats},
            )
    if save_path is not None:
        ckpt_lib._write(save_path, {"params": params, "batch_stats": batch_stats})
    return params, batch_stats, train_hist, val_hist


def train_rgbd2ap(
    model: RGBD2AP,
    params,
    batch_stats,
    train_batches: Callable[[], Iterable],
    val_batches: Callable[[], Iterable],
    epochs: int = 30,
    lr: float = 1e-3,
    alpha: float = 1e-3,
    hyperparameter_gamma: float = 0.1,
    save_path: Optional[str] = None,
    checkpoint_iterval: int = 10,
):
    """Stage-1 pre-training (reference RGBD2AP.train_model :52-137).

    Batches are (RGBD, amp, phs01) with phase normalized [0, 1]; the loss is
    ``amp_phs_loss`` on (amp, 2*pi*phs) — single 2*pi scaling (the reference
    applies it twice by accident, RGBD2AP.py:99+149; see losses.amp_phs_loss).
    """
    tx = _plateau_tx(lr)
    scheduler = ReduceLROnPlateau(lr, factor=hyperparameter_gamma)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch):
        rgbd, amp, phs01 = batch

        def loss_fn(p):
            (amp_hat, phs_hat), mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                rgbd, train=True, mutable=["batch_stats"],
            )
            loss = amp_phs_loss(amp_hat, phs_hat, amp, 2 * jnp.pi * phs01, alpha)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss * rgbd.shape[0]

    @jax.jit
    def eval_step(params, batch_stats, batch):
        rgbd, amp, phs01 = batch
        amp_hat, phs_hat = model.apply(
            {"params": params, "batch_stats": batch_stats}, rgbd, train=False
        )
        return amp_phs_loss(amp_hat, phs_hat, amp, 2 * jnp.pi * phs01, alpha) * rgbd.shape[0]

    return _run_epochs(
        epochs=epochs, params=params, batch_stats=batch_stats, tx=tx,
        scheduler=scheduler,
        train_batches=train_batches, val_batches=val_batches,
        train_step=train_step, eval_step=eval_step,
        save_path=save_path, checkpoint_interval=checkpoint_iterval,
    )


def train_ap2poh(
    model: AP2POH,
    plan: asm.PropagatorPlan,
    params,
    train_batches: Callable[[], Iterable],
    val_batches: Callable[[], Iterable],
    filter_radius_coefficient: float = 0.45,
    epochs: int = 30,
    lr: float = 1e-3,
    alpha: float = 1e-3,
    beta: float = 1e-5,
    hyperparameter_gamma: float = 0.1,
    save_path: Optional[str] = None,
    checkpoint_iterval: int = 10,
):
    """Stage-2 pre-training (reference AP2POH.train_model :118-218).

    Batches are (amp, phs) with phase already in radians (the AmpPhsDataset
    scales by 2*pi, reference data_loader.py:83).  Inputs are low-passed
    on the fly (``dataloader_filter``), the POH is re-propagated forward with
    the differentiable-filter spectrum loss, and the loss is
    ``amp_loss + beta * spectrum_loss``.
    """
    tx = _plateau_tx(lr)
    scheduler = ReduceLROnPlateau(lr, factor=hyperparameter_gamma)
    frc = filter_radius_coefficient

    # plan is threaded as a jit argument (a closed-over complex array would be
    # baked in as an MLIR constant, forcing complex host transfers at trace).
    def forward_loss(params, plan, batch):
        amp_raw, phs_raw = batch
        amp, phs = asm.differentiable_lowpass_filter(plan, amp_raw, phs_raw, frc)
        poh = model.apply({"params": params}, plan, amp, phs)
        amp_hat, _, spectrum_loss = asm.propagate_poh2ap_forward_with_spectrum_loss(
            plan, poh, frc
        )
        return amp_loss(amp_hat, amp, alpha) + beta * spectrum_loss

    @jax.jit
    def _train_step_impl(params, opt_state, plan, batch):
        loss, grads = jax.value_and_grad(forward_loss)(params, plan, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def train_step(params, batch_stats, opt_state, batch):
        params, opt_state, loss = _train_step_impl(params, opt_state, plan, batch)
        return params, batch_stats, opt_state, loss * batch[0].shape[0]

    @jax.jit
    def _eval_step_impl(params, plan, batch):
        return forward_loss(params, plan, batch)

    def eval_step(params, batch_stats, batch):
        return _eval_step_impl(params, plan, batch) * batch[0].shape[0]

    return _run_epochs(
        epochs=epochs, params=params, batch_stats={}, tx=tx,
        scheduler=scheduler,
        train_batches=train_batches, val_batches=val_batches,
        train_step=train_step, eval_step=eval_step,
        save_path=save_path, checkpoint_interval=checkpoint_iterval,
    )

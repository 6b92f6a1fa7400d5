"""Checkpointing: per-part single-file saves + full-state Orbax resume.

Two layers, mirroring SURVEY.md section 5:

* **Per-part saves** (:func:`save_generator` / :func:`save_discriminator`) —
  the reference's ``torch.save(state_dict)`` idiom (watermelon.py:361-374,
  generator.py:53-54): one file per network holding params + batch stats,
  serialized with flax msgpack.  These feed the ``pretrained_model_path_G/D``
  constructor arguments and the two-stage pre-train -> fine-tune workflow.
* **Full-state checkpoints** (:func:`save_train_state` /
  :func:`restore_train_state`) — Orbax directories holding the *entire*
  :class:`TrainState` including both optimizer states and the RNG key, which
  the reference never persisted; `restore_latest` implements
  resume-from-latest on restart (the failure-recovery behavior the reference
  lacks).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from flax import serialization

from .state import TrainState


def epoch_path(path: str, epoch: int) -> str:
    """``foo.pth`` -> ``foo_epoch{n}.pth`` (reference watermelon.py:363)."""
    root, ext = os.path.splitext(path)
    return f"{root}_epoch{epoch}{ext}"


def _write(path: str, tree) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(tree)))


def _read(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_generator(state: TrainState, path: str) -> None:
    _write(path, {"params": state.params_G, "batch_stats": state.batch_stats_G})


def save_discriminator(state: TrainState, path: str) -> None:
    _write(path, {"params": state.params_D, "batch_stats": state.batch_stats_D})


def load_generator(state: TrainState, path: str) -> TrainState:
    tpl = {"params": state.params_G, "batch_stats": state.batch_stats_G}
    loaded = _read(path, tpl)
    return state.replace(
        params_G=loaded["params"], batch_stats_G=loaded["batch_stats"]
    )


def load_discriminator(state: TrainState, path: str) -> TrainState:
    tpl = {"params": state.params_D, "batch_stats": state.batch_stats_D}
    loaded = _read(path, tpl)
    return state.replace(
        params_D=loaded["params"], batch_stats_D=loaded["batch_stats"]
    )


def load_generator_part(state: TrainState, path: str, part: str) -> TrainState:
    """Load only ``part1`` (RGBD2AP) or ``part2`` (AP2POH) pretrained weights.

    The reference supports per-part pretrained paths with optional freezing
    (generator.py:26-28, RGBD2AP.py:37-41); freezing is an optimizer concern
    here — ``Watermelon(freeze_part1=True)`` builds the generator optimizer
    as ``optax.multi_transform`` with ``optax.set_to_zero()`` over the
    ``part1`` subtree (train/watermelon.py:_init_state).

    Ablation variants can REMOVE a part's parameters entirely (e.g.
    ``use_modulation=False`` swaps AP2POH's symmetric conv for the
    parameter-less identity stub, so ``part2`` has no subtree).  Loading
    pretrained weights into a part that does not exist is skipped with a
    loud warning instead of raising — the weights are meaningless for the
    stub by construction.
    """
    if part not in state.params_G:
        print(
            f"WARNING: generator has no parameters under {part!r} (ablation "
            f"stub); skipping pretrained load from {path}"
        )
        return state
    tpl = {
        "params": state.params_G[part],
        "batch_stats": state.batch_stats_G.get(part, {}),
    }
    loaded = _read(path, tpl)
    params_G = dict(state.params_G)
    params_G[part] = loaded["params"]
    batch_stats_G = dict(state.batch_stats_G)
    if loaded["batch_stats"]:
        batch_stats_G[part] = loaded["batch_stats"]
    print(f"Generator {part} loaded from {path}")
    return state.replace(params_G=params_G, batch_stats_G=batch_stats_G)


# ---------------------------------------------------------------------------
# Orbax full-state checkpoints
# ---------------------------------------------------------------------------


_CHECKPOINTER = None


def _checkpointer():
    """Process-wide Orbax StandardCheckpointer (async under the hood).

    A single instance is reused so in-flight async saves can be awaited with
    :func:`wait_for_saves` before exit/pruning-of-the-newest/benchmark cuts.
    """
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        import orbax.checkpoint as ocp

        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save_train_state(
    state: TrainState,
    directory: str,
    step: Optional[int] = None,
    wait: bool = True,
) -> str:
    """Write the full TrainState under ``directory/step_{n}`` with Orbax.

    ``wait=False`` returns as soon as the host copy is snapshotted and lets
    the serialization/fsync run in Orbax's background thread — the train
    loop overlaps the next epoch with the write.  Orbax finalizes the
    directory atomically (tmp-dir + rename), so :func:`restore_latest` never
    sees a partial checkpoint; call :func:`wait_for_saves` before shutdown.
    """
    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def wait_for_saves() -> None:
    """Block until every async :func:`save_train_state` has been finalized."""
    if _CHECKPOINTER is not None:
        _CHECKPOINTER.wait_until_finished()


def restore_train_state(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def latest_step_dir(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(directory, max(steps)[1])


def restore_latest(directory: str, template: TrainState) -> Optional[TrainState]:
    """Resume-from-latest on restart; None if no checkpoint exists."""
    path = latest_step_dir(directory)
    if path is None:
        return None
    return restore_train_state(path, template)


def prune_checkpoints(directory: str, keep: int = 3) -> None:
    """Retention: delete all but the ``keep`` newest ``step_*`` checkpoints.

    ``keep=0`` deletes every checkpoint (``[:-0]`` would silently keep all).
    """
    import shutil

    if keep < 0:
        raise ValueError(f"keep must be >= 0, got {keep}")
    if not os.path.isdir(directory):
        return
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    doomed = sorted(steps)[:-keep] if keep > 0 else sorted(steps)
    for _, name in doomed:
        shutil.rmtree(os.path.join(directory, name), ignore_errors=True)

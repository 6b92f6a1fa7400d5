"""Device mesh + sharding helpers (new capability — the reference is
single-GPU only; SURVEY.md section 5 "Distributed communication backend").

The scaling design is GSPMD-first: the train step stays the *global* pure
function from :mod:`..train.steps`; sharding the batch axis over a
``Mesh('data')`` makes XLA insert the gradient all-reduces and compute
BatchNorm statistics over the global batch automatically.  The distance-plane
axis of focal-stack propagation is embarrassingly parallel and can be sharded
the same way (see :func:`shard_distance_stack`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D mesh over (the first ``num_devices``) local devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bring-up: ``jax.distributed.initialize`` when configured.

    Call once at program start on every host of a multi-host TPU pod slice.
    Two supported configurations:

    * **Launcher auto-detect** — under Cloud TPU / GKE / Slurm, call with no
      arguments *after* exporting ``JAX_COORDINATOR_ADDRESS`` (the only env
      var installed JAX actually reads; bare ``COORDINATOR_ADDRESS`` /
      ``NUM_PROCESSES`` / ``PROCESS_ID`` are NOT consulted) — the cluster
      environment supplies process count/id.
    * **Explicit** — pass all three of ``coordinator_address``,
      ``num_processes``, ``process_id``.

    After it returns, ``jax.devices()`` spans the whole pod and the GSPMD
    train step scales across hosts unchanged — DCN only ever carries the
    gradient all-reduce for mesh axes laid out across slices (see
    :func:`make_hybrid_mesh`).

    Returns True if distributed mode was initialized, False when running
    single-process (nothing configured) — the single-host fallback.
    """
    import os

    explicit = coordinator_address is not None
    if explicit and (num_processes is None or process_id is None):
        raise ValueError(
            "explicit multi-host init needs all of coordinator_address, "
            "num_processes and process_id"
        )
    env_configured = bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not explicit and not env_configured:
        return False
    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        # env/launcher path: let JAX's cluster auto-detection fill the rest
        jax.distributed.initialize()
    return True


def make_hybrid_mesh(
    num_slices: int = 1,
    ici_axis: str = "data",
    dcn_axis: str = "replica",
) -> Mesh:
    """2-D (DCN x ICI) mesh for multi-slice / multi-host data parallelism.

    Within a slice the batch shards over ``ici_axis`` (fast ICI collectives);
    across slices it shards over ``dcn_axis`` whose all-reduce rides DCN.
    Shard batches with ``P((dcn_axis, ici_axis))`` so both axes split the
    batch.  With ``num_slices == 1`` this degrades to the flat single-slice
    mesh (still 2-D, leading axis 1) so caller code is uniform.
    """
    n = jax.device_count()
    if n % num_slices != 0:
        raise ValueError(f"{n} devices not divisible into {num_slices} slices")
    per_slice = n // num_slices
    if num_slices > 1:
        from jax.experimental import mesh_utils

        try:
            # mesh_shape and dcn_mesh_shape are per-axis factors multiplied
            # elementwise into the final mesh shape — the DCN axis must be 1
            # in mesh_shape and the ICI axis 1 in dcn_mesh_shape, giving
            # shape (num_slices, per_slice) with devices grouped by slice.
            devices = mesh_utils.create_hybrid_device_mesh(
                (1, per_slice), (num_slices, 1)
            )
            return Mesh(devices, (dcn_axis, ici_axis))
        except (ValueError, AssertionError):
            # no real multi-slice topology (e.g. CPU test mesh): fall through
            pass
    devices = np.array(jax.devices()).reshape(num_slices, per_slice)
    return Mesh(devices, (dcn_axis, ici_axis))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis of every array in a batch pytree."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch with its leading axis split across the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(state, mesh: Mesh):
    """Replicate a TrainState (params/opt/stats) on every mesh device."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def shard_distance_stack(plan, mesh: Mesh, axis_name: str = "data"):
    """Shard a PropagatorPlan's cached H stack over its distance axis.

    Each device then applies its slice of the transfer-function stack —
    distance-plane parallelism for the focal-stack reconstruction (the 4K
    memory answer from SURVEY.md section 5).  Grids/masks are replicated.
    """
    h_sharding = NamedSharding(mesh, P(axis_name))
    rep = replicated(mesh)
    return plan.replace(
        H=jax.device_put(plan.H, h_sharding) if plan.H is not None else None,
        distances=(
            jax.device_put(plan.distances, h_sharding)
            if plan.distances is not None
            else None
        ),
        w_grid=jax.device_put(plan.w_grid, rep),
        mask=jax.device_put(plan.mask, rep),
        radial_grid=jax.device_put(plan.radial_grid, rep),
    )


def pad_batch_to_devices(batch, num_devices: int):
    """Pad the leading axis up to a multiple of the mesh size (edge repeat).

    Lets ragged final batches run on a fixed mesh; callers slice the outputs
    back down with the returned original size.
    """
    def pad(x):
        b = x.shape[0]
        rem = (-b) % num_devices
        if rem == 0:
            return x
        reps = np.concatenate([x, np.repeat(x[-1:], rem, axis=0)], axis=0)
        return reps

    orig = jax.tree.leaves(batch)[0].shape[0]
    return jax.tree.map(pad, batch), orig

"""Device mesh and sharding helpers.

The reference is single-process/single-device (SURVEY.md §2.2); this layer
is the new first-class TPU-native component: scenarios (episodes x seeds x
true-parameter draws) shard over a `jax.sharding.Mesh` as the
data-parallel axis, XLA inserting any cross-device collectives. Within a
scenario the solve stays on one chip (the per-chip solves/s target
dominates; cross-chip traffic is scenario scatter/gather only — SURVEY.md
§7.4.7), so scaling is near-linear over ICI and hosts.

Multi-host: call `initialize_distributed()` once per process before
building the mesh; `jax.devices()` then spans the slice and the same
`make_mesh`/`ScenarioSweep` code runs unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_names=("scenario",), shape=None):
    """Build a Mesh over the first `n_devices` devices (default: all).

    `shape` reshapes the device list for multi-axis meshes, e.g.
    shape=(4, 2), axis_names=("scenario", "particle")."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.array(devices)
    if shape is not None:
        arr = arr.reshape(shape)
    elif len(axis_names) == 1:
        arr = arr.reshape(len(devices))
    else:
        raise ValueError("shape required for multi-axis meshes")
    return Mesh(arr, axis_names)


def scenario_sharding(mesh, axis="scenario"):
    """NamedSharding placing the leading (scenario) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (`jax.distributed.initialize`). Returns True
    when a distributed runtime was initialized; a genuine no-op
    (returning False) on single-process machines where neither explicit
    args nor cluster env autodetection provide a coordinator —
    `jax.distributed.initialize()` itself would raise there."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    try:
        jax.distributed.initialize()
        return True
    except ValueError:
        # no coordinator and no recognized cluster environment
        return False

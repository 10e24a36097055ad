"""Device-mesh helpers for residual-row and batch parallelism.

The reference has no parallelism of any kind (SURVEY.md §2); the TPU-native
scale axes for NLLS are:

  * ``rows``  — shard residual rows (blocks of f and J) across chips; every
    reduction the reference performs over the residual index (ssr, column
    norms, J'f, ||J dx||^2) is row-separable and becomes one psum.
  * ``batch`` — shard independent vmapped fits across chips (pure DP).

Collectives are inserted by XLA's SPMD partitioner from sharding
annotations (the scaling-book recipe); explicit shard_map kernels for the
Gram reduction and LSMR matvecs live in parallel/sharded.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("rows",),
    devices=None,
) -> Mesh:
    """Create a mesh over all (or the given) devices.

    ``make_mesh()`` -> 1D mesh ('rows',) over every device.
    ``make_mesh((2, 4), ('batch', 'rows'))`` -> 2D batch x rows mesh.
    """
    devices = list(jax.devices() if devices is None else devices)
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {shape} does not match device count {len(devices)}"
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def shard_rows(data, mesh: Mesh, axis: str = "rows"):
    """Place a pytree with leading row axis on the mesh, sharded over ``axis``.

    Leading dimensions must be divisible by the mesh axis size (pad with
    zero-weight rows otherwise; zero rows are exact no-ops for Gram/ssr
    reductions).
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, sharding), data
    )


def replicated(x, mesh: Mesh):
    """Fully-replicate an array over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize the multi-host runtime and return the global device count.

    Thin wrapper over ``jax.distributed.initialize`` (auto-detects cluster
    environment under TPU pod slices / GKE when called with no args). Call
    once per host before building meshes; afterwards ``make_mesh`` sees all
    global devices and shardings lay collectives over ICI within a slice and
    DCN across hosts. Safe to call when already initialized or single-host
    (returns the current device count).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # Tolerate only the benign re-init case; a genuine multi-host setup
        # failure (bad coordinator, dead peer) must stay loud — silently
        # degrading to single-host computes wrong results. jax's re-init
        # message is "distributed.initialize should only be called once"
        # (jax 0.9; older builds said "already initialized").
        msg = str(e).lower()
        if "only be called once" not in msg and "already initialized" not in msg:
            raise
    return len(jax.devices())

"""Device-mesh + sharding helpers.

TPU-native replacement for the reference's NCCL runtime (N4 in SURVEY §2.2):
`launch_distributed.py`, `util/misc.py:374-468` (process group, all_reduce,
all_gather, barrier) and `DistributedSampler` collapse into

  * one `jax.sharding.Mesh` with a 'data' axis over all devices,
  * batch arrays sharded over 'data', parameters replicated,
  * gradient reduction emitted by the XLA compiler as psum over ICI/DCN
    (no hand-written collectives in the train step).

Multi-host: call `jax.distributed.initialize()` before `create_mesh()` — the
mesh then spans every process's devices and per-host input sharding follows
`jax.process_index()` (see poet_tpu.data.loader).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_data: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh. n_data = -1 uses every visible device."""
    devices = devices if devices is not None else jax.devices()
    if n_data == -1:
        n_data = len(devices)
    return Mesh(np.asarray(devices[:n_data]), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch onto the mesh, leading axis split over 'data'.

    Single-process: a plain device_put. Multi-host: each process holds only
    its LOCAL batch (the loader shards the dataset by process), so the
    global array must be assembled with make_array_from_process_local_data —
    device_put would treat the local batch as the global value and stitch a
    patchwork that silently drops rows. The global batch dim becomes
    local_batch * process_count.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

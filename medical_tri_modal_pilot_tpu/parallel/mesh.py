"""Device-mesh + sharding helpers (the distributed layer the reference never
had — SURVEY.md §2.7: the reference is single-GPU; the TPU-native
equivalent is batch-sharded pjit over ICI).

Design: a 1-D ``data`` mesh axis for data parallelism today, declared via
``jax.sharding`` so model axes (tensor/sequence) can be added later without
touching the step functions — XLA inserts the gradient psum and any
resharding collectives over ICI automatically when the jitted step runs on
a sharded batch with replicated params.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
feed per-host batch shards via ``jax.make_array_from_process_local_data``
(handled in ``shard_batch``).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def auto_dp_size(batch_size: int, n_devices: int) -> int:
    """Largest device count <= n_devices that divides the batch."""
    for n in range(min(batch_size, n_devices), 0, -1):
        if batch_size % n == 0:
            return n
    return 1


def make_mesh(dp_size: int = 0, batch_size: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first dp_size devices (0 = auto:
    the largest batch-divisible device count)."""
    devices = jax.devices()
    if dp_size > 0:
        n = dp_size
    elif batch_size is not None:
        n = auto_dp_size(batch_size, len(devices))
    else:
        n = len(devices)
    return Mesh(np.array(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Ship a host batch to the mesh, sharded on the leading (batch) dim.

    Single-process: device_put with a NamedSharding. Multi-process: each
    process contributes its local shard of the global batch.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)

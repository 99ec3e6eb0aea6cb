"""Device-mesh + sharding helpers (the distributed layer the reference never
had — SURVEY.md §2.7: the reference is single-GPU; the TPU-native
equivalent is sharded pjit over ICI).

Design: a ``data`` mesh axis for data parallelism, plus an optional
``model`` axis (``--mp-size``) for Megatron-style tensor parallelism of the
transformer stacks. Everything is expressed as ``jax.sharding`` annotations
on the param / optimizer pytrees; the step functions are untouched — XLA's
SPMD partitioner partitions the matmuls and inserts the collectives
(gradient psum over ``data``, activation all-reduce/all-gather over
``model``) over ICI automatically.

Tensor-parallel layout (classic FFN/heads split):
  * ``feed_forward/w_1``  kernel [d_model, d_ff]   -> P(None, 'model')
  * ``feed_forward/w_2``  kernel [d_ff, d_model]   -> P('model', None)
  * ``{query,key,value}_proj`` kernel [d, d]       -> P(None, 'model')
    (head split: the per-head attention computes fully locally, the
    residual add gathers)
  * everything else (norms, embeddings, heads, frozen Swin trunk)
    replicated — they are tiny next to the FFN/attention matmuls.
A dim is only split when it divides evenly; otherwise the leaf stays
replicated (correct, just not distributed).

Note: with ``--use-pallas 1`` the kernels are custom calls XLA's SPMD
partitioner cannot split, so ``ops.configure(mesh=...)`` shard_map-wraps
each of them (ops/__init__.py): the flash attention splits heads over
``model`` (the natural tensor-parallel axis, no collectives inside) and
batch over ``data``; the fused FFN/attn-block fall back to plain XLA under
``--mp-size > 1`` so SPMD can shard their matmul weights over ``model``.

Multi-host: ``parallel.distributed.maybe_init_distributed`` connects the
per-host processes before ``make_mesh`` (which then spans the *global*
device list); ``shard_batch``/``put_global`` place every process's copy
of the global batch onto its addressable shards
(``jax.make_array_from_callback``), and XLA routes the step's collectives
over ICI within a slice and DCN across slices.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def auto_dp_size(batch_size: int, n_devices: int) -> int:
    """Largest device count <= n_devices that divides the batch."""
    for n in range(min(batch_size, n_devices), 0, -1):
        if batch_size % n == 0:
            return n
    return 1


def make_mesh(dp_size: int = 0, batch_size: Optional[int] = None,
              mp_size: int = 0) -> Mesh:
    """Data-parallel mesh over the first dp_size devices (0 = auto: the
    largest batch-divisible device count). With mp_size > 1, a 2-D
    ('data', 'model') mesh: adjacent devices share a model group so the
    model all-reduces ride the shortest ICI hops."""
    devices = jax.devices()

    def _check_multiprocess(n: int) -> None:
        # multi-controller SPMD: every process must contribute ALL of its
        # addressable devices to the mesh. Truncating the global list
        # (devices[:n]) can exclude a later host's devices entirely, and
        # that process then fails or hangs inside the first collective
        # instead of erroring clearly.
        if jax.process_count() > 1 and n != len(devices):
            raise ValueError(
                f"multi-process run: the mesh would use {n} of "
                f"{len(devices)} global devices, leaving some hosts "
                "without addressable shards. Adjust --batch-size, "
                "--dp-size or --mp-size so dp*mp covers every device "
                f"({jax.process_count()} processes x "
                f"{jax.local_device_count()} local devices).")

    mp = max(mp_size, 1)
    if mp > 1:
        avail = len(devices) // mp
        if avail < 1:
            raise ValueError(
                f"mp_size={mp} needs at least {mp} devices, have "
                f"{len(devices)}")
        if dp_size > 0:
            dp = dp_size
        elif batch_size is not None:
            dp = auto_dp_size(batch_size, avail)
        else:
            dp = avail
        _check_multiprocess(dp * mp)
        return Mesh(
            np.asarray(devices[:dp * mp]).reshape(dp, mp),
            (DATA_AXIS, MODEL_AXIS))
    if dp_size > 0:
        n = dp_size
    elif batch_size is not None:
        n = auto_dp_size(batch_size, len(devices))
    else:
        n = len(devices)
    _check_multiprocess(n)
    return Mesh(np.array(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _tp_spec(path: str, shape, mp: int) -> P:
    """Tensor-parallel PartitionSpec for one param/opt leaf, by name+shape.

    ``path`` is the '/'-joined key path; optimizer-state leaves carry the
    same trailing components (``...mu/fusion/layers_0/feed_forward/w_1/
    kernel``), so one rule covers params, mu and nu alike."""
    if len(shape) == 0:
        return P()

    def ok(dim):
        return shape[dim] % mp == 0

    if path.endswith("feed_forward/w_1/kernel") and len(shape) == 2 and ok(1):
        return P(None, MODEL_AXIS)
    if path.endswith("feed_forward/w_1/bias") and ok(0):
        return P(MODEL_AXIS)
    if path.endswith("feed_forward/w_2/kernel") and len(shape) == 2 and ok(0):
        return P(MODEL_AXIS, None)
    for proj in ("query_proj", "key_proj", "value_proj"):
        if path.endswith(f"{proj}/kernel") and len(shape) == 2 and ok(1):
            return P(None, MODEL_AXIS)
        if path.endswith(f"{proj}/bias") and ok(0):
            return P(MODEL_AXIS)
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def tree_shardings(mesh: Mesh, tree):
    """NamedSharding pytree for params or optimizer state: tensor-parallel
    specs on the transformer matmuls when the mesh has a 'model' axis,
    replicated otherwise."""
    if MODEL_AXIS not in mesh.axis_names or mesh.shape[MODEL_AXIS] == 1:
        rep = replicated_sharding(mesh)
        return jax.tree.map(lambda _: rep, tree)
    mp = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: NamedSharding(
            mesh, _tp_spec(_path_str(kp), getattr(leaf, "shape", ()), mp)),
        tree)


def put_global(mesh: Mesh, spec: P, x):
    """Place one host array onto the mesh with PartitionSpec ``spec``.

    Single-process: plain ``device_put``. Multi-process: every process
    holds the identical *global* array (the seeded data pipeline is
    deterministic per ``parallel.distributed`` contract) and the runtime
    slices out this host's addressable shards via
    ``jax.make_array_from_callback`` — correct for any device→process
    layout, no cross-host transfer."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Ship a host batch to the mesh, sharded on the leading (batch) dim
    (replicated over 'model' when present). Multi-process: see
    ``put_global`` — each process passes the same global batch."""
    return jax.tree.map(
        lambda x: put_global(mesh, P(DATA_AXIS), x), batch)

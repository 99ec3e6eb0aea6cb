"""Multi-host (multi-process) runtime initialization over DCN.

The reference is single-GPU/single-process (SURVEY.md §5 "Distributed
communication backend": none — `2_train.py` pins one CUDA device). The
TPU-native scale-out path is SPMD over a global device mesh:
``jax.distributed.initialize()`` connects the per-host processes, after
which ``jax.devices()`` is the *global* device list, ``parallel.mesh``
builds the same ('data'[, 'model']) mesh over it, and the jitted step
functions are unchanged — XLA routes gradient psums over ICI within a
slice and DCN across slices.

Host-side contract (see ``mesh.shard_batch``): every process runs the
identical seeded data pipeline and assembles the identical *global*
batch; the runtime slices out each host's addressable shards
(``jax.make_array_from_callback``). Only process 0 writes logs and
checkpoints (``is_primary`` gates ``train.logger``).

Off-TPU (tests / CI) the same code path runs multi-process on CPU with
gloo collectives: ``tests/test_multihost.py`` spawns two processes with
two virtual CPU devices each and asserts the 2x2-device global run
matches the single-process 4-device run.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple


def maybe_init_distributed(cfg=None) -> Tuple[int, int]:
    """Initialize the JAX distributed runtime when configured; no-op (and
    (0, 1)) otherwise.

    Configuration, in precedence order:
      * ``--dist-coordinator host:port`` (+ ``--dist-num-processes``,
        ``--dist-process-id``) — explicit rendezvous, any backend;
      * ``--dist-coordinator auto`` — ``jax.distributed.initialize()``
        with no arguments (TPU pod metadata / cluster auto-detection);
      * env ``GRAFT_COORDINATOR`` / ``GRAFT_NUM_PROCESSES`` /
        ``GRAFT_PROCESS_ID`` — same, for launchers that cannot touch the
        CLI surface.

    Must run before the JAX backend initializes (call it right after
    config parsing, before any jax array work). Returns
    ``(process_index, process_count)``.
    """
    coord = ""
    if cfg is not None:
        coord = getattr(cfg, "dist_coordinator", "") or ""
    coord = coord or os.environ.get("GRAFT_COORDINATOR", "")
    if not coord:
        return 0, 1

    def _pick(attr: str, env: str) -> Optional[int]:
        v = getattr(cfg, attr, None) if cfg is not None else None
        if v is None or int(v) < 0:
            ev = os.environ.get(env, "")
            v = int(ev) if ev else -1
        v = int(v)
        return v if v >= 0 else None

    num = _pick("dist_num_processes", "GRAFT_NUM_PROCESSES")
    pid = _pick("dist_process_id", "GRAFT_PROCESS_ID")

    import jax

    # CPU backend: cross-process collectives need an explicit
    # implementation; gloo ships in jaxlib and needs no external daemon.
    # Ignored by the TPU backend (ICI/DCN collectives are built in).
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    if coord == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=num, process_id=pid)
    return jax.process_index(), jax.process_count()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns file output (logs, checkpoints,
    settings.txt). Always True single-process."""
    import jax
    return jax.process_index() == 0


def barrier(tag: str) -> None:
    """Cross-process rendezvous (no-op single-process). Used to order
    process 0's checkpoint writes before any process's restore reads —
    without it, a shared-filesystem restore can race the save."""
    import jax
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def assert_agreement(tag: str, value) -> None:
    """Raise when a small scalar decision differs across processes.

    Checkpoint discovery/restore happens per-process against the local
    filesystem; if the results dir is not shared, non-primary hosts see
    different files and would silently diverge inside an SPMD computation
    that assumes replicated params. This turns that into a loud error."""
    import jax
    if jax.process_count() == 1:
        return
    import numpy as np
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(
        np.asarray(value, dtype=np.float64))
    if not np.all(vals == vals[0]):
        raise RuntimeError(
            f"multi-host disagreement on {tag}: per-process values "
            f"{vals.tolist()} — the checkpoint/results directory must be "
            "shared (or identically populated) across all hosts")


def gather_global(x):
    """Fetch a (possibly multi-host-sharded) jax array to host numpy.

    Single-process or fully-addressable arrays go straight through
    ``np.asarray``; multi-host data-sharded outputs (eval probabilities)
    are all-gathered across processes first so every host sees the full
    per-sample vector — the Evaluator/metric path is then identical to
    the single-host one.
    """
    import numpy as np
    if getattr(x, "is_fully_addressable", True) or \
            getattr(x, "is_fully_replicated", False):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))

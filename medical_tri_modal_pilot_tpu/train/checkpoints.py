"""Checkpoint save/load keeping the reference's directory contract
(logger.py:166-177): single-file checkpoints named
``{dir_result}/{project}/ckpts/{best,last}_fold{k}_seed{s}.pth`` holding
{'model','optimizer','best_step','last_step','score','epoch'} — here the
model/optimizer entries are numpy pytrees (no torch)."""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


_PACK_CACHE: Dict[Any, Any] = {}


def _pack_fetch_start(tree):
    """Donation-safe, RPC-batched state fetch.

    Two problems with ``jax.tree.map(np.asarray, tree)`` on the live train
    state: (a) the train step donates the state's buffers (trainer.py
    donate_argnums), so a background fetch races the next step's donation;
    (b) a remote backend (the tunneled TPU) pays one RPC round-trip PER
    ARRAY — the flagship state is ~900 leaves, which measured tens of
    seconds while one 273 MB transfer takes well under a second.

    Fix both at once: a jitted pack (one compile per tree structure)
    reshapes every leaf to 1-D and concatenates per dtype — a handful of
    fresh device buffers nothing else donates — then D2H moves those few
    big buffers. Returns a closure that materializes the original numpy
    pytree on the caller's schedule (run it in the background thread)."""
    import jax.numpy as jnp
    leaves, treedef = jax.tree.flatten(tree)
    shapes = tuple(l.shape for l in leaves)
    dtypes = tuple(jnp.asarray(l).dtype for l in leaves)
    key = (treedef, shapes, dtypes)
    hit = _PACK_CACHE.get(key)
    if hit is None:
        order: Dict[Any, list] = {}
        for i, dt in enumerate(dtypes):
            order.setdefault(np.dtype(dt), []).append(i)
        groups = tuple((dt, tuple(idx)) for dt, idx in order.items())

        def _pack(ls):
            return tuple(
                jnp.concatenate([ls[i].reshape(-1) for i in idx])
                if len(idx) > 1 else ls[idx[0]].reshape(-1)
                for _, idx in groups)

        # pin replicated outputs on meshed states: process 0 (the only
        # saver) must be able to read every byte locally, and TP-sharded
        # leaves must be gathered on device (one ICI all-gather beats a
        # host-side reassembly)
        out_sh = None
        for l in leaves:
            sh = getattr(l, "sharding", None)
            if hasattr(sh, "mesh") and hasattr(sh, "spec"):
                from jax.sharding import NamedSharding, PartitionSpec
                out_sh = NamedSharding(sh.mesh, PartitionSpec())
                break
        hit = (jax.jit(_pack, out_shardings=out_sh) if out_sh is not None
               else jax.jit(_pack), groups)
        _PACK_CACHE[key] = hit
    pack_fn, groups = hit
    packed = pack_fn(leaves)
    for buf in packed:   # start all transfers before any blocking read
        try:
            buf.copy_to_host_async()
        except Exception:
            pass

    def finish():
        out: list = [None] * len(leaves)
        for buf, (dt, idx) in zip(packed, groups):
            flat = np.asarray(buf)
            off = 0
            for i in idx:
                n = int(np.prod(shapes[i], dtype=np.int64))
                out[i] = flat[off:off + n].reshape(shapes[i])
                off += n
        return jax.tree.unflatten(treedef, out)

    return finish


def ckpt_path(dir_result: str, project: str, kind: str, fold, seed) -> str:
    return os.path.join(dir_result, project, "ckpts",
                        f"{kind}_fold{fold}_seed{seed}.pth")


def save_checkpoint(path: str, state, score: float, epoch: int,
                    best_step: int = 0, last_step: int = 0) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "model": _to_numpy({"params": state.params,
                            "batch_stats": state.batch_stats}),
        "optimizer": _to_numpy(state.opt_state),
        "best_step": best_step,
        "last_step": last_step,
        "score": float(score),
        "epoch": int(epoch),
        "step": int(state.step),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_into_state(state, payload: Dict[str, Any], with_optimizer: bool = True):
    """Rebuild a TrainState from a checkpoint payload, preserving shardings
    of the template ``state``."""
    import jax.numpy as jnp
    model = payload["model"]

    def put_like(tmpl, val):
        return jax.tree.map(
            lambda t, v: jax.device_put(jnp.asarray(v), t.sharding)
            if hasattr(t, "sharding") else jnp.asarray(v), tmpl, val)

    def like_structure(tmpl, val):
        """Rebuild ``val`` with ``tmpl``'s tree structure when a serializer
        lost tuple/namedtuple containers (orbax restores namedtuples as
        dicts keyed by field name and tuples as lists). Matches nodes by
        *name*, never by flattened leaf position, so same-shaped optimizer
        leaves (e.g. adam's mu vs nu) cannot be silently swapped."""
        if jax.tree.structure(tmpl) == jax.tree.structure(val):
            return val

        def rebuild(t, v):
            import flax.core
            if isinstance(t, flax.core.FrozenDict):
                return flax.core.freeze(rebuild(dict(t), dict(v)))
            if isinstance(t, dict):
                if not isinstance(v, dict) or set(v) != set(t):
                    raise ValueError(
                        f"checkpoint dict keys {sorted(v) if isinstance(v, dict) else type(v)} "
                        f"do not match state keys {sorted(t)}")
                return {k: rebuild(t[k], v[k]) for k in t}
            if isinstance(t, tuple) and hasattr(t, "_fields"):  # namedtuple
                if not t._fields:   # e.g. optax.EmptyState — orbax may
                    return type(t)()  # restore it as None/[]/{}
                if isinstance(v, dict):
                    if set(v) != set(t._fields):
                        raise ValueError(
                            f"checkpoint fields {sorted(v)} do not match "
                            f"optimizer state fields {sorted(t._fields)}")
                    return type(t)(*(rebuild(getattr(t, f), v[f])
                                     for f in t._fields))
                v = list(v) if isinstance(v, (list, tuple)) else [v]
                if len(v) != len(t._fields):
                    raise ValueError(
                        f"checkpoint has {len(v)} entries for "
                        f"{type(t).__name__}({','.join(t._fields)})")
                return type(t)(*(rebuild(g, w) for g, w in zip(t, v)))
            if isinstance(t, (tuple, list)):
                if not isinstance(v, (tuple, list)) or len(v) != len(t):
                    raise ValueError(
                        f"checkpoint sequence length {len(v) if isinstance(v, (tuple, list)) else type(v)} "
                        f"!= state length {len(t)}")
                out = [rebuild(g, w) for g, w in zip(t, v)]
                return tuple(out) if isinstance(t, tuple) else out
            return v  # leaf (or opaque node like optax.EmptyState)

        return rebuild(tmpl, val)

    new = state.replace(
        params=put_like(state.params, like_structure(state.params,
                                                     model["params"])),
        batch_stats=put_like(state.batch_stats,
                             like_structure(state.batch_stats,
                                            model["batch_stats"])),
        step=jnp.asarray(payload.get("step", 0), jnp.int32))
    if with_optimizer and payload.get("optimizer") is not None:
        opt = like_structure(state.opt_state, payload["optimizer"])
        new = new.replace(opt_state=put_like(state.opt_state, opt))
    return new


class AsyncCheckpointer:
    """Periodic non-blocking checkpointing (SURVEY.md §5: the reference's
    only recovery is per-epoch best/last saves, 2_train.py:86-107; here
    --checkpoint-every N adds step-granular saves with the serialization and
    disk write off the training thread, orbax-style async semantics with the
    reference's single-file .pth contract)."""

    def __init__(self):
        import threading
        self._thread: Optional[Any] = None
        self._lock = threading.Lock()

    def save(self, path: str, state, score: float, epoch: int,
             best_step: int = 0, last_step: int = 0) -> None:
        """Fully non-blocking save: the caller only pays the on-device pack
        dispatch (_pack_fetch_start, donation-safe); the D2H drain and the
        disk write happen in a background thread. A still-running previous
        save is joined first so at most one is in flight."""
        self.save_multi([(path, best_step, last_step)], state, score, epoch)

    def save_multi(self, jobs, state, score: float, epoch: int) -> None:
        """``jobs``: [(path, best_step, last_step), ...] written from ONE
        D2H fetch (the 2_train epoch save writes 'last' and, on a val
        improvement, 'best' from the same state — fetching the ~hundreds-MB
        params+optimizer tree through the device link twice per epoch
        measured 2x the entire cost)."""
        import threading
        from ..parallel.distributed import is_primary
        if not is_primary():    # multi-host: process 0 owns the files
            return
        self.wait()
        step = int(state.step)
        finish = _pack_fetch_start({"params": state.params,
                                    "batch_stats": state.batch_stats,
                                    "opt": state.opt_state})

        def _work():
            snap = finish()
            model_np = {"params": snap["params"],
                        "batch_stats": snap["batch_stats"]}
            opt_np = snap["opt"]
            for path, best_step, last_step in jobs:
                payload = {
                    "model": model_np,
                    "optimizer": opt_np,
                    "best_step": best_step,
                    "last_step": last_step,
                    "score": float(score),
                    "epoch": int(epoch),
                    "step": step,
                }
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(payload, f, pickle.HIGHEST_PROTOCOL)
                os.replace(tmp, path)

        with self._lock:
            self._thread = threading.Thread(target=_work, daemon=True)
            self._thread.start()

    def wait(self) -> None:
        with self._lock:
            t = self._thread
        if t is not None:
            t.join()


# ---------------------------------------------------------------------------
# orbax backend (SURVEY.md §5: "orbax async checkpointing" — optional,
# selected by --ckpt-backend orbax; the single-file pickle contract above
# stays the default for reference-layout compatibility)
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(path: str, state, score: float, epoch: int,
                          best_step: int = 0, last_step: int = 0) -> None:
    """Save via orbax PyTreeCheckpointer into a ``<path>.orbax`` directory
    (scalars ride along in the tree)."""
    import orbax.checkpoint as ocp

    payload = {
        "model": _to_numpy({"params": state.params,
                            "batch_stats": state.batch_stats}),
        "optimizer": _to_numpy(state.opt_state),
        "meta": {"best_step": best_step, "last_step": last_step,
                 "score": float(score), "epoch": int(epoch),
                 "step": int(state.step)},
    }
    target = os.path.abspath(path) + ".orbax"
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(target, payload, force=True)


def load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    target = os.path.abspath(path)
    if not target.endswith(".orbax"):
        target += ".orbax"
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(target)
    meta = payload.get("meta", {})
    return {"model": payload["model"], "optimizer": payload.get("optimizer"),
            **{k: meta.get(k) for k in ("best_step", "last_step", "score",
                                        "epoch", "step")}}


def save_checkpoint_any(backend: str, path: str, state, score: float,
                        epoch: int, best_step: int = 0,
                        last_step: int = 0) -> None:
    if backend == "orbax":
        save_checkpoint_orbax(path, state, score, epoch, best_step, last_step)
    else:
        save_checkpoint(path, state, score, epoch, best_step, last_step)


def load_checkpoint_any(backend: str, path: str) -> Dict[str, Any]:
    """Load whichever form exists, preferring the configured backend —
    lets runs switch --ckpt-backend and still resume old checkpoints."""
    has_orbax = path.endswith(".orbax") or os.path.isdir(path + ".orbax")
    has_pickle = os.path.isfile(path)
    if has_orbax and (backend == "orbax" or not has_pickle):
        return load_checkpoint_orbax(path)
    return load_checkpoint(path)


def ckpt_exists(path: str) -> bool:
    """True if either the pickle file or the orbax directory exists."""
    return os.path.exists(path) or os.path.isdir(path + ".orbax")

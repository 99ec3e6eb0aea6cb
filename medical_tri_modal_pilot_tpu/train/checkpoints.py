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
        """Snapshot device arrays (blocks only for D2H), then write in a
        background thread. A still-running previous write is joined first
        so at most one write is in flight."""
        import threading
        from ..parallel.distributed import is_primary
        if not is_primary():    # multi-host: process 0 owns the files
            return
        self.wait()
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

        def _write():
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(payload, f, pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, path)

        with self._lock:
            self._thread = threading.Thread(target=_write, daemon=True)
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

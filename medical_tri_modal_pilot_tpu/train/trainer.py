"""Jitted train/eval step functions + optimizer wiring.

Replaces the reference's per-batch ``missing_trainer``
(builder/trainer/trainer.py:20-242) with two compiled functions over a
data-parallel mesh: ``train_step`` (loss -> grads -> AdamW update with the
cosine-restart schedule inlined) and ``eval_step`` (deterministic forward +
sigmoid + model-specific output selection). The per-sample missing-code
computation (trainer.py:53-105, a torch.unique host trick) reduces to
``2*img_missing + txt_missing`` with bimodal remaps, computed in-graph.

Buffers are donated; params/opt state live replicated on the mesh and the
batch is sharded on the ``data`` axis — XLA inserts the gradient psum over
ICI.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import Config
from ..parallel.mesh import (batch_sharding, make_mesh, replicated_sharding,
                             shard_batch, tree_shardings)
from .schedule import cosine_annealing_warmup_restarts, cosine_warmup_single


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def compute_missing_num(cfg: Config, missing: jnp.ndarray) -> jnp.ndarray:
    """missing: [B, 3] floats (vslt, img, txt; 1 = missing) ->
    canonical candidate index (trainer.py:53-105)."""
    img = missing[:, 1].astype(jnp.int32)
    txt = missing[:, 2].astype(jnp.int32)
    if cfg.input_types == "vslt_img_txt":
        return 2 * img + txt
    if cfg.input_types == "vslt_img":
        return img
    if cfg.input_types == "vslt_txt":
        return txt
    return jnp.zeros_like(img)


# (4, B) membership masks used by the "multi" models' training loss
# (trainer.py:78-84): rows = candidate subsets, 1 = subset invalid for the
# sample's missing case.
_MULTITOKEN_MISSING = np.array([
    [0., 0., 0., 0.],
    [1., 0., 1., 0.],
    [1., 1., 0., 0.],
    [1., 1., 1., 0.],
], dtype=np.float32)


def graft_pretrained_encoder(params, path: str):
    """Replace every ``img_encoder`` subtree with converted torchvision
    weights (tools/convert_torchvision.py output) — the TPU-native stand-in
    for the reference's in-constructor NFS checkpoint load
    (tri_mbt_vsltcls.py:95-100). Leaf shapes must match exactly."""
    import pickle

    with open(path, "rb") as f:
        payload = pickle.load(f)
    pre = payload["params"] if isinstance(payload, dict) and \
        "params" in payload else payload

    def graft(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "img_encoder":
                tmpl_shapes = jax.tree.map(lambda x: x.shape, v)
                new_shapes = jax.tree.map(lambda x: np.asarray(x).shape, pre)
                if tmpl_shapes != new_shapes:
                    flat_t = jax.tree_util.tree_flatten_with_path(tmpl_shapes)[0]
                    flat_n = dict(jax.tree_util.tree_flatten_with_path(
                        new_shapes)[0])
                    for kp, shape in flat_t:
                        other = flat_n.get(kp)
                        if other != shape:
                            raise ValueError(
                                "pretrained encoder shapes do not match the "
                                f"model at {jax.tree_util.keystr(kp)}: model "
                                f"{shape} vs file {other}")
                    raise ValueError(
                        "pretrained encoder tree structure does not match "
                        "the model")
                out[k] = jax.tree.map(
                    lambda t, s: jnp.asarray(s, dtype=t.dtype), v, pre)
            else:
                out[k] = graft(v)
        return out

    import flax.core
    was_frozen = isinstance(params, flax.core.FrozenDict)
    grafted = graft(flax.core.unfreeze(params) if was_frozen else dict(params))
    return flax.core.freeze(grafted) if was_frozen else grafted


def build_schedule(cfg: Config, iters_per_epoch: int) -> Callable:
    max_lr = cfg.lr_init * math.sqrt(cfg.batch_size)
    if cfg.lr_scheduler == "CosineAnnealing":
        return cosine_annealing_warmup_restarts(
            first_cycle_steps=max(cfg.t_0 * iters_per_epoch, 2),
            max_lr=max_lr, min_lr=1e-6,
            warmup_steps=cfg.t_up * iters_per_epoch,
            gamma=cfg.gamma, cycle_mult=float(cfg.t_mult))
    return cosine_warmup_single(
        total_steps=max(cfg.epochs * iters_per_epoch, 2), max_lr=max_lr,
        min_lr=1e-6, warmup_steps=cfg.t_up * iters_per_epoch)


def _trainable_mask(params):
    """False for leaves under an ``img_encoder`` subtree (the frozen swin
    trunk): the reference's no_grad leaves those grads None and torch skips
    them entirely — no update, no weight decay, no moment state
    (tri_mbt_vsltcls.py:208-209 + torch.optim None-grad semantics)."""
    def rec(node, frozen):
        if isinstance(node, (dict, FrozenDict)):
            out = {k: rec(v, frozen or k == "img_encoder")
                   for k, v in node.items()}
            return FrozenDict(out) if isinstance(node, FrozenDict) else out
        return not frozen

    return rec(params, False)


def build_optimizer(cfg: Config, schedule: Callable,
                    mask_frozen_img: bool = False) -> optax.GradientTransformation:
    kind = cfg.optim.replace("_lars", "")
    if kind == "adamw":
        tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    elif kind == "adam":
        tx = optax.adam(schedule)
    else:
        tx = optax.sgd(schedule, momentum=cfg.momentum)
    if cfg.optim.endswith("_lars"):
        # LARC trust-ratio clipping (builder/utils/lars.py:5-101)
        tx = optax.chain(optax.scale_by_trust_ratio(), tx)
    if mask_frozen_img:
        tx = optax.masked(tx, _trainable_mask)
    return tx


def _bce(logits, targets):
    return optax.sigmoid_binary_cross_entropy(logits, targets)


def multitoken_targets(cfg: Config, targets: jnp.ndarray) -> jnp.ndarray:
    """--multitoken train-time target repeat (trainer.py:57-66): bimodal
    (fullmodal txt1/img1) targets are repeated 2x sample-major
    ([B, ...] -> [2B, ...], ordered t0,t0,t1,t1,...) so a model emitting
    one prediction per candidate token is supervised on both. Train flow
    only — eval selects a single output per sample."""
    if cfg.multitoken and cfg.fullmodal_definition in ("txt1", "img1"):
        return jnp.repeat(targets, 2, axis=0)
    return targets


def compute_loss(cfg: Config, logits, rmse, targets, targets_aux,
                 missing, missing_num):
    """Model/loss-type dispatch (trainer.py:164-184)."""
    if cfg.model_types == "classification":
        if cfg.loss_types == "softmax":
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, targets.astype(jnp.int32)).mean()
        if cfg.loss_types == "bces":
            return _bce(logits, targets).mean()
        if cfg.loss_types == "bceandsoftmax":
            return (optax.softmax_cross_entropy_with_integer_labels(
                logits, targets.astype(jnp.int32)).mean()
                + _bce(logits, targets_aux).mean())
        if cfg.loss_types == "rmse":
            return jnp.sqrt(jnp.mean((logits - targets) ** 2) + 1e-12)
        return _bce(logits, targets).mean()

    # detection
    if "multi" in cfg.model:
        # logits [4, B]; mask out invalid subsets per sample
        tgt = jnp.broadcast_to(targets[None], logits.shape)
        w = 1.0 - jnp.asarray(_MULTITOKEN_MISSING).T[:, missing_num]  # [4, B]
        losses = _bce(logits, tgt)
        return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
    if "mbt_vnoshnoavgtr" in cfg.model:
        # logits [3, B]; train each non-missing modality head
        tgt = jnp.broadcast_to(targets[None], logits.shape)
        w = 1.0 - missing.T                                       # [3, B]
        losses = _bce(logits, tgt)
        return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
    loss = _bce(logits, targets).mean()
    if rmse is not None and "rmse" in cfg.auxiliary_loss_type:
        err = (rmse - targets_aux) ** 2
        pos = targets == 1
        rmse_loss = jnp.sqrt(
            jnp.sum(jnp.where(pos, err, 0.0)) / jnp.maximum(pos.sum(), 1))
        loss = loss + jnp.nan_to_num(rmse_loss)
    return loss


def select_eval_output(cfg: Config, logits, missing_num):
    """Eval-time output selection (trainer.py:218-230)."""
    if "multi" in cfg.model:
        return jnp.take_along_axis(logits, missing_num[None], axis=0)[0]
    if "mbt_vnoshnoavgtr" in cfg.model:
        tri = jnp.mean(logits, axis=0)
        vi = (logits[0] + logits[1]) / 2
        vt = (logits[0] + logits[2]) / 2
        cands = jnp.stack([tri, vi, vt, logits[0]])
        onehot = jax.nn.one_hot(missing_num, 4, dtype=cands.dtype)
        return jnp.einsum("bk,kb->b", onehot, cands,
                      precision=jax.lax.Precision.HIGHEST)
    return logits


class Trainer:
    """Owns the mesh, the compiled step functions, and the train state."""

    def __init__(self, cfg: Config, model, iters_per_epoch: int,
                 sample_batch: Dict[str, np.ndarray], seed: int = 0,
                 eval_only: bool = False, txt_table=None):
        from ..models.modules import set_remat
        set_remat(bool(getattr(cfg, "remat", 0)) and not eval_only)
        self.cfg = cfg
        self.model = model
        self.eval_only = eval_only
        self.mesh = make_mesh(cfg.dp_size, cfg.batch_size,
                              getattr(cfg, "mp_size", 0))
        from .. import ops
        # mesh-aware: on a multi-device mesh the kernels are shard_map
        # wrapped so SPMD never all-gathers their operands (ops docstring)
        # --use-pallas 2 forces the kernels on any backend (pallas
        # interpret mode off-TPU — slow, for e2e kernel-dispatch testing)
        ops.configure(cfg.use_pallas == 2 or
                      (bool(cfg.use_pallas)
                       and jax.default_backend() == "tpu"),
                      mesh=self.mesh)
        self.schedule = build_schedule(cfg, max(iters_per_epoch, 1))
        from ..models.registry import frozen_img_trunk
        self.tx = None if eval_only else build_optimizer(
            cfg, self.schedule, mask_frozen_img=frozen_img_trunk(cfg))
        # dropout PRNG: threefry mask generation showed up at ~10% of the
        # measured step (six [B,1024,256] draws/layer-stack); the XLA
        # RngBitGenerator is far cheaper on TPU and dropout needs no
        # cross-backend reproducibility (the reference uses torch RNG)
        prng = getattr(cfg, "prng", "auto")
        if prng == "auto":
            prng = ("rbg" if jax.default_backend() == "tpu"
                    else "threefry2x32")
        jax.config.update("jax_default_prng_impl", prng)
        self._rng = jax.random.PRNGKey(seed)
        self._buckets = self._resolve_buckets()

        # device-resident BioBERT table (data/txt_table.py): unique note
        # embeddings live replicated in HBM; batches carry int32 row ids
        # and _wire_resolve gathers in-graph. bf16 rows under bf16
        # activation precision are bit-equivalent (the model's first text
        # op casts fp32 -> bf16 anyway; bf16 -> f32 -> bf16 round-trips).
        # packed image wire (host->device): in missing-modality regimes
        # most rows carry a zero image; transfer only the present rows
        # (uint8) plus their row indices and scatter to the dense batch
        # in-graph (_wire_resolve). Static capacity = the resolved
        # --img-pack-frac, same as the packed swin trunk; a batch whose
        # present count overflows falls back to the dense wire (its own
        # compiled program, <0.1% of batches by the auto-frac sizing).
        # Single-device meshes only: the pack axis (C rows) is not
        # data-shardable, and multi-chip pods don't sit behind the
        # tunnel's 40 MB/s H2D link this exists for.
        self._wire_pack_c = None
        if (getattr(cfg, "img_wire_pack", 1) and self.mesh.size == 1
                and getattr(cfg, "img_wire_u8", 0)
                and 0.0 < cfg.img_pack_frac < 1.0):
            self._wire_pack_c = min(
                cfg.batch_size,
                int(math.ceil(cfg.batch_size * cfg.img_pack_frac)) + 1)

        self._txt_table_dev = None
        if txt_table is not None:
            from ..parallel.mesh import put_global
            from jax.sharding import PartitionSpec as P
            rows = txt_table.rows
            if cfg.precision == "bf16":
                rows = rows.astype(jnp.bfloat16)
            self._txt_table_dev = put_global(self.mesh, P(), rows)
            # model init needs the dense contract; table rows reproduce
            # exactly what the streaming path would have emitted
            sample_batch = txt_table.densify(sample_batch)
        elif sample_batch.get("img") is not None \
                and np.asarray(sample_batch["img"]).dtype == np.uint8:
            sample_batch = dict(sample_batch)
            sample_batch["img"] = (
                np.asarray(sample_batch["img"]).astype(np.float32) / 255.0)

        batch = self._device_batch(sample_batch)
        missing_num = compute_missing_num(cfg, batch["missing"])
        init_rng, self._rng = jax.random.split(self._rng)
        variables = jax.jit(
            self.model.init, static_argnums=(3,))(
                {"params": init_rng, "dropout": init_rng},
                batch, missing_num, True)
        params = variables["params"]
        if cfg.img_pretrain_path:
            params = graft_pretrained_encoder(params, cfg.img_pretrain_path)
        batch_stats = variables.get("batch_stats", FrozenDict())
        # params/opt live replicated on a 1-D mesh; with --mp-size > 1 the
        # transformer matmuls are tensor-sharded over the 'model' axis
        # (tree_shardings applies the same name+shape rule to params, mu
        # and nu — parallel/mesh.py) and XLA partitions the step.
        rep = replicated_sharding(self.mesh)
        params = jax.device_put(params, tree_shardings(self.mesh, params))
        batch_stats = jax.device_put(batch_stats, rep)
        opt_state = (optax.EmptyState() if eval_only
                     else jax.device_put(
                         self.tx.init(params),
                         tree_shardings(self.mesh,
                                        jax.eval_shape(self.tx.init,
                                                       params))))
        self.state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                batch_stats=batch_stats, opt_state=opt_state)

        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------
    def _resolve_buckets(self) -> tuple:
        """Static TIE stream-length buckets (--tie-buckets): a batch whose
        max input_length fits a smaller bucket is sliced to it before
        device transfer, cutting executed flops AND HBM/PCIe traffic
        proportionally. TIE rows are time-ordered with padding at the END
        (reference dataset_new.py:645-663) and every op downstream masks
        by input_length, so outputs are bucket-invariant. One jit
        compilation per bucket (shape-keyed cache)."""
        cfg = self.cfg
        spec = getattr(cfg, "tie_buckets", "auto")
        if cfg.vslt_type not in ("TIE", "QIE") or spec in ("off", ""):
            return ()
        if spec == "auto":
            cand = [b for b in (256, 512) if b < cfg.tie_len]
        else:
            cand = sorted({int(x) for x in spec.split(",")
                           if x.strip() and 0 < int(x) < cfg.tie_len})
        return tuple(cand) + (cfg.tie_len,) if cand else ()

    def _bucket_batch(self, batch, tie_axis: int = 1):
        """Slice the TIE stream to its batch bucket (host-side; see
        _resolve_buckets). No-op when disabled, already-sliced, or the
        batch isn't TIE-shaped."""
        if not self._buckets:
            return batch
        v = batch.get("vslt")
        if (v is None or v.ndim < tie_axis + 2
                or v.shape[tie_axis] != self._buckets[-1]
                or "input_length" not in batch):
            return batch
        ml = int(np.max(np.asarray(batch["input_length"])))
        bucket = next((bk for bk in self._buckets if ml <= bk),
                      self._buckets[-1])
        if bucket >= v.shape[tie_axis]:
            return batch
        out = dict(batch)
        out["vslt"] = (v[:, :bucket] if tie_axis == 1
                       else v[:, :, :bucket])
        return out

    def wire_pack(self, batch: Dict[str, np.ndarray]):
        """Host-side packed image wire (see __init__): replace a dense
        uint8 ``img`` whose present rows fit the static capacity with
        ``img_pack`` [C, ...] + ``img_rows`` [C] (padding rows index B =
        out-of-range, dropped by the in-graph scatter). No-op when
        disabled, fp32, or overflowing (dense fallback)."""
        C = self._wire_pack_c
        img = batch.get("img")
        if (C is None or img is None or not isinstance(img, np.ndarray)
                or img.dtype != np.uint8 or "missing" not in batch):
            return batch
        rows = np.nonzero(np.asarray(batch["missing"])[:, 1] == 0.0)[0]
        if len(rows) > C:
            return batch
        pack = np.zeros((C,) + img.shape[1:], np.uint8)
        pack[:len(rows)] = img[rows]
        ids = np.full((C,), img.shape[0], np.int32)
        ids[:len(rows)] = rows
        out = dict(batch)
        out.pop("img")
        out["img_pack"] = pack
        out["img_rows"] = ids
        return out

    def wire_pack_many(self, batches):
        """Pack a super-batch's members only when ALL of them fit — a
        [K, ...] stack needs one leaf structure (2_train run_steps)."""
        packed = [self.wire_pack(b) for b in batches]
        if all("img_pack" in p for p in packed):
            return packed
        return batches

    def _device_batch(self, batch: Dict[str, np.ndarray]):
        return shard_batch(self.mesh,
                           self.wire_pack(self._bucket_batch(batch)))

    def _apply(self, params, batch_stats, batch, missing_num, deterministic,
               rng=None):
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = {}
        if not deterministic:
            kwargs["rngs"] = {"dropout": rng}
            out, mutated = self.model.apply(
                variables, batch, missing_num, False,
                mutable=["batch_stats"], **kwargs)
            return out, mutated.get("batch_stats", batch_stats)
        out = self.model.apply(variables, batch, missing_num, True)
        return out, batch_stats

    def _wire_resolve(self, batch, txt_table):
        """In-graph resolution of the H2D wire format (traced): gather
        dense txt rows from the device-resident table for ``txt_id``
        batches (data/txt_table.py) and rescale uint8 CXR pixels to the
        exact k/255 fp32 values ``to_tensor`` produced (images.py:117).
        Bit-identical to streaming the dense fp32 payloads."""
        if "txt_id" in batch:
            batch = dict(batch)
            txt = jnp.take(txt_table, batch.pop("txt_id"), axis=0)
            batch["txt"] = txt.astype(jnp.float32)
        if "img_pack" in batch:
            batch = dict(batch)
            pack = batch.pop("img_pack").astype(jnp.float32) / 255.0
            rows = batch.pop("img_rows")
            B = batch["missing"].shape[0]
            batch["img"] = jnp.zeros((B,) + pack.shape[1:],
                                     jnp.float32).at[rows].set(pack,
                                                               mode="drop")
        img = batch.get("img")
        if img is not None and img.dtype == jnp.uint8:
            batch = dict(batch)
            batch["img"] = img.astype(jnp.float32) / 255.0
        return batch

    def _train_step_impl(self, state: TrainState, batch, rng,
                         txt_table=None):
        cfg = self.cfg
        batch = self._wire_resolve(batch, txt_table)
        missing_num = compute_missing_num(cfg, batch["missing"])

        def loss_fn(params):
            (logits, rmse, aux), new_bs = self._apply(
                params, state.batch_stats, batch, missing_num, False, rng)
            loss = compute_loss(cfg, logits.astype(jnp.float32),
                                None if rmse is None else rmse.astype(jnp.float32),
                                multitoken_targets(cfg, batch["target"]),
                                batch["target_aux"],
                                batch["missing"], missing_num)
            if aux is not None:
                # model-computed auxiliary loss (the auxcpc_* contrastive
                # family, auxcpc_mbt.py:193-204); weighted like the
                # reference's aux term
                loss = loss + cfg.auxiliary_loss_weight * aux.astype(
                    jnp.float32)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        # reference steps the scheduler with the 1-based iteration count
        # (2_train.py:190); optax's count matches after the update below.
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        return new_state, loss

    def _train_multi_impl(self, state: TrainState, batches, rng,
                          txt_table=None):
        """lax.scan over a [K, B, ...] super-batch: K optimizer steps in ONE
        XLA program. Amortizes per-step host dispatch (significant when the
        device sits behind an RPC tunnel) and lets XLA overlap the next
        step's loads with the current update."""
        K = jax.tree.leaves(batches)[0].shape[0]
        rngs = jax.random.split(rng, K)

        def body(carry, xs):
            batch, step_rng = xs
            new_state, loss = self._train_step_impl(carry, batch, step_rng,
                                                    txt_table)
            return new_state, loss

        new_state, losses = jax.lax.scan(body, state, (batches, rngs))
        return new_state, losses

    def train_multi(self, batches, on_device: bool = False):
        """Run one optimizer step per leading-axis slice of ``batches``
        ([K, B, ...]); returns the [K] losses."""
        rng, self._rng = jax.random.split(self._rng)
        if not on_device:
            from jax.sharding import PartitionSpec as P
            from ..parallel.mesh import DATA_AXIS, put_global
            batches = self._bucket_batch(batches, tie_axis=2)
            batches = jax.tree.map(
                lambda x: put_global(self.mesh, P(None, DATA_AXIS), x),
                batches)
        if not hasattr(self, "_train_multi"):
            self._train_multi = jax.jit(self._train_multi_impl,
                                        donate_argnums=(0,))
        self.state, losses = self._train_multi(self.state, batches, rng,
                                               self._txt_table_dev)
        return losses

    def _eval_step_impl(self, state: TrainState, batch, txt_table=None):
        cfg = self.cfg
        batch = self._wire_resolve(batch, txt_table)
        missing_num = compute_missing_num(cfg, batch["missing"])
        (logits, rmse, _aux), _ = self._apply(
            state.params, state.batch_stats, batch, missing_num, True)
        logits = logits.astype(jnp.float32)
        out = select_eval_output(cfg, logits, missing_num)
        if cfg.model_types == "classification":
            loss = compute_loss(cfg, logits,
                                None if rmse is None else rmse.astype(jnp.float32),
                                batch["target"], batch["target_aux"],
                                batch["missing"], missing_num)
        else:
            # reference eval loss is BCE on the per-sample *selected* output
            # for the multi / vnoshnoavgtr families, and plain BCE (no rmse
            # aux term) otherwise (trainer.py:218-233)
            loss = _bce(out, batch["target"]).mean()
        probs = jax.nn.sigmoid(out)
        # eval-time RMSE aggregate (reference intent, trainer.py:210-214 +
        # metrics.py:83-88: MSELoss(reduction='none') on the aux head,
        # restricted to positive samples, sqrt(mean), nan->0): one scalar
        # per batch, averaged across batches by the Evaluator
        eval_rmse = None
        if (rmse is not None and "rmse" in cfg.auxiliary_loss_type
                and cfg.model_types == "detection"):
            err = (rmse.astype(jnp.float32) - batch["target_aux"]) ** 2
            pos = batch["target"] == 1
            eval_rmse = jnp.nan_to_num(jnp.sqrt(
                jnp.sum(jnp.where(pos, err, 0.0))
                / jnp.maximum(pos.sum(), 1)))
        return probs, loss, eval_rmse

    # ------------------------------------------------------------------
    def train_step(self, batch: Dict[str, np.ndarray],
                   on_device: bool = False) -> float:
        rng, self._rng = jax.random.split(self._rng)
        dbatch = batch if on_device else self._device_batch(batch)
        self.state, loss = self._train_step(self.state, dbatch, rng,
                                            self._txt_table_dev)
        return loss

    def eval_step(self, batch: Dict[str, np.ndarray],
                  on_device: bool = False):
        """Returns ``(probs, loss, rmse)``; rmse is None unless the run has
        an aux-rmse head (``--auxiliary-loss-type rmse``, detection)."""
        dbatch = batch if on_device else self._device_batch(batch)
        probs, loss, rmse = self._eval_step(self.state, dbatch,
                                            self._txt_table_dev)
        # multi-host: probs stay data-sharded across processes; gather so
        # every host's Evaluator sees the full per-sample vector
        from ..parallel.distributed import gather_global
        return (gather_global(probs), float(loss),
                None if rmse is None else float(rmse))

    def prefetch(self, loader, depth: int = 2):
        """Iterate a host loader with device transfers ``depth`` ahead."""
        from ..data.pipeline import device_prefetch
        return device_prefetch(loader, self._device_batch, depth)

    def current_lr(self) -> float:
        return float(self.schedule(self.state.step))

"""Trainer semantics: missing-code computation, LR schedule parity against
the reference scheduler (run in torch), loss dispatch."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.train.schedule import (
    cosine_annealing_warmup_restarts)
from medical_tri_modal_pilot_tpu.train.trainer import (compute_loss,
                                                       compute_missing_num)

BASE = ["--train-data-path", "/root/reference/data/sample_data/train",
        "--test-data-path", "/root/reference/data/sample_data/test"]


def test_missing_num_trimodal():
    cfg = parse_config(BASE + ["--input-types", "vslt_img_txt"])
    # rows: (vslt, img, txt)
    missing = jnp.array([[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1]],
                        jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(compute_missing_num(cfg, missing)), [0, 1, 2, 3])


def test_missing_num_bimodal():
    cfg_img = parse_config(BASE + ["--input-types", "vslt_img",
                                   "--fullmodal-definition", "img1"])
    cfg_txt = parse_config(BASE + ["--input-types", "vslt_txt",
                                   "--fullmodal-definition", "txt1"])
    missing = jnp.array([[0, 0, 1], [0, 1, 1]], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(compute_missing_num(cfg_img, missing)), [0, 1])
    missing = jnp.array([[0, 1, 0], [0, 1, 1]], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(compute_missing_num(cfg_txt, missing)), [0, 1])


def test_schedule_matches_reference_scheduler():
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    from builder.utils.cosine_annealing_with_warmup_v2 import (
        CosineAnnealingWarmupRestarts as RefSched)

    iters_per_epoch = 7
    max_lr = 1e-4 * math.sqrt(32)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    ref = RefSched(opt, first_cycle_steps=50 * iters_per_epoch, cycle_mult=2,
                   max_lr=max_lr, min_lr=1e-6,
                   warmup_steps=5 * iters_per_epoch, gamma=0.5)
    ours = cosine_annealing_warmup_restarts(
        first_cycle_steps=50 * iters_per_epoch, max_lr=max_lr, min_lr=1e-6,
        warmup_steps=5 * iters_per_epoch, gamma=0.5, cycle_mult=2.0)
    # the reference driver calls scheduler.step(iteration) with iteration
    # starting at 1 (2_train.py:172,190)
    for it in list(range(1, 60)) + [349, 350, 351, 700, 1049, 1100, 2000]:
        ref.step(it)
        ref_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(ours(it)), ref_lr, rtol=1e-5,
                                   err_msg=f"iteration {it}")


def test_vnosh_loss_masks_missing_heads():
    cfg = parse_config(BASE + ["--input-types", "vslt_img_txt",
                               "--model", "tri_mbt_vnoshnoavgtr"])
    logits = jnp.array([[10.0, 10.0], [-10.0, -10.0], [0.0, 0.0]])  # [3, B]
    targets = jnp.array([1.0, 1.0])
    # sample 0: all present; sample 1: img+txt missing
    missing = jnp.array([[0, 0, 0], [0, 1, 1]], jnp.float32)
    mn = compute_missing_num(cfg, missing)
    loss = compute_loss(cfg, logits, None, targets, jnp.zeros(2), missing, mn)
    # manual: sample0 heads all; sample1 only vslt head
    import optax
    l = optax.sigmoid_binary_cross_entropy(logits, jnp.broadcast_to(targets, (3, 2)))
    w = 1.0 - missing.T
    expected = float((l * w).sum() / w.sum())
    assert float(loss) == pytest.approx(expected, rel=1e-6)


def test_async_checkpointer(tmp_path):
    import numpy as np
    import jax.numpy as jnp
    from medical_tri_modal_pilot_tpu.train.checkpoints import (
        AsyncCheckpointer, load_checkpoint)

    class FakeState:
        params = {"w": jnp.arange(4.0)}
        batch_stats = {}
        opt_state = {"m": jnp.zeros(4)}
        step = jnp.asarray(7)

    path = str(tmp_path / "ckpts" / "last_fold0_seed412.pth")
    ck = AsyncCheckpointer()
    ck.save(path, FakeState(), score=0.5, epoch=2, last_step=7)
    ck.wait()
    payload = load_checkpoint(path)
    assert payload["step"] == 7 and payload["epoch"] == 2
    np.testing.assert_array_equal(payload["model"]["params"]["w"],
                                  np.arange(4.0))
    # second save overwrites atomically
    ck.save(path, FakeState(), score=0.9, epoch=3, last_step=9)
    ck.wait()
    assert load_checkpoint(path)["epoch"] == 3


def test_train_multi_matches_sequential():
    """lax.scan multi-step == K sequential train_step calls."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _tiny_cfg, _synthetic_batch
    from medical_tri_modal_pilot_tpu.models import get_model
    from medical_tri_modal_pilot_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(batch_size=4, trimodal=False)
    model = get_model(cfg)
    K = 3
    batches = [_synthetic_batch(cfg, 4, seed=i) for i in range(K)]
    t_seq = Trainer(cfg, model, 10, batches[0], seed=7)
    t_scan = Trainer(cfg, model, 10, batches[0], seed=7)
    base = jax.random.PRNGKey(42)
    rngs = jax.random.split(base, K)
    # drive the private impls with identical per-step rngs for an exact match
    dev = [t_seq._device_batch(b) for b in batches]
    seq_losses = []
    for i in range(K):
        t_seq.state, loss = t_seq._train_step(t_seq.state, dev[i], rngs[i])
        seq_losses.append(float(loss))
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    scan_losses = np.asarray(t_scan._train_multi_impl(
        t_scan.state, jax.tree.map(jnp.asarray, stacked), base)[1])
    np.testing.assert_allclose(scan_losses, np.asarray(seq_losses),
                               rtol=2e-3, atol=2e-3)
    new_state, _ = jax.jit(t_scan._train_multi_impl)(
        t_scan.state, jax.tree.map(jnp.asarray, stacked), base)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3),
        new_state.params, t_seq.state.params)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """orbax backend: save -> load -> restore_into_state reproduces params
    and the optax opt_state (tuple structure rebuilt from the template)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _tiny_cfg, _synthetic_batch
    from medical_tri_modal_pilot_tpu.models import get_model
    from medical_tri_modal_pilot_tpu.train.checkpoints import (
        ckpt_exists, load_checkpoint_any, restore_into_state,
        save_checkpoint_any)
    from medical_tri_modal_pilot_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(batch_size=4, trimodal=False)
    model = get_model(cfg)
    batch = _synthetic_batch(cfg, 4)
    trainer = Trainer(cfg, model, 10, batch, seed=3)
    trainer.train_step(batch)
    path = str(tmp_path / "best_fold0_seed412.pth")
    save_checkpoint_any("orbax", path, trainer.state, score=0.7, epoch=2,
                        last_step=1)
    assert ckpt_exists(path) and not (tmp_path / "best_fold0_seed412.pth").exists()

    payload = load_checkpoint_any("orbax", path)
    assert int(payload["epoch"]) == 2 and float(payload["score"]) == 0.7
    fresh = Trainer(cfg, model, 10, batch, seed=99)
    restored = restore_into_state(fresh.state, payload)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), restored.params, trainer.state.params)
    assert jax.tree.structure(restored.opt_state) == jax.tree.structure(
        fresh.state.opt_state)


def test_frozen_swin_trunk_excluded_from_optimizer():
    """The reference runs swin under no_grad -> grads None -> torch AdamW
    skips those params entirely (no update, no weight decay, no moments).
    optax.masked must reproduce that: img_encoder params bitwise unchanged
    after a step, other params updated, masked moment leaves absent."""
    import jax
    import optax
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _synthetic_batch
    from medical_tri_modal_pilot_tpu.config import parse_config
    from medical_tri_modal_pilot_tpu.models import get_model
    from medical_tri_modal_pilot_tpu.models.registry import frozen_img_trunk
    from medical_tri_modal_pilot_tpu.train.trainer import Trainer

    cfg = parse_config([
        "--input-types", "vslt_img_txt", "--output-type", "intubation",
        "--modality-inclusion", "train-missing_test-missing",
        "--model", "tri_mbt_vsltcls", "--batch-size", "2",
        "--TIE-len", "16", "--transformer-num-layers", "1",
        "--transformer-dim", "64", "--transformer-num-head", "2",
        "--img-model-type", "swin", "--img-pretrain", "Yes",
        "--image-size", "224", "--precision", "fp32",
        "--weight_decay", "0.1",
    ])
    assert frozen_img_trunk(cfg)
    model = get_model(cfg)
    batch = _synthetic_batch(cfg, 2)
    tr = Trainer(cfg, model, 10, batch, seed=0)

    def img_subtree(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat
                if "img_encoder" in jax.tree_util.keystr(kp)}

    before = img_subtree(tr.state.params)
    assert before, "expected an img_encoder subtree"
    other_before = np.asarray(jax.tree.leaves(
        {k: v for k, v in tr.state.params.items()})[0]).copy()
    tr.train_step(batch)
    after = img_subtree(tr.state.params)
    for k in before:
        np.testing.assert_array_equal(before[k], after[k])
    # masked leaves carry MaskedNode (no moment buffers) in the adam state
    masked_nodes = [x for x in jax.tree.leaves(
        tr.state.opt_state, is_leaf=lambda n: isinstance(n, optax.MaskedNode))
        if isinstance(n := x, optax.MaskedNode)]
    assert masked_nodes, "expected MaskedNode entries for the frozen trunk"

"""TIE stream-length bucketing (--tie-buckets): short batches are sliced
to the smallest static bucket covering their max input_length before
device transfer (train/trainer.py::_resolve_buckets), cutting executed
flops and transfer bytes proportionally. TIE rows are time-ordered with
padding at the END (reference dataset_new.py:645-663) and everything
downstream masks by input_length, so outputs must be bucket-invariant.
"""
import numpy as np
import pytest

from __graft_entry__ import _synthetic_batch, _tiny_cfg
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg(4, trimodal=True).replace(tie_len=512)
    model = get_model(cfg)
    batch = _synthetic_batch(cfg, 4)
    batch["input_length"] = np.array([100, 50, 200, 30], np.int32)
    return cfg, model, batch


def test_bucket_resolution_and_slicing(setup):
    cfg, model, batch = setup
    tr = Trainer(cfg, model, 1, batch, seed=0, eval_only=True)
    assert tr._buckets == (256, 512)          # auto at tie_len=512
    assert tr._bucket_batch(batch)["vslt"].shape == (4, 256, 3)
    long = dict(batch, input_length=np.array([500, 1, 1, 1], np.int32))
    assert tr._bucket_batch(long)["vslt"].shape == (4, 512, 3)
    off = Trainer(cfg.replace(tie_buckets="off"), model, 1, batch,
                  seed=0, eval_only=True)
    assert off._buckets == ()
    assert off._bucket_batch(batch)["vslt"].shape == (4, 512, 3)
    # carryforward vslt types never bucket
    cf = Trainer(cfg.replace(vslt_type="carryforward"), model, 1, batch,
                 seed=0, eval_only=True)
    assert cf._buckets == ()


def test_eval_bucket_invariant(setup):
    """Identical probabilities whether the batch runs at the full TIE
    length or its bucket (padding rows are fully masked)."""
    cfg, model, batch = setup
    off = Trainer(cfg.replace(tie_buckets="off"), model, 1, batch,
                  seed=0, eval_only=True)
    on = Trainer(cfg, model, 1, batch, seed=0, eval_only=True)
    on.state = off.state                       # same params
    p_off, l_off, _ = off.eval_step(batch)
    p_on, l_on, _ = on.eval_step(batch)
    np.testing.assert_allclose(np.asarray(p_on), np.asarray(p_off),
                               atol=2e-6)
    assert abs(float(l_on) - float(l_off)) < 2e-6


def test_train_step_bucket_invariant(setup):
    """One optimizer step gives the same loss (and keeps training) at the
    bucketed length; a later long batch recompiles at the full length."""
    cfg, _, batch = setup
    # dropout=0 (model rebuilt with it): the dropout PRNG draws masks
    # per-shape, so a bucketed stream gets a different (equally valid)
    # stream than the full one
    cfg = cfg.replace(dropout=0.0)
    model = get_model(cfg)
    off = Trainer(cfg.replace(tie_buckets="off"), model, 1, batch, seed=0)
    on = Trainer(cfg, model, 1, batch, seed=0)
    l_off = float(off.train_step(batch))
    l_on = float(on.train_step(batch))
    assert abs(l_on - l_off) < 2e-5
    long = dict(batch, input_length=np.array([500, 1, 1, 1], np.int32))
    assert np.isfinite(float(on.train_step(long)))


def test_length_rebatch_preserves_multiset():
    """length_rebatch keeps every sample exactly once per pool and sorts
    the pool's samples by input_length across the re-chunked batches."""
    from medical_tri_modal_pilot_tpu.data.pipeline import length_rebatch
    rng = np.random.default_rng(0)
    batches = [{"input_length": rng.integers(1, 500, 4).astype(np.int32),
                "x": rng.normal(size=(4, 3)).astype(np.float32)}
               for _ in range(5)]
    out = list(length_rebatch(iter(batches), 2))
    assert len(out) == 5
    # pool 1 = batches 0-1 sorted, pool 2 = batches 2-3, tail = batch 4
    # a singleton tail pool passes through unsorted by design (intra-batch
    # order cannot change the batch's bucket)
    for pool, expect_sorted in (((0, 1), True), ((2, 3), True),
                                ((4,), False)):
        lens_in = np.concatenate([batches[i]["input_length"]
                                  for i in pool])
        lens_out = np.concatenate([out[i]["input_length"]
                                   for i in pool])
        assert sorted(lens_in) == sorted(lens_out)     # same multiset
        if expect_sorted:
            assert list(lens_out) == sorted(lens_out)
        x_in = np.concatenate([batches[i]["x"] for i in pool])
        x_out = np.concatenate([out[i]["x"] for i in pool])
        # sample rows still paired with their lengths
        for ln, row in zip(lens_out, x_out):
            j = np.where(lens_in == ln)[0]
            assert any(np.array_equal(x_in[k], row) for k in j)
    # off: identity
    assert list(length_rebatch(iter(batches), 0)) == batches


def test_train_multi_buckets_superbatch(setup):
    """train_multi slices the [K, B, L, 3] super-batch on axis 2 by the
    max length across all K steps."""
    cfg, model, batch = setup
    tr = Trainer(cfg, model, 4, batch, seed=0)
    stacked = {k: np.stack([batch[k]] * 2) for k in batch}
    out = tr._bucket_batch(stacked, tie_axis=2)
    assert out["vslt"].shape == (2, 4, 256, 3)
    losses = np.asarray(tr.train_multi(stacked))
    assert losses.shape == (2,) and np.all(np.isfinite(losses))


def test_replay_loader_caches_and_replays():
    """ReplayLoader: pass 1 streams + caches; pass 2 replays identical
    batches without touching the inner loader; a byte budget smaller than
    the set caches only a prefix and re-streams the rest each pass."""
    from medical_tri_modal_pilot_tpu.data.pipeline import ReplayLoader

    class CountingLoader:
        def __init__(self, batches):
            self.batches = batches
            self.built = 0

        def __len__(self):
            return len(self.batches)

        def __iter__(self):
            for b in self.batches:
                self.built += 1
                yield {k: v.copy() for k, v in b.items()}

    batches = [{"x": np.full((4, 8), i, np.float32),
                "target": np.arange(4) + i} for i in range(3)]
    inner = CountingLoader(batches)
    rl = ReplayLoader(inner, budget_mb=64)
    first = list(rl)
    assert inner.built == 3 and len(first) == 3
    second = list(rl)
    assert inner.built == 3, "replay must not re-assemble"
    for a, b in zip(first, second):
        assert a is b
        assert not b["x"].flags.writeable   # mutation guard
    assert np.array_equal(second[1]["x"], batches[1]["x"])

    # budget that fits only ~1 batch: cache dropped, every pass streams
    inner2 = CountingLoader(batches)
    tiny = ReplayLoader(inner2, budget_mb=0)
    tiny.budget = batches[0]["x"].nbytes + batches[0]["target"].nbytes
    assert len(list(tiny)) == 3 and inner2.built == 3
    assert len(list(tiny)) == 3 and inner2.built == 6
    assert tiny._cache == [] and tiny._overflow

    # interrupted first pass: the partial cache must be discarded, not
    # appended to (a prefix duplicate would corrupt every later epoch)
    inner3 = CountingLoader(batches)
    rl3 = ReplayLoader(inner3, budget_mb=64)
    it = iter(rl3)
    next(it)            # consume 1 of 3, then abandon the pass
    del it
    full = list(rl3)    # second pass rebuilds from scratch
    assert len(full) == 3 and not rl3._overflow and rl3._complete
    replay = list(rl3)
    assert len(replay) == 3 and inner3.built == 4
    assert np.array_equal(replay[0]["x"], batches[0]["x"])


def test_replay_loader_stale_generator_cannot_corrupt():
    """A pass-1 generator abandoned mid-stream and RESUMED after a newer
    pass completed must neither append duplicates to the published cache
    nor flip its completeness (advisor finding r4: the reset-on-reentry
    mutated shared state inside the generator)."""
    from medical_tri_modal_pilot_tpu.data.pipeline import ReplayLoader

    class CountingLoader:
        def __init__(self, batches):
            self.batches = batches
            self.built = 0

        def __len__(self):
            return len(self.batches)

        def __iter__(self):
            for b in self.batches:
                self.built += 1
                yield {k: v.copy() for k, v in b.items()}

    batches = [{"x": np.full((4, 8), i, np.float32)} for i in range(3)]
    inner = CountingLoader(batches)
    rl = ReplayLoader(inner, budget_mb=64)
    stale = iter(rl)
    next(stale)                      # pass 1 abandoned mid-stream
    full = list(rl)                  # pass 2 completes and publishes
    assert len(full) == 3 and rl._complete
    leftovers = list(stale)          # stale generator resumed AFTER
    assert len(leftovers) == 2       # publish: drains but must not touch
    assert len(rl._cache) == 3       # the published cache
    assert len(list(rl)) == 3 and inner.built == 6  # replay, no rebuild


def test_maybe_replay_respects_observed_prop():
    """Replay must auto-disable when --image/text-observed-prop < 100:
    those draw per-item modality dropout from a stateful rng every pass
    (data/dataset.py:389-392), so replaying pass-1 batches would freeze
    the draws — and the behavior must not depend on the cache budget."""
    from medical_tri_modal_pilot_tpu.config import parse_config
    from medical_tri_modal_pilot_tpu.data.pipeline import (ReplayLoader,
                                                           maybe_replay)
    loader = object()
    cfg = parse_config([])
    assert isinstance(maybe_replay(loader, cfg), ReplayLoader)
    for flag in ("--image-observed-prop", "--text-observed-prop"):
        cfg_p = parse_config([flag, "50"])
        assert maybe_replay(loader, cfg_p) is loader
    cfg_off = parse_config(["--eval-batch-cache-mb", "0"])
    assert maybe_replay(loader, cfg_off) is loader

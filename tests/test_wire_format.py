"""H2D wire-format equivalence: device-resident BioBERT table + uint8 CXR.

The dataset may emit a compact wire format (``txt_id`` int32 rows into a
device-resident embedding table, uint8 pixels) that the trainer resolves
in-graph (trainer._wire_resolve). These tests pin the contract: resolved
wire batches are BIT-IDENTICAL to the streaming dense batches the
reference-parity tests verify, across missing-modality combinations —
and the capacity gate falls back to streaming, never truncating.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.data.pipeline import get_data_loaders
from medical_tri_modal_pilot_tpu.data.txt_table import build_txt_table
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_wire")
    from tools.make_synthetic_fixtures import main as make
    make(["--out", str(out), "--n-train", "14", "--n-test", "6",
          "--seed", "11"])
    return str(out)


def _cfg(synth, tmp_path, extra=()):
    argv = ["--train-data-path", f"{synth}/train",
            "--test-data-path", f"{synth}/test",
            "--image-data-path", f"{synth}/images/",
            "--biobert-path", f"{synth}/mimic4_embeddings.h5",
            "--input-types", "vslt_img_txt", "--output-type", "intubation",
            "--modality-inclusion", "train-missing_test-missing",
            "--model", "tri_mbt_vsltcls", "--batch-size", "4",
            "--num-workers", "1", "--TIE-len", "64",
            "--transformer-num-layers", "2", "--transformer-dim", "64",
            "--transformer-num-head", "2", "--img-model-type", "resnet18",
            "--imgtxt-time", "1", "--precision", "fp32",
            "--dir-result", str(tmp_path / "res")] + list(extra)
    return parse_config(argv).replace(dir_root=synth, seed=412)


def _loaders(cfg):
    # sampler/dataset draws are seeded; identical cfg -> identical epochs
    return get_data_loaders(cfg)


def test_wire_batches_bit_identical_to_streaming(synth, tmp_path):
    cfg_s = _cfg(synth, tmp_path, ["--txt-device-table-mb", "0",
                                   "--img-wire-u8", "0"])
    cfg_w = _cfg(synth, tmp_path)
    assert cfg_w.txt_device_table_mb > 0 and cfg_w.img_wire_u8 == 1
    tr_s, va_s, te_s = _loaders(cfg_s)
    tr_w, va_w, te_w = _loaders(cfg_w)
    table = build_txt_table(cfg_w, (tr_w.dataset, va_w.dataset,
                                    te_w.dataset))
    assert table is not None, "fixtures must produce a buildable table"
    assert not table.rows[0].any(), "row 0 is the all-zero missing row"

    seen_txt = seen_u8_img = 0
    for ls, lw in ((tr_s, tr_w), (te_s, te_w)):
        for bs, bw in zip(ls, lw):
            assert "txt" not in bw and "txt_id" in bw
            assert bw["img"].dtype == np.uint8
            resolved = table.densify(bw)
            assert set(resolved) == set(bs)
            for k in bs:
                np.testing.assert_array_equal(
                    resolved[k], bs[k], err_msg=f"field {k}")
            seen_txt += int(np.any(bw["txt_id"] > 0))
            seen_u8_img += int(bw["img"].any())
    # the fixtures must actually exercise non-missing text and images,
    # otherwise the equality above proves nothing about the table path
    assert seen_txt > 0 and seen_u8_img > 0


def test_trainer_losses_identical_across_wire_modes(synth, tmp_path):
    cfg_s = _cfg(synth, tmp_path, ["--txt-device-table-mb", "0",
                                   "--img-wire-u8", "0"])
    cfg_w = _cfg(synth, tmp_path)
    tr_s, va_s, te_s = _loaders(cfg_s)
    tr_w, va_w, te_w = _loaders(cfg_w)
    table = build_txt_table(cfg_w, (tr_w.dataset, va_w.dataset,
                                    te_w.dataset))
    assert table is not None

    model = get_model(cfg_s)
    bs = list(tr_s)
    bw = list(tr_w)
    t_s = Trainer(cfg_s, model, len(bs), bs[0], seed=412)
    t_w = Trainer(cfg_w, model, len(bw), bw[0], seed=412,
                  txt_table=table)
    # eval on the UNTRAINED identical params first: wire resolution feeds
    # the model bit-identical inputs, so probs agree to fusion-level ulps
    p_s, el_s, _ = t_s.eval_step(next(iter(te_s)))
    p_w, el_w, _ = t_w.eval_step(next(iter(te_w)))
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_w),
                               rtol=1e-5, atol=1e-6)
    assert abs(float(el_s) - float(el_w)) <= 1e-5
    for b_s, b_w in zip(bs, bw):
        l_s = float(t_s.train_step(b_s))
        l_w = float(t_w.train_step(b_w))
        # inputs are bit-identical (test above), but the wire program's
        # HLO differs (in-graph gather + u8/255), so XLA may fuse and
        # reassociate fp32 reductions differently; params then compound
        # that drift across steps — hence the loose-ish per-step bound
        assert abs(l_s - l_w) <= 1e-4 * max(1.0, abs(l_s)), (l_s, l_w)


def test_packed_img_wire_roundtrip_and_overflow(synth, tmp_path):
    # the packed wire is gated to single-device meshes (the pack axis is
    # not data-shardable) — pin dp-size 1 under the 8-device CPU conftest
    cfg = _cfg(synth, tmp_path, ["--img-pack-frac", "0.5",
                                 "--dp-size", "1"])
    tr, va, te = _loaders(cfg)
    table = build_txt_table(cfg, (tr.dataset, va.dataset, te.dataset))
    model = get_model(cfg)
    batches = list(tr)
    t = Trainer(cfg, model, len(batches), batches[0], seed=412,
                txt_table=table)
    assert t._wire_pack_c == min(cfg.batch_size,
                                 int(np.ceil(cfg.batch_size * 0.5)) + 1)
    saw_packed = False
    for b in batches:
        p = t.wire_pack(dict(b))
        present = (b["missing"][:, 1] == 0.0)
        if present.sum() <= t._wire_pack_c:
            assert "img_pack" in p and "img" not in p
            # host-side reconstruction equals the dense wire exactly
            dense = np.zeros_like(b["img"])
            for slot, row in enumerate(p["img_rows"]):
                if row < len(dense):
                    dense[row] = p["img_pack"][slot]
            np.testing.assert_array_equal(dense, b["img"])
            saw_packed = True
        else:
            assert "img" in p
        loss = float(t.train_step(b))
        assert np.isfinite(loss)
    assert saw_packed

    # overflow: every row present exceeds the 0.5-frac capacity -> the
    # dense wire is used verbatim (its own compiled program)
    full = dict(batches[0])
    full["missing"] = np.zeros_like(full["missing"])
    assert "img" in t.wire_pack(full)
    assert np.isfinite(float(t.train_step(full)))

    # wire_pack_many: a super-batch with one overflowing member keeps the
    # whole pool dense (single leaf structure for the [K, ...] stack)
    many = t.wire_pack_many([dict(batches[0]), full])
    assert all("img" in m for m in many)


def test_table_capacity_fallback_streams_dense(synth, tmp_path):
    cfg = _cfg(synth, tmp_path, ["--txt-device-table-mb", "1"])
    tr, va, te = _loaders(cfg)
    # 1 MB cannot hold even a handful of (64-token-size) rows at these
    # shapes IF any rows exist; with the tiny token geometry rows are
    # small, so force the issue by checking the builder's invariant
    table = build_txt_table(cfg, (tr.dataset, va.dataset, te.dataset))
    if table is not None:
        assert table.nbytes <= 1 * 2 ** 20
        return
    b = next(iter(tr))
    assert "txt" in b and "txt_id" not in b


def test_wire_on_data_parallel_mesh(synth, tmp_path):
    """txt_id gather + uint8 img under SPMD: ids shard on 'data', the
    table stays replicated (put_global P()), XLA partitions the gather.
    The packed-img wire must gate itself OFF on a multi-device mesh."""
    import jax
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs the 8-device CPU conftest mesh")
    cfg = _cfg(synth, tmp_path, ["--batch-size", str(2 * n),
                                 "--img-pack-frac", "0.5"])
    cfg = cfg.replace(dp_size=n)
    tr, va, te = _loaders(cfg)
    table = build_txt_table(cfg, (tr.dataset, va.dataset, te.dataset))
    assert table is not None
    model = get_model(cfg)
    batches = [b for b in tr if len(b["target"]) == cfg.batch_size]
    if not batches:
        pytest.skip("fixtures too small for this batch size")
    t = Trainer(cfg, model, len(batches), batches[0], seed=412,
                txt_table=table)
    assert t.mesh.size == n
    assert t._wire_pack_c is None, "pack wire must stay off on a mesh"
    assert "txt_id" in batches[0] and batches[0]["img"].dtype == np.uint8
    loss = float(t.train_step(batches[0]))
    assert np.isfinite(loss)
    probs, el, _ = t.eval_step(batches[0])
    assert np.asarray(probs).shape == (cfg.batch_size,)
    assert np.isfinite(float(el))


def test_fetch_text_id_gates_mirror_fetch_text(synth, tmp_path):
    """Every gate that makes fetch_text emit the zero row must map to row
    0: forced missing-combination, observed-prop dropout, txt0 file name,
    empty note, note absent from the table."""
    from medical_tri_modal_pilot_tpu.data.text import fetch_text_id
    cfg = _cfg(synth, tmp_path)
    tr, va, te = _loaders(cfg)
    table = build_txt_table(cfg, (tr.dataset, va.dataset, te.dataset))
    assert table is not None and len(table.rows_by_text) > 0
    text, row = next(iter(table.rows_by_text.items()))
    pkl = {"txt_input": [text]}
    args = dict(phase_missing_key="train-missing", force_missing=False,
                observed=True)
    ok = fetch_text_id(cfg, pkl, "img1_txt1", table, **args)
    assert ok == (row, int(table.lengths[row]), False)
    assert fetch_text_id(cfg, pkl, "img1_txt1", table,
                         "train-missing", force_missing=True)[2] is True
    assert fetch_text_id(cfg, pkl, "img1_txt1", table, "train-missing",
                         False, observed=False) == (0, 0, True)
    assert fetch_text_id(cfg, pkl, "img1_txt0", table, **args) == (0, 0, True)
    assert fetch_text_id(cfg, {"txt_input": ["  "]}, "img1_txt1", table,
                         **args) == (0, 0, True)
    assert fetch_text_id(cfg, {"txt_input": ["no such note"]}, "img1_txt1",
                         table, **args) == (0, 0, True)


def test_table_bf16_rows_under_bf16_precision(synth, tmp_path):
    """--precision bf16 stores the device table in bf16 (half the HBM);
    the model's first text op casts to bf16 anyway, so the round-trip is
    value-equivalent. Pin that the step runs finite with bf16 rows."""
    import jax.numpy as jnp
    cfg = _cfg(synth, tmp_path)
    cfg = cfg.replace(precision="bf16")
    tr, va, te = _loaders(cfg)
    table = build_txt_table(cfg, (tr.dataset, va.dataset, te.dataset))
    assert table is not None
    model = get_model(cfg)
    batches = list(tr)
    t = Trainer(cfg, model, len(batches), batches[0], seed=412,
                txt_table=table)
    assert t._txt_table_dev.dtype == jnp.bfloat16
    assert np.isfinite(float(t.train_step(batches[0])))


def test_table_budget_zero_disables(synth, tmp_path):
    cfg = _cfg(synth, tmp_path, ["--txt-device-table-mb", "0"])
    tr, va, te = _loaders(cfg)
    assert build_txt_table(cfg, (tr.dataset, va.dataset, te.dataset)) is None
    b = next(iter(tr))
    assert "txt" in b and "txt_id" not in b

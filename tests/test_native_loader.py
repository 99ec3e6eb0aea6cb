"""Parity of the C++ TIE assembler against the python dataset path."""
import glob
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.data.native import (TIEBatchAssembler,
                                                     build_record_cache,
                                                     load_library)
from medical_tri_modal_pilot_tpu.data import window as W
from medical_tri_modal_pilot_tpu.constants import FEATURE_MINS, FEATURE_MAX_MINS
import pickle
import random


@pytest.fixture(scope="module")
def paths():
    return sorted(glob.glob("/root/reference/data/sample_data/train/*.pkl"))


def _python_reference(path, key, length, tie_len, realtime, adjust_key):
    with open(path, "rb") as f:
        raw = pickle.load(f)
    data = (raw["data"] - FEATURE_MINS) / FEATURE_MAX_MINS
    hours = list(raw["data_in_time"][key - length + 1:key + 1])
    data_seq, _m, delta_seq, _il = W.sequence_generator(
        data, raw["mask"], raw["delta"], key, length, 24)
    hours, length2, kdelta, _late = W.trim_nones(hours, length, adjust_key)
    return W.assemble_tie(data_seq, delta_seq, hours, key + kdelta, length2,
                          tie_len, realtime)


@pytest.mark.parametrize("realtime", [True, False])
def test_native_matches_python(paths, realtime):
    assert load_library() is not None, "run native/build.sh first"
    cache = build_record_cache(paths)
    rng = random.Random(0)
    stay_idx, keys, lengths = [], [], []
    expected = []
    for i, p in enumerate(paths):
        with open(p, "rb") as f:
            raw = pickle.load(f)
        wins = {k: v for k, v in raw["possibleWinSizes"].items() if k < raw["data"].shape[0]}
        if not wins:
            continue
        for _ in range(3):
            key = rng.choice(sorted(wins))
            length = rng.choice([l for l in wins[key] if l >= 3])
            stay_idx.append(i)
            keys.append(key)
            lengths.append(length)
            expected.append(_python_reference(p, key, length, 64, realtime, True))
    asm = TIEBatchAssembler(cache, 64, realtime, adjust_key=True)
    out, out_len, out_mt = asm.assemble(np.array(stay_idx), np.array(keys),
                                        np.array(lengths))
    for b, (exp_tie, exp_len, exp_mt) in enumerate(expected):
        assert out_len[b] == exp_len, (b, out_len[b], exp_len)
        np.testing.assert_allclose(out[b], exp_tie, atol=2e-5,
                                   err_msg=f"sample {b}")
        np.testing.assert_allclose(out_mt[b], exp_mt, atol=2e-5,
                                   err_msg=f"min_time {b}")


def test_native_dataset_path_matches_python():
    """--worker-type native produces bit-equal samples to the numpy path
    through the full EvalDataset (vslt + targets + img/txt side channels)."""
    assert load_library() is not None, "run native/build.sh first"
    from medical_tri_modal_pilot_tpu.data.dataset import EvalDataset
    from medical_tri_modal_pilot_tpu.data.indexer import (build_eval_index,
                                                          search_walk)
    argv = ["--input-types", "vslt", "--output-type", "intubation",
            "--model", "unimodal_transformer", "--vslt-type", "TIE",
            "--modality-inclusion", "train-missing_test-missing",
            "--test-data-path", "/root/reference/data/sample_data/test"]
    cfg_py = parse_config(argv + ["--worker-type", "thread"])
    cfg_nat = parse_config(argv + ["--worker-type", "native"])
    paths = search_walk(cfg_py.test_data_path, ".pkl")
    idx = build_eval_index(cfg_py, paths, "test")
    ds_py = EvalDataset(cfg_py, idx, "test", seed=0)
    ds_nat = EvalDataset(cfg_nat, idx, "test", seed=0)
    assert len(ds_py) > 0
    for i in range(len(ds_py)):
        a, b = ds_py[i], ds_nat[i]
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float64), np.asarray(b[k], np.float64),
                atol=2e-5, err_msg=f"sample {i} field {k}")
    assert ds_nat.native is not None and ds_nat.native.lib is not None

"""Golden parity of the sample-index machinery against the reference
dataset classes executed in-process from /root/reference (torch CPU).

The reference reads ./builder/data/text/... and ./data/*.h5 relative to
cwd and writes ./data/testIndexes — tests run inside a tmp dir with a
``builder`` symlink into the reference tree and a tiny fixture h5 at the
default --biobert-path (its argparse restricts that flag's choices)."""
import contextlib
import glob
import io
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.data.indexer import (_build_train_index,
                                                      build_eval_index)
from ref_shim import import_reference

BASE = ["--train-data-path", "/root/reference/data/sample_data/train",
        "--test-data-path", "/root/reference/data/sample_data/test",
        "--batch-size", "4"]

CONFIGS = [
    ["--input-types", "vslt", "--output-type", "mortality",
     "--modality-inclusion", "train-missing_test-missing"],
    ["--input-types", "vslt", "--output-type", "intubation",
     "--modality-inclusion", "train-missing_test-missing"],
    ["--input-types", "vslt_img_txt", "--output-type", "mortality",
     "--modality-inclusion", "train-missing_test-missing"],
    ["--input-types", "vslt_img_txt", "--output-type", "intubation",
     "--modality-inclusion", "train-full_test-full"],
    ["--input-types", "vslt_img_txt", "--output-type", "vasso",
     "--modality-inclusion", "train-missing_test-missing",
     "--missing-exhaustive", "1"],
    ["--input-types", "vslt_img", "--output-type", "cpr",
     "--modality-inclusion", "train-full_test-full",
     "--fullmodal-definition", "img1"],
]


@pytest.fixture()
def ref_sandbox(tmp_path):
    """cwd layout the reference code expects (it is already tmp_path via
    the autouse chdir fixture)."""
    import h5py
    if not os.path.exists("builder"):
        os.symlink("/root/reference/builder", "builder")
    os.makedirs("data/testIndexes", exist_ok=True)
    h5 = "data/mimic4_embeddings.h5"
    if not os.path.exists(h5):
        with h5py.File(h5, "w") as f:
            g = f.create_group("found down")
            g.create_dataset("embedding", data=np.zeros((7, 768), np.float32))
    return str(tmp_path)


def _clear_cache():
    for f in glob.glob("data/testIndexes/*"):
        os.remove(f)


@pytest.mark.parametrize("extra", CONFIGS, ids=lambda c: " ".join(c[1::2]))
def test_train_index_matches_reference(extra, ref_sandbox):
    argv = BASE + extra
    ref = import_reference(argv)
    from builder.utils.utils import patient_wise_ordering
    pd, kl = patient_wise_ordering(ref["args"])
    train_list = sorted(p for k in kl[0] for p in pd[k])
    cls = (ref["dataset_new"].Onetime_Outbreak_Training_Dataset
           if ref["args"].output_type == "mortality"
           else ref["dataset_new"].Multiple_Outbreaks_Training_Dataset)
    with contextlib.redirect_stdout(io.StringIO()):
        ds = cls(ref["args"], data=train_list, data_type="training dataset")
    ref_rows = [(d[0].split("/")[-1], tuple(d[1]), d[4], t)
                for d, t in zip(ds._data_list, ds._type_list)]

    cfg = parse_config(argv).replace(dir_root="/root/reference")
    mine = _build_train_index(cfg, train_list)
    my_rows = [(s.pkl_path.split("/")[-1], tuple(s.keys), s.target, t)
               for s, t in zip(mine.samples, mine.type_list)]
    assert my_rows == ref_rows


@pytest.mark.parametrize("extra", CONFIGS[:3], ids=lambda c: " ".join(c[1::2]))
def test_eval_index_matches_reference_structurally(extra, ref_sandbox):
    """Eval keys are random.sample-dependent (global RNG in the reference);
    parity is structural: same multiset of (stay, target, type-code)."""
    from collections import Counter
    argv = BASE + extra
    ref = import_reference(argv)
    from builder.utils.utils import search_walk
    test_list = sorted(search_walk(
        {"path": ref["args"].test_data_path, "extension": ".pkl"}))
    cls = (ref["dataset_new"].Onetime_Outbreak_Test_Dataset
           if ref["args"].output_type == "mortality"
           else ref["dataset_new"].Multiple_Outbreaks_Test_Dataset)
    _clear_cache()
    with contextlib.redirect_stdout(io.StringIO()):
        ds = cls(ref["args"], data=test_list, data_type="test dataset")
    ref_counts = Counter((d[0].split("/")[-1], d[4], t)
                         for d, t in zip(ds._data_list, ds._type_list))

    _clear_cache()
    cfg = parse_config(argv).replace(dir_root="/root/reference")
    mine = build_eval_index(cfg, test_list, "test")
    my_counts = Counter((s.pkl_path.split("/")[-1], s.target, t)
                        for s, t in zip(mine.samples, mine.type_list))
    assert my_counts == ref_counts


def test_txt1_stay_not_in_txtdict_dropped_like_reference(tmp_path):
    """Missing branch, txt1 stay whose (pat_id, chid) is NOT in the token
    dict: the reference DROPS the stay (dataset_new.py:306-307), while a
    present-but-empty entry only rewrites the name to txt0 (:308-309).
    Token files are synthesized here so both cases actually fire (the
    checked-in reference token files cover every sample stay, so the
    golden configs above never hit the drop)."""
    import pickle as pkl

    td = "builder/data/text/textDataset"
    os.makedirs(td, exist_ok=True)
    os.makedirs("data/testIndexes", exist_ok=True)
    import h5py
    with h5py.File("data/mimic4_embeddings.h5", "w") as f:
        f.create_group("found down").create_dataset(
            "embedding", data=np.zeros((7, 768), np.float32))

    train_dir = "/root/reference/data/sample_data/train"
    txt1 = sorted(os.path.basename(p) for p in glob.glob(f"{train_dir}/*_txt1_*"))
    assert len(txt1) >= 3
    dropped, emptied = txt1[0], txt1[1]

    def key_of(name):
        raw = pkl.load(open(os.path.join(train_dir, name), "rb"))
        return int(raw["pat_id"]), int(raw["chid"])

    lines = []
    for name in txt1:
        p, c = key_of(name)
        if name == dropped:
            continue                       # key absent -> reference drops
        toks = "" if name == emptied else "5 6 7"
        lines.append(f"{p} {c} /{toks}/ 0 -1")
    for split in ("train", "test"):
        with open(f"{td}/mimic_icu_{split}_bert_textDataset.txt", "w") as f:
            f.write("\n".join(lines) + "\n")

    argv = BASE + ["--input-types", "vslt_img_txt", "--output-type",
                   "intubation", "--modality-inclusion",
                   "train-missing_test-missing"]
    ref = import_reference(argv)
    from builder.utils.utils import patient_wise_ordering
    pd, kl = patient_wise_ordering(ref["args"])
    train_list = sorted(p for k in kl[0] for p in pd[k])
    cls = ref["dataset_new"].Multiple_Outbreaks_Training_Dataset
    with contextlib.redirect_stdout(io.StringIO()):
        ds = cls(ref["args"], data=train_list, data_type="training dataset")
    ref_rows = [(d[0].split("/")[-1], tuple(d[1]), d[4], t)
                for d, t in zip(ds._data_list, ds._type_list)]

    cfg = parse_config(argv).replace(dir_root=str(tmp_path))
    mine = _build_train_index(cfg, train_list)
    my_rows = [(s.pkl_path.split("/")[-1], tuple(s.keys), s.target, t)
               for s, t in zip(mine.samples, mine.type_list)]
    assert my_rows == ref_rows
    assert all(r[0] != dropped for r in my_rows), "not-in-dict stay must drop"
    assert any(r[0] == emptied for r in my_rows), "empty-token stay must stay"


def test_no_token_files_keeps_stays_lenient(tmp_path):
    """With NO token file under dir_root the reference cannot run at all
    (txtDictLoad raises FileNotFoundError), so the strict drop semantics
    are demoted to the txt1->txt0 rewrite: stays are kept with text
    treated missing instead of the index silently emptying
    (indexer.load_stay txt_strict)."""
    train_dir = "/root/reference/data/sample_data/train"
    train_list = sorted(glob.glob(f"{train_dir}/*.pkl"))
    argv = BASE + ["--input-types", "vslt_img_txt", "--output-type",
                   "intubation", "--modality-inclusion",
                   "train-missing_test-missing"]
    empty_root = tmp_path / "no_tokens_here"
    empty_root.mkdir()
    cfg = parse_config(argv).replace(dir_root=str(empty_root))
    mine = _build_train_index(cfg, train_list)
    names = {s.pkl_path.split("/")[-1] for s in mine.samples}
    assert any("_txt1_" in n for n in names), "txt1 stays must survive"
    assert all("txt1" not in s.file_name for s in mine.samples
               if "_txt1_" in s.pkl_path), "kept stays must be txt0-rewritten"

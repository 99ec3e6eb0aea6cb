"""Golden tests for tools/build_text_datasets.py against the reference's
emitted file format (textDatasetBuild.py:51-53 format comment + the word/
character emit branches :56-200, vocabBuild.py first-seen vocab order)."""
import os
import pickle
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.build_text_datasets import main as build


def _write_pkl(d, path, rec):
    with open(os.path.join(d, path), "wb") as f:
        pickle.dump(rec, f)


@pytest.fixture()
def corpus(tmp_path):
    src = tmp_path / "pkls"
    src.mkdir()
    # note with a broke char ('[') and a repeated word; labels mixing
    # *_inputs arrays (reference per-hour hot vectors) and *_time floats
    _write_pkl(str(src), "100_1_txt1_img0.pkl", {
        "pat_id": "100", "chid": "1",
        "txt_input": ["pt stable [ on vent pt"],
        "death_yn": 1, "death_time": 7.9,
        "vasso_yn": 1, "vasso_inputs": [0, 0, 1, 0],
        "cpr_yn": 0, "cpr_inputs": [0, 0, 0, 0],
        "intubation_yn": 1, "intubation_time": [(12.5, 15.0)],
    })
    _write_pkl(str(src), "200_2_txt1_img1.pkl", {
        "pat_id": "200", "chid": "2",
        "txt_input": ["on vent sedated"],
        "death_yn": 0, "death_time": None,
        "vasso_yn": 0, "cpr_yn": 0, "intubation_yn": 0,
    })
    # txt0 files are skipped by the reference builder
    _write_pkl(str(src), "300_3_txt0_img1.pkl", {
        "pat_id": "300", "chid": "3", "txt_input": [""],
        "death_yn": 0, "vasso_yn": 0, "cpr_yn": 0, "intubation_yn": 0,
    })
    return str(src)


def test_word_emit_matches_reference_format(corpus, tmp_path):
    out = str(tmp_path / "td")
    build(["--src", corpus, "--out-dir", out, "--split", "train",
           "--tokenization", "word", "--dataset-name", "mimic_icu"])
    lines = open(os.path.join(
        out, "mimic_icu_train_word_textDataset.txt")).read().splitlines()
    # first-seen vocab over the cleaned corpus ('[' -> space, no lowercase):
    # pt=0 stable=1 on=2 vent=3 sedated=4 ; repeated 'pt' reuses id 0
    # labels: death 1 floor(7.9)=7; vasso first-hot idx 2; cpr 0 -1;
    # intubation from *_time list -> floor(12.5)=12
    assert lines[0] == "100 1 /0 1 2 3 0/ 1 7 1 2 0 -1 1 12"
    assert lines[1] == "200 2 /2 3 4/ 0 -1 0 -1 0 -1 0 -1"
    assert len(lines) == 2, "txt0 stays must be skipped"

    vocab = dict(l.split() for l in open(
        os.path.join(out, "mimic_icu_vocab.txt")).read().splitlines())
    assert vocab == {"pt": "0", "stable": "1", "on": "2", "vent": "3",
                     "sedated": "4"}


def test_emitted_file_parses_with_runtime_consumer(corpus, tmp_path):
    """load_txt_dict (the reference txtDictLoad contract) must read the
    labeled lines: split('/')[1] is the token span."""
    out = str(tmp_path / "td")
    build(["--src", corpus, "--out-dir", out, "--split", "train",
           "--tokenization", "word", "--dataset-name", "mimic_icu"])
    path = os.path.join(out, "mimic_icu_train_word_textDataset.txt")
    toks = {}
    with open(path) as f:
        for line in f:
            fields = line.strip().split("/")
            pat, chid = fields[0].split()
            toks[(int(pat), int(chid))] = [int(x) for x in fields[1].split()]
    assert toks[(100, 1)] == [0, 1, 2, 3, 0]
    assert toks[(200, 2)] == [2, 3, 4]


def test_character_emit_and_vocab_roundtrip(corpus, tmp_path):
    out = str(tmp_path / "td")
    build(["--src", corpus, "--out-dir", out, "--split", "train",
           "--tokenization", "character", "--dataset-name", "mimic_icu"])
    dataset = os.path.join(out, "mimic_icu_train_character_textDataset.txt")
    first = open(dataset).read().splitlines()[0]
    toks = first.split("/")[1].split()
    # 'pt stable [ on vent pt' cleaned -> 'pt stable   on vent pt'
    # first-seen letters: p=0 t=1 ' '=2 s=3 a=4 b=5 l=6 e=7 o=8 n=9 v=10
    assert toks[:4] == ["0", "1", "2", "3"]
    # re-tokenizing with the emitted letters file reproduces the dataset
    out2 = str(tmp_path / "td2")
    build(["--src", corpus, "--out-dir", out2, "--split", "train",
           "--tokenization", "character", "--dataset-name", "mimic_icu",
           "--vocab-file", os.path.join(out, "mimic_icu_letters.txt")])
    assert (open(dataset).read()
            == open(os.path.join(
                out2, "mimic_icu_train_character_textDataset.txt")).read())


def test_bpe_obj_requires_bpe_package(corpus, tmp_path):
    """Reference textDatasetEncoder/*.obj pickles need the third-party
    'bpe' package; without it the tool must fail with a clear message
    (documented break), not a bare unpickling error."""
    obj = tmp_path / "enc.obj"
    obj.write_bytes(b"\x80\x04.")
    try:
        import bpe  # noqa: F401
        pytest.skip("bpe package present; break does not apply")
    except ImportError:
        pass
    with pytest.raises(SystemExit, match="bpe"):
        build(["--src", corpus, "--out-dir", str(tmp_path / "td"),
               "--tokenization", "bpe", "--bpe-encoder", str(obj)])

"""Offline clinical-note tokenization: emit the textDataset token files,
vocab/letter lists, and the BioBERT embedding h5 (reference
builder/data/text/{vocabBuild,textDatasetBuild}.py, ~5.7k LoC of
per-tokenizer emitters).

Line format matches the reference's textDataset files byte-for-byte
(textDatasetBuild.py:51-53 comment + word-branch emit :84-145):

    {pat} {chid} /{tok tok ...}/ {death_yn} {death_time} {vasso_yn}
    {vasso_time} {cpr_yn} {cpr_time} {intubation_yn} {intubation_time}

with times -1 when the event is not positive, death_time floor()ed, and
event times taken from the first hot index of {task}_inputs when present
(else the pkl's {task}_time). Reference tokenizer semantics preserved:
broke-character set replaced by spaces, NO lowercasing, vocab ids assigned
in first-seen corpus order starting at 0, OOV -> 0 (the reference's own
quirk: OOV collides with vocab id 0).

Four tokenizers match the --txt-tokenization choices:
  word       whitespace vocab built from the corpus (vocabBuild.py)
  character  per-character ids (vocabBuild.py letters)
  bpe        a reference-pickled bpe.Encoder (.obj) via --bpe-encoder, or
             a corpus-learned greedy BPE fallback
  bert       WordPiece via transformers AutoTokenizer (textDatasetBuild.py:15)

BioBERT embeddings (--emit-biobert) require the transformers model weights
locally (zero-egress environments must pre-stage them); each note text maps
to its token-level hidden states [L, 768] keyed by the raw text, matching
the h5 contract (dataset_new.py:746).

Input: a jsonl/tsv of (pat_id, chid, note_text) or a directory of stay pkls
with txt_input.
"""
from __future__ import annotations

import argparse
import collections
import json
import math
import os
import pickle
import sys
from typing import Dict, Iterable, List, Optional, Tuple

UNK = 0   # reference OOV id (collides with the first vocab entry — quirk)

# textDatasetBuild.py:73 — characters replaced by spaces before tokenizing
BROKE_CHARS = {'<', '：', '@', '有', 'ⅱ', '^', '#', '\x9d', '/', '[', ')',
               ',', '  '}


def clean(text: str) -> str:
    for ch in BROKE_CHARS:
        text = text.replace(ch, " ")
    return text


def iter_notes(src: str) -> Iterable[Tuple[str, str, str, Optional[dict]]]:
    """Yields (pat_id, chid, text, labels-dict-or-None)."""
    if os.path.isdir(src):
        for fn in sorted(os.listdir(src)):
            if not fn.endswith(".pkl") or "txt0" in fn:
                continue
            with open(os.path.join(src, fn), "rb") as f:
                rec = pickle.load(f)
            txt = rec.get("txt_input") or [""]
            txt = txt[0] if isinstance(txt, list) else txt
            if txt.strip():
                yield str(rec["pat_id"]), str(rec["chid"]), txt, rec
    else:
        with open(src) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if src.endswith(".jsonl"):
                    d = json.loads(line)
                    yield str(d["pat_id"]), str(d["chid"]), d["text"], None
                else:
                    pat, chid, text = line.split("\t", 2)
                    yield pat, chid, text, None


def build_word_vocab(notes) -> Dict[str, int]:
    """First-seen order, ids from 0, no lowercasing (vocabBuild.py:44-56)."""
    vocab: Dict[str, int] = {}
    for _p, _c, text, _r in notes:
        for word in clean(text).split():
            if word not in vocab:
                vocab[word] = len(vocab)
    return vocab


def build_letter_vocab(notes) -> Dict[str, int]:
    """First-seen letters (vocabBuild.py:60-79)."""
    vocab: Dict[str, int] = {}
    for _p, _c, text, _r in notes:
        for ch in clean(text):
            if ch not in vocab:
                vocab[ch] = len(vocab)
    return vocab


def _event_fields(rec: Optional[dict]) -> str:
    """The 8 label fields (textDatasetBuild.py:92-145): death first, then
    vasso, cpr, intubation; -1 when not positive."""
    if rec is None:
        return "0 -1 0 -1 0 -1 0 -1"

    def first_hot(task: str):
        inputs = rec.get(f"{task}_inputs")
        if inputs is not None:
            for i, x in enumerate(inputs):
                if x == 1:
                    return 1, i
            return rec.get(f"{task}_yn", 0), -1
        t = rec.get(f"{task}_time")
        if isinstance(t, list) and t:
            t = t[0][0] if isinstance(t[0], (list, tuple)) else t[0]
        yn = rec.get(f"{task}_yn", 0)
        if yn and isinstance(t, (int, float)):
            return yn, int(math.floor(float(t)))
        return yn, -1

    death_yn = rec.get("death_yn", 0)
    if death_yn == 1:
        try:
            death_time = int(math.floor(float(rec["death_time"])))
        except (TypeError, ValueError):
            death_time = -1
    else:
        death_time = -1
    parts = [str(death_yn), str(death_time)]
    for task in ("vasso", "cpr", "intubation"):
        yn, t = first_hot(task)
        parts += [str(yn), str(t if yn == 1 and t >= 0 else -1)]
    return " ".join(parts)


def tokenize(kind: str, text: str, vocab, bert_tok) -> List[int]:
    if kind == "word":
        return [vocab.get(w, UNK) for w in clean(text).split()]
    if kind == "character":
        return [vocab.get(ch, UNK) for ch in clean(text)]
    if kind == "bpe":
        return vocab.encode(text)
    return bert_tok.encode(text, add_special_tokens=False)


class GreedyBPE:
    """Minimal corpus-learned BPE — the fallback when no reference
    textDatasetEncoder/*.obj is supplied (those pickles require the
    third-party ``bpe`` package to unpickle; see load_bpe_encoder)."""

    def __init__(self, merges: int = 2000):
        self.merges_n = merges
        self.merges: List[Tuple[str, str]] = []
        self.vocab: Dict[str, int] = {}

    def fit(self, texts: Iterable[str]):
        words = collections.Counter()
        for t in texts:
            words.update(t.lower().split())
        seqs = {w: tuple(w) for w in words}
        for _ in range(self.merges_n):
            pairs = collections.Counter()
            for w, seq in seqs.items():
                for a, b in zip(seq, seq[1:]):
                    pairs[(a, b)] += words[w]
            if not pairs:
                break
            best = pairs.most_common(1)[0][0]
            self.merges.append(best)
            merged = best[0] + best[1]
            new_seqs = {}
            for w, seq in seqs.items():
                out, i = [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                new_seqs[w] = tuple(out)
            seqs = new_seqs
        units = sorted({u for seq in seqs.values() for u in seq})
        self.vocab = {u: i + 4 for i, u in enumerate(units)}
        return self

    def encode(self, text: str) -> List[int]:
        ids = []
        for w in text.lower().split():
            seq = list(w)
            for a, b in self.merges:
                i = 0
                while i < len(seq) - 1:
                    if seq[i] == a and seq[i + 1] == b:
                        seq[i:i + 2] = [a + b]
                    else:
                        i += 1
            ids.extend(self.vocab.get(u, UNK) for u in seq)
        return ids


def load_bpe_encoder(path: str):
    """Unpickle a reference textDatasetEncoder/*.obj (a third-party
    bpe.Encoder instance). Requires the ``bpe`` package the reference used;
    without it the pickle cannot be reconstructed — documented break, use
    the GreedyBPE fallback (omit --bpe-encoder) instead."""
    try:
        import bpe  # noqa: F401  (needed for unpickling)
    except ImportError as e:
        raise SystemExit(
            f"--bpe-encoder {path} needs the third-party 'bpe' package the "
            "reference pickled its Encoder with; it is not installed here. "
            "Omit --bpe-encoder to learn a corpus BPE instead.") from e
    with open(path, "rb") as f:
        return pickle.load(f)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--split", default="train", choices=["train", "test"])
    p.add_argument("--tokenization", default="bert",
                   choices=["word", "character", "bpe", "bert"])
    p.add_argument("--dataset-name", default="mimic_icu")
    p.add_argument("--vocab-file", default=None,
                   help="existing vocabList file to tokenize with (word/"
                        "character); default builds one from the corpus "
                        "and writes it next to the dataset file")
    p.add_argument("--bpe-encoder", default=None,
                   help="reference textDatasetEncoder/*.obj pickle")
    p.add_argument("--emit-biobert", default=None,
                   help="write note-text -> [L,768] embeddings to this h5 "
                        "(requires local biobert weights)")
    p.add_argument("--biobert-model", default="dmis-lab/biobert-v1.1")
    args = p.parse_args(argv)

    notes = list(iter_notes(args.src))
    vocab = None
    bert_tok = None
    os.makedirs(args.out_dir, exist_ok=True)
    if args.tokenization in ("word", "character"):
        if args.vocab_file:
            vocab = {}
            with open(args.vocab_file) as f:
                for line in f:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    if args.tokenization == "character":
                        # letters file: "<char> <id>"; char may be a space
                        vocab[line[0]] = int(line.split()[-1])
                    else:
                        w, i = line.split()
                        vocab[w] = int(i)
        else:
            vocab = (build_word_vocab(notes) if args.tokenization == "word"
                     else build_letter_vocab(notes))
            suffix = "_vocab.txt" if args.tokenization == "word" \
                else "_letters.txt"
            vpath = os.path.join(args.out_dir,
                                 f"{args.dataset_name}{suffix}")
            with open(vpath, "w") as f:
                for tok, i in vocab.items():
                    f.write(f"{tok} {i}\n")
            print(f"{len(vocab)} entries -> {vpath}")
    elif args.tokenization == "bpe":
        if args.bpe_encoder:
            vocab = load_bpe_encoder(args.bpe_encoder)
        else:
            vocab = GreedyBPE().fit(t for _p, _c, t, _r in notes)
    else:
        from transformers import AutoTokenizer
        bert_tok = AutoTokenizer.from_pretrained(args.biobert_model)

    out_path = os.path.join(
        args.out_dir,
        f"{args.dataset_name}_{args.split}_{args.tokenization}_textDataset.txt")
    with open(out_path, "w") as f:
        for pat, chid, text, rec in notes:
            ids = tokenize(args.tokenization, text, vocab, bert_tok)
            f.write(f"{pat} {chid} /{' '.join(map(str, ids))}/ "
                    f"{_event_fields(rec)}\n")
    print(f"{len(notes)} notes -> {out_path}")

    if args.emit_biobert:
        import h5py
        import torch
        from transformers import AutoModel, AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.biobert_model)
        model = AutoModel.from_pretrained(args.biobert_model).eval()
        with h5py.File(args.emit_biobert, "w") as h5:
            seen = set()
            for _p, _c, text, _r in notes:
                if text in seen:
                    continue
                seen.add(text)
                with torch.no_grad():
                    enc = tok(text, return_tensors="pt", truncation=True,
                              max_length=128)
                    hidden = model(**enc).last_hidden_state[0].numpy()
                g = h5.create_group(text)
                g.create_dataset("embedding", data=hidden)
        print(f"{len(seen)} embeddings -> {args.emit_biobert}")


if __name__ == "__main__":
    main()

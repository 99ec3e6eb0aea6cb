"""Offline clinical-note tokenization: emit the textDataset token files and
the BioBERT embedding h5 (reference builder/data/text/{vocabBuild,
textDatasetBuild}.py, ~5.7k LoC of per-tokenizer emitters).

Four tokenizers match the --txt-tokenization choices:
  word       whitespace vocab built from the corpus (vocabBuild.py)
  character  per-character ids
  bpe        byte-pair encoding (greedy merges learned on the corpus;
             the reference pickles a third-party bpe.Encoder)
  bert       WordPiece via transformers AutoTokenizer (textDatasetBuild.py:15)

BioBERT embeddings (--emit-biobert) require the transformers model weights
locally (zero-egress environments must pre-stage them); each note text maps
to its token-level hidden states [L, 768] keyed by the raw text, matching
the h5 contract (dataset_new.py:746).

Input: a jsonl/tsv of (pat_id, chid, note_text) or a directory of stay pkls
with txt_input. Output lines: "patid chid / tok tok ..." per note.
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import pickle
import sys
from typing import Dict, Iterable, List, Tuple

UNK, PAD, BOS, EOS = 0, 1, 2, 3
SPECIAL = 4


def iter_notes(src: str) -> Iterable[Tuple[int, int, str]]:
    if os.path.isdir(src):
        for fn in sorted(os.listdir(src)):
            if not fn.endswith(".pkl"):
                continue
            with open(os.path.join(src, fn), "rb") as f:
                rec = pickle.load(f)
            txt = (rec.get("txt_input") or [""])[0].strip()
            if txt:
                yield int(rec["pat_id"]), int(rec["chid"]), txt
    else:
        with open(src) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if src.endswith(".jsonl"):
                    d = json.loads(line)
                    yield int(d["pat_id"]), int(d["chid"]), d["text"]
                else:
                    pat, chid, text = line.split("\t", 2)
                    yield int(pat), int(chid), text


def build_word_vocab(notes, max_vocab: int = 30000) -> Dict[str, int]:
    counts = collections.Counter()
    for _p, _c, text in notes:
        counts.update(text.lower().split())
    vocab = {w: i + SPECIAL for i, (w, _n) in
             enumerate(counts.most_common(max_vocab - SPECIAL))}
    return vocab


def tokenize(kind: str, text: str, vocab, bert_tok) -> List[int]:
    if kind == "word":
        return [vocab.get(w, UNK) for w in text.lower().split()]
    if kind == "character":
        return [vocab.get(ch, UNK) for ch in text.lower()]
    if kind == "bpe":
        return vocab.encode(text)
    return bert_tok.encode(text, add_special_tokens=False)


class GreedyBPE:
    """Minimal corpus-learned BPE (stand-in for the reference's pickled
    third-party bpe.Encoder objects, textDatasetEncoder/*.obj)."""

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
        self.vocab = {u: i + SPECIAL for i, u in enumerate(units)}
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--split", default="train", choices=["train", "test"])
    p.add_argument("--tokenization", default="bert",
                   choices=["word", "character", "bpe", "bert"])
    p.add_argument("--dataset-name", default="mimic_icu")
    p.add_argument("--emit-biobert", default=None,
                   help="write note-text -> [L,768] embeddings to this h5 "
                        "(requires local biobert weights)")
    p.add_argument("--biobert-model", default="dmis-lab/biobert-v1.1")
    args = p.parse_args(argv)

    notes = list(iter_notes(args.src))
    vocab = None
    bert_tok = None
    if args.tokenization == "word":
        vocab = build_word_vocab(notes)
    elif args.tokenization == "character":
        chars = sorted({ch for _p, _c, t in notes for ch in t.lower()})
        vocab = {ch: i + SPECIAL for i, ch in enumerate(chars)}
    elif args.tokenization == "bpe":
        vocab = GreedyBPE().fit(t for _p, _c, t in notes)
    else:
        from transformers import AutoTokenizer
        bert_tok = AutoTokenizer.from_pretrained(args.biobert_model)

    os.makedirs(args.out_dir, exist_ok=True)
    out_path = os.path.join(
        args.out_dir,
        f"{args.dataset_name}_{args.split}_{args.tokenization}_textDataset.txt")
    with open(out_path, "w") as f:
        for pat, chid, text in notes:
            ids = tokenize(args.tokenization, text, vocab, bert_tok)
            f.write(f"{pat} {chid} / {' '.join(map(str, ids))}\n")
    print(f"{len(notes)} notes -> {out_path}")

    if args.emit_biobert:
        import h5py
        import torch
        from transformers import AutoModel, AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.biobert_model)
        model = AutoModel.from_pretrained(args.biobert_model).eval()
        with h5py.File(args.emit_biobert, "w") as h5:
            seen = set()
            for _p, _c, text in notes:
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

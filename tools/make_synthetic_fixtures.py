"""Generate a synthetic dataset with the full reference pkl schema
(SURVEY.md §2.2 'Per-stay pkl schema'), plus CXR JPEGs and a BioBERT
embedding h5 — everything the tri-modal path needs, without MIMIC access.

Usage:
  python tools/make_synthetic_fixtures.py --out /tmp/synth --n-train 24 \
      --n-test 8 [--seed 7]

Produces:
  {out}/train/*.pkl, {out}/test/*.pkl     per-stay records
  {out}/images/...jpg                     grayscale CXRs (aspect-ratio suffix)
  {out}/mimic4_embeddings.h5              note-text -> [L,768] embeddings
  {out}/textDataset/mimic_icu_{train,test}_bert_textDataset.txt
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from medical_tri_modal_pilot_tpu.constants import (FEATURE_MAX_MINS,
                                                   FEATURE_MINS,
                                                   VITALSIGN_LABTEST)

NOTES = [
    "found down", "shortness of breath", "chest pain radiating",
    "altered mental status", "fever and chills", "post surgical monitoring",
    "respiratory distress", "sepsis workup",
]


def make_stay(rng: np.random.Generator, pat_id: int, chid: int,
              seq_len: int, task_rates: dict, image_dir: str,
              rel_image_root: str, signal: float = 0.0):
    """``signal`` in [0, 1]: heart rate (feature 0) rises in the hours
    before each intubation event — 0 keeps vitals independent of outcomes
    (schema-only fixtures), 1 plants a window-local cue a model can learn
    from the TIE stream (tests/test_learning_sanity.py): positive windows
    (event within --prediction-range after the key) overlap the bump."""
    # hourly grid of 18 features in raw units, then normalized
    raw = FEATURE_MINS + FEATURE_MAX_MINS * rng.beta(4, 4, size=(seq_len, 18))
    mask = (rng.random((seq_len, 18)) < 0.45).astype(np.float64)
    mask[0] = 1.0

    def event(rate, multi=False):
        if rng.random() >= rate:
            return 0, None
        if multi:
            n = rng.integers(1, 3)
            times = sorted(float(rng.uniform(4, seq_len + 8)) for _ in range(n))
            return 1, [(t, t + float(rng.uniform(1, 5))) for t in times]
        return 1, float(rng.uniform(4, seq_len + 8))

    death_yn, death_time = event(task_rates.get("mortality", 0.3))
    vasso_yn, vasso_time = event(task_rates.get("vasso", 0.3), multi=True)
    intub_yn, intub_time = event(task_rates.get("intubation", 0.3), multi=True)
    cpr_yn, cpr_time = event(task_rates.get("cpr", 0.2), multi=True)

    if signal > 0.0 and intub_yn:
        # pre-event tachycardia: raise HR (observed every hour) across the
        # 8 hours before each intubation onset — inside the default 12 h
        # prediction range, so every positive window sees it
        for onset, _end in intub_time:
            lo = max(0, int(np.floor(onset)) - 8)
            hi = min(seq_len, int(np.ceil(onset)) + 1)
            if lo < hi:
                bump = signal * 0.35 * FEATURE_MAX_MINS[0]
                raw[lo:hi, 0] = np.minimum(
                    raw[lo:hi, 0] + bump,
                    FEATURE_MINS[0] + FEATURE_MAX_MINS[0])
                mask[lo:hi, 0] = 1.0

    # carry forward + delta (hours since last observation)
    data = raw.copy()
    delta = np.zeros_like(data)
    for t in range(1, seq_len):
        unobserved = mask[t] == 0
        data[t, unobserved] = data[t - 1, unobserved]
        delta[t] = (delta[t - 1] + 1) * unobserved
    norm = (data - FEATURE_MINS) / FEATURE_MAX_MINS

    # per-hour TIE event streams [time, normalized value, feature-id]
    data_in_time = []
    for t in range(seq_len):
        feats = np.where(mask[t] > 0)[0]
        if len(feats) == 0:
            data_in_time.append(None)
            continue
        times = t + np.sort(rng.random(len(feats)))
        rows = np.stack([times, norm[t, feats], feats.astype(np.float64)], 1)
        data_in_time.append(rows)

    possible_win_sizes = {
        k: list(range(3, min(k + 1, 24) + 1))
        for k in range(2, seq_len)
    }

    has_img = rng.random() < 0.7
    cxr_input = None
    if has_img:
        from PIL import Image
        cxr_input = []
        for i in range(rng.integers(1, 4)):
            t = float(rng.uniform(1, seq_len - 1))
            ar = float(rng.uniform(0.8, 1.2))
            name = f"p{pat_id}/s{chid}_{i}_aspect_ratio_{ar:.6f}.jpg"
            path = os.path.join(image_dir, name)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            h = 256
            w = int(h * ar)
            arr = (rng.random((h, w)) * 255).astype(np.uint8)
            # blobby structure so equalize/affine do something
            yy, xx = np.mgrid[0:h, 0:w]
            cx, cy = rng.uniform(0.3, 0.7) * w, rng.uniform(0.3, 0.7) * h
            blob = np.exp(-(((xx - cx) / (0.3 * w)) ** 2
                            + ((yy - cy) / (0.3 * h)) ** 2))
            arr = np.clip(arr * 0.4 + blob * 153, 0, 255).astype(np.uint8)
            Image.fromarray(arr, mode="L").save(path, quality=88)
            cxr_input.append([t, os.path.join(rel_image_root, name)])

    has_txt = rng.random() < 0.7
    txt_input = [NOTES[rng.integers(0, len(NOTES))]] if has_txt else [""]

    stay = {
        "pat_id": str(pat_id),
        "chid": str(chid),
        "age": float(rng.uniform(0.2, 0.95)),
        "gender": "M" if rng.random() < 0.55 else "F",
        "data": data,
        "mask": mask,
        "delta": delta,
        "data_in_time": data_in_time,
        "possibleWinSizes": possible_win_sizes,
        "death_yn": death_yn,
        "death_time": death_time if death_yn else "NOT_CONVERTED",
        "vasso_yn": vasso_yn, "vasso_time": vasso_time,
        "intubation_yn": intub_yn, "intubation_time": intub_time,
        "cpr_yn": cpr_yn, "cpr_time": cpr_time,
        "feature_order": list(VITALSIGN_LABTEST),
        "cxr_input": cxr_input,
        "cxr_yn": 1 if has_img else 0,
        "txt_input": txt_input,
        "txt_yn": 1 if has_txt else 0,
    }
    name = (f"{pat_id}_{chid}_txt{1 if has_txt else 0}"
            f"_img{1 if has_img else 0}.pkl")
    return name, stay


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-train", type=int, default=24)
    p.add_argument("--n-test", type=int, default=8)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--signal", type=float, default=0.0,
                   help="0 = outcomes independent of vitals (schema-only); "
                        ">0 = outcome rates shift with mean heart rate so "
                        "models can learn (learning-sanity regression)")
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    image_dir = os.path.join(args.out, "images")
    os.makedirs(image_dir, exist_ok=True)
    txt_lines = {"train": [], "test": []}

    for split, n in (("train", args.n_train), ("test", args.n_test)):
        split_dir = os.path.join(args.out, split)
        os.makedirs(split_dir, exist_ok=True)
        for i in range(n):
            pat_id = 10_000_000 + rng.integers(0, 9_000_000)
            chid = 20_000_000 + rng.integers(0, 9_000_000)
            seq_len = int(rng.integers(24, 96))
            name, stay = make_stay(rng, pat_id, chid, seq_len,
                                   {}, image_dir, "", signal=args.signal)
            with open(os.path.join(split_dir, name), "wb") as f:
                pickle.dump(stay, f, pickle.HIGHEST_PROTOCOL)
            if stay["txt_yn"]:
                toks = " ".join(str(rng.integers(4, 30000))
                                for _ in range(rng.integers(5, 60)))
                txt_lines[split].append(f"{pat_id} {chid} / {toks}")

    # BioBERT embedding h5 keyed by note text
    import h5py
    with h5py.File(os.path.join(args.out, "mimic4_embeddings.h5"), "w") as f:
        for note in NOTES:
            g = f.create_group(note)
            L = int(rng.integers(4, 128))
            g.create_dataset("embedding",
                             data=rng.normal(0, 1, (L, 768)).astype(np.float32))

    td = os.path.join(args.out, "builder", "data", "text", "textDataset")
    os.makedirs(td, exist_ok=True)
    for split in ("train", "test"):
        with open(os.path.join(
                td, f"mimic_icu_{split}_bert_textDataset.txt"), "w") as f:
            f.write("\n".join(txt_lines[split]) + "\n")
    print(f"synthetic dataset at {args.out}: "
          f"{args.n_train} train / {args.n_test} test stays")


if __name__ == "__main__":
    main()

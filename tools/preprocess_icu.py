"""Offline ICU tabular preprocessing: intermediate per-stay records ->
the training pkl schema (reference prepare_dataset/mimic4_ICU_preprocess.py
:1-437; consumed schema documented in SURVEY.md §2.2).

The reference stage transforms upstream-extracted per-stay dicts
({'inputs': [NUM_FEATURES, SEQ_LENGTH] with NaNs, event flags/times,
cxr/text attachments}) into the final record: carry-forward imputed hourly
grid, observation mask, time-since-last-observation deltas, leading-gap
trimming (initShiftLen), per-key feasible window sizes, per-hour TIE event
streams, and event times shifted by the trim. This implementation is
functionally equivalent, numpy-vectorized, and fanned out over a process
pool.

Input: a directory of pickled dicts with keys
  inputs [F, T] float (NaN = unobserved), death_yn, death_time,
  vasso_time/intubation_time/cpr_time (lists of (start, end) hours or None),
  pat_id, chid, age, gender, cxr_input, txt_input, window_first_idx_hr
Output: {pat_id}_{chid}_txt{0/1}_img{0/1}.pkl in the reference schema.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from medical_tri_modal_pilot_tpu.constants import (FEATURE_MEANS,
                                                   FEATURE_MINS,
                                                   FEATURE_MAX_MINS,
                                                   VITALSIGN_LABTEST)
from medical_tri_modal_pilot_tpu.utils.process_util import run_multi_process

MIN_WINDOW = 3
MAX_WINDOW = 24


def carry_forward(feature: np.ndarray) -> np.ndarray:
    """Forward-fill NaNs, then fall back to the population mean
    (mimic4_ICU_preprocess.py:123-137)."""
    out = feature.copy()
    for t in range(1, out.shape[0]):
        nan = np.isnan(out[t])
        out[t, nan] = out[t - 1, nan]
    still = np.isnan(out)
    out[still] = np.broadcast_to(FEATURE_MEANS, out.shape)[still]
    return out


def time_delta(mask: np.ndarray) -> np.ndarray:
    """Hours since last observation per feature
    (mimic4_ICU_preprocess.py:140-147)."""
    delta = np.zeros_like(mask)
    for t in range(1, mask.shape[0]):
        delta[t] = np.where(mask[t] == 0, delta[t - 1], 0.0) + 1.0
    return delta


def possible_window_sizes(mask: np.ndarray) -> dict:
    """{window-end key: [feasible lengths]} — a length is feasible when the
    window contains at least one observed vital-sign row per hour-range
    criterion (mimic4_ICU_preprocess.py:227-240). We use the reference's
    observable-step rule: >=5 of the 6 mandatory vitals present marks a
    step usable; a window [k-L+1, k] is feasible if its first and last
    steps are usable."""
    usable = mask[:, :6].sum(1) >= 5
    out = {}
    T = mask.shape[0]
    for key in range(MIN_WINDOW - 1, T):
        lengths = []
        for L in range(MIN_WINDOW, min(MAX_WINDOW, key + 1) + 1):
            start = key - L + 1
            if usable[start] and usable[key]:
                lengths.append(L)
        if lengths:
            out[key] = lengths
    return out


def build_data_in_time(feature: np.ndarray, mask: np.ndarray,
                       rng: np.random.Generator) -> list:
    """Per-hour TIE event arrays [time, normalized value, feature-id]
    matching the observed entries (schema verified on
    data/sample_data/train pkls: values pre-normalized, times fractional
    within the hour)."""
    norm = (feature - FEATURE_MINS) / FEATURE_MAX_MINS
    out = []
    for t in range(mask.shape[0]):
        feats = np.where(mask[t] > 0)[0]
        if len(feats) == 0:
            out.append(None)
            continue
        times = t + np.sort(rng.random(len(feats)))
        out.append(np.stack([times, norm[t, feats],
                             feats.astype(np.float64)], axis=1))
    return out


def process_stay(task):
    src_path, out_dir = task
    with open(src_path, "rb") as f:
        rec = pickle.load(f)
    feature = np.asarray(rec["inputs"], dtype=np.float64).T   # [T, F]
    mask = (~np.isnan(feature)).astype(np.float64)
    vs_miss = (mask[:, :6].sum(1) >= 5).astype(np.int64)
    feature = carry_forward(feature)
    delta = time_delta(mask)

    # trim the leading fully-unobservable gap (mimic4:213-216)
    usable_idx = np.where(vs_miss > 0)[0]
    if len(usable_idx) == 0:
        return None
    shift = int(usable_idx[0])
    feature, mask, delta = feature[shift:], mask[shift:], delta[shift:]
    if feature.shape[0] < MIN_WINDOW:
        return None

    rng = np.random.default_rng(abs(hash((rec["pat_id"], rec["chid"]))) % 2**32)
    final = {
        "pat_id": str(rec["pat_id"]),
        "chid": str(rec["chid"]),
        "age": float(rec.get("age", 0.5)),
        "gender": rec.get("gender", "F"),
        "data": feature,
        "mask": mask,
        "delta": delta,
        "data_in_time": build_data_in_time(feature, mask, rng),
        "vsMissSteps": vs_miss[shift:],
        "initShiftLen": np.int64(shift),
        "possibleWinSizes": possible_window_sizes(mask),
        "feature_order": list(VITALSIGN_LABTEST),
        "mean": dict(zip(VITALSIGN_LABTEST, FEATURE_MEANS)),
        "feature_mins": FEATURE_MINS.copy(),
        "feature_maxs": FEATURE_MINS + FEATURE_MAX_MINS,
        "window_first_idx_hr": np.int64(rec.get("window_first_idx_hr", 0) + shift),
    }

    # event targets shifted by the trim (mimic4:259-305)
    final["death_yn"] = int(rec.get("death_yn", 0))
    dt = rec.get("death_time")
    if final["death_yn"] and dt is not None:
        nt = float(dt) - shift
        if nt < 0:
            final["death_yn"], final["death_time"] = 0, "NOT_CONVERTED"
        else:
            final["death_time"] = nt
    else:
        final["death_time"] = "NOT_CONVERTED"
    for ev in ("vasso", "intubation", "cpr"):
        times = rec.get(f"{ev}_time")
        if times:
            shifted = [(float(s) - shift, float(e) - shift) for s, e in times
                       if float(s) - shift >= 0]
            final[f"{ev}_yn"] = 1 if shifted else 0
            final[f"{ev}_time"] = shifted or None
        else:
            final[f"{ev}_yn"] = 0
            final[f"{ev}_time"] = None

    cxr = rec.get("cxr_input")
    if cxr:
        cxr = [[float(t) - shift, p] for t, p in cxr if float(t) - shift >= 0]
    final["cxr_input"] = cxr or None
    final["cxr_yn"] = 1 if cxr else 0
    txt = rec.get("txt_input") or [""]
    final["txt_input"] = txt
    final["txt_yn"] = 1 if txt and txt[0].strip() else 0

    name = (f"{final['pat_id']}_{final['chid']}"
            f"_txt{final['txt_yn']}_img{final['cxr_yn']}.pkl")
    with open(os.path.join(out_dir, name), "wb") as f:
        pickle.dump(final, f, pickle.HIGHEST_PROTOCOL)
    return name


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="dir of intermediate pkls")
    p.add_argument("--dst", required=True)
    p.add_argument("--workers", type=int, default=30)
    args = p.parse_args(argv)
    os.makedirs(args.dst, exist_ok=True)
    tasks = [(os.path.join(args.src, f), args.dst)
             for f in sorted(os.listdir(args.src)) if f.endswith(".pkl")]
    results = run_multi_process(process_stay, tasks, args.workers)
    ok = sum(1 for r in results if r)
    print(f"{ok}/{len(tasks)} stays written to {args.dst}")


if __name__ == "__main__":
    main()

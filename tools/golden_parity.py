"""Run-level golden parity harness: the reference's OWN training+test flow
vs this framework, on the same data, same eval indices, same weights.

The BASELINE.json north star is AUROC parity (±0.002) with the PyTorch
reference on data/sample_data. 5-sample AUROC is degenerate, so the robust
form measured here is *per-sample eval-probability parity of the reference's
best checkpoint*:

  phase `ref`  — executes /root/reference/2_train.py unmodified (exec, CPU
      torch via tests/ref_shim.py) in a sandbox: full train -> val ->
      best-ckpt save -> test flow (2_train.py:298-384). Hooks the reference
      Evaluator (builder/utils/metrics.py:58-62) to record every
      (y_true, sigmoid prob) its test loop produces, and records each test
      sample's identity (pkl, selected key, window) from the dataset's
      _data_list.
  phase `ours` — converts the saved best checkpoint with
      models/convert_ref.py, evaluates OUR data pipeline + model on the
      IDENTICAL eval indices (the ./data/testIndexes cache written by the
      reference run pins the RNG-chosen keys for both sides), and compares
      per-sample probabilities plus AUROC/AUPRC/F1 from each side's own
      metric stack.

sample_data ships no jpegs / BioBERT h5; `_synthesize_assets` renders a
deterministic jpeg for every cxr_input path and an embedding for every
txt_input note so both frameworks read identical bytes.

Usage:
  python tools/golden_parity.py                      # full matrix
  python tools/golden_parity.py --configs vslt vslt_txt
  python tools/golden_parity.py --workdir /tmp/golden_parity
Writes GOLDEN_PARITY.json at the repo root (one row per config).
"""
from __future__ import annotations

import json
import os
import pickle
import zlib
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLE = "/root/reference/data/sample_data"
REF_DRIVER = "/root/reference/2_train.py"

# BASELINE.json configs 1, 2, 4, 5 (config 3, test-fullmodal vslt_img, has a
# single eligible sample — excluded as degenerate, BASELINE_MEASURED.md),
# plus `mortality` covering the Onetime dataset family end-to-end
# (data_preprocess.py:55-64 routes mortality -> Onetime_Outbreak_*).
#
# No aux-rmse config is possible: with "rmse" in --auxiliary-loss-type the
# reference makes final_target a TUPLE (trainer.py:50) while every live loss
# line is the plain criterion(output, final_target) (:177 train, :238 eval)
# — the rmse branches are commented out — so every reference rmse run
# crashes in torch. Intent-level rmse parity is pinned by
# tests/test_rmse_metric.py instead.
CONFIGS = {
    "vslt": dict(
        epochs=6,
        argv=["--input-types", "vslt", "--output-type", "intubation",
              "--model", "unimodal_transformer", "--vslt-type", "TIE",
              "--modality-inclusion", "train-missing_test-missing",
              "--transformer-num-layers", "2", "--transformer-dim", "64",
              "--transformer-num-head", "4"]),
    # Onetime (mortality) family: exercises the Onetime eval dataset
    # machinery (dataset_new.py:790-1547) end-to-end, not just the
    # index-level goldens of tests/test_data_parity.py
    "mortality": dict(
        epochs=4,
        augment_positive_val=True,
        # 0.3 leaves the Onetime val loader with <2 eligible samples
        # (drop_last -> zero batches -> the reference divides by zero
        # in log_val_loss); 0.5 admits enough prefix patients
        val_ratio=0.5,
        argv=["--input-types", "vslt", "--output-type", "mortality",
              "--model", "unimodal_transformer", "--vslt-type", "TIE",
              "--modality-inclusion", "train-missing_test-missing",
              "--transformer-num-layers", "2", "--transformer-dim", "64",
              "--transformer-num-head", "4"]),
    # tri_mbt_vsltcls cannot run vslt_txt in the reference (its forward
    # feeds 3 enc streams into an n_modality=2 fusion and IndexErrors at
    # mbt_encoder.py:699); the live bimodal vslt_txt model is
    # bi_vslttxt_mbt_v1. --fullmodal-definition txt1 is likewise dead in
    # the reference trainer (its 2-row sample table with the trimodal
    # [4:] slice leaves missing_num two samples short, trainer.py:50-77),
    # so the config relies on the vslt_txt missing_num remap instead.
    "vslt_txt": dict(
        epochs=4,
        argv=["--input-types", "vslt_txt", "--output-type", "intubation",
              "--model", "bi_vslttxt_mbt_v1", "--vslt-type", "TIE",
              "--modality-inclusion", "train-missing_test-missing",
              "--imgtxt-time", "1",
              "--transformer-num-layers", "2", "--transformer-dim", "256",
              "--transformer-num-head", "4"]),
    "trimodal_missing": dict(
        epochs=2,
        argv=["--input-types", "vslt_img_txt", "--output-type", "intubation",
              "--model", "tri_mbt_vsltcls", "--vslt-type", "TIE",
              "--modality-inclusion", "train-missing_test-missing",
              "--imgtxt-time", "1", "--img-model-type", "swin",
              "--transformer-num-layers", "2", "--transformer-dim", "256",
              "--transformer-num-head", "4"]),
    "trimodal_multiimages": dict(
        epochs=2,
        argv=["--input-types", "vslt_img_txt", "--output-type", "intubation",
              "--model", "tri_mbt_vsltcls", "--vslt-type", "TIE",
              "--modality-inclusion", "train-missing_test-missing",
              "--multiimages", "1", "--realtime", "1", "--TIE-len", "1000",
              "--imgtxt-time", "1", "--img-model-type", "swin",
              "--transformer-num-layers", "6", "--transformer-dim", "256",
              "--transformer-num-head", "4"]),
}


# ---------------------------------------------------------------------------
# sandbox + synthetic assets
# ---------------------------------------------------------------------------

def _synthesize_assets(sandbox: str) -> None:
    """Deterministic jpegs for every cxr_input path and a BioBERT h5 entry
    for every txt_input note across sample_data (both splits)."""
    import h5py
    import numpy as np
    from PIL import Image

    img_root = os.path.join(sandbox, "images")
    notes = set()
    for split in ("train", "test"):
        d = os.path.join(SAMPLE, split)
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".pkl"):
                continue
            with open(os.path.join(d, fn), "rb") as f:
                raw = pickle.load(f)
            for _t, rel in (raw.get("cxr_input") or []):
                out = os.path.join(img_root, rel)
                if os.path.exists(out):
                    continue
                os.makedirs(os.path.dirname(out), exist_ok=True)
                # zlib.crc32, not hash(): str hashing is
                # PYTHONHASHSEED-randomized per process, which would
                # make the generated assets (and therefore the trained
                # weights and GOLDEN_PARITY.json) unreproducible
                rng = np.random.default_rng(
                    zlib.crc32(rel.encode()) & 0xFFFFFFFF)
                try:
                    ar = float(rel.rsplit("aspect_ratio_", 1)[1]
                               .rsplit(".jpg", 1)[0])
                except (IndexError, ValueError):
                    ar = 1.0
                h = 320
                w = max(32, int(round(h * ar)))
                yy, xx = np.mgrid[0:h, 0:w]
                base = (120 + 60 * np.sin(yy / 37.0) * np.cos(xx / 29.0)
                        + rng.normal(0, 25, (h, w)))
                Image.fromarray(
                    np.clip(base, 0, 255).astype(np.uint8), "L").save(out)
            txt = raw.get("txt_input")
            if raw.get("txt_yn") and txt and str(txt[0]).strip():
                notes.add(str(txt[0]).strip())
    # The reference restricts --biobert-path to the literal choice
    # "./data/mimic4_embeddings.h5" (control/config.py:88); both phases run
    # with cwd=sandbox so the relative default resolves here.
    h5_path = os.path.join(sandbox, "data", "mimic4_embeddings.h5")
    if not os.path.exists(h5_path):
        with h5py.File(h5_path, "w") as f:
            for note in sorted(notes):
                rng = np.random.default_rng(
                    zlib.crc32(note.encode()) & 0xFFFFFFFF)
                L = int(rng.integers(4, 127))
                f.create_group(note).create_dataset(
                    "embedding",
                    data=rng.normal(0, 1, (L, 768)).astype(np.float32))


def _make_sandbox(workdir: str, name: str) -> str:
    sandbox = os.path.join(workdir, name)
    os.makedirs(os.path.join(sandbox, "data", "testIndexes"), exist_ok=True)
    link = os.path.join(sandbox, "builder")
    if not os.path.exists(link):
        os.symlink("/root/reference/builder", link)
    _synthesize_assets(sandbox)
    return sandbox


def _augment_train_dir(sandbox: str) -> str:
    """Mortality-only. A reference run whose val split never sees a
    positive window CRASHES in performance_metric (f1 stays the int 0 and
    f1.cpu() raises, metrics.py:73-92) — and on sample_data that is
    unavoidable: the only train stay with death_yn=1 (19995127_*) dies at
    113.8 h, AFTER its own data span, so the Onetime eval dataset labels
    every one of its windows 0 (executed: 'Used patient number: 0'), while
    the val split is a sorted patient-id PREFIX (utils.py:149-158) anyway.
    Build a train dir that adds one copy of the TEST split's genuinely
    positive stay (14954046_*, death at 283.25 h inside its 284 h of data)
    under a low-sorting patient id so the val prefix holds positive
    windows. Both frameworks read the identical augmented dir; the test
    split itself is untouched, so parity is unaffected."""
    import shutil
    aug = os.path.join(sandbox, "train_aug")
    if not os.path.isdir(aug):
        os.makedirs(aug)
        src_dir = os.path.join(SAMPLE, "train")
        for fn in sorted(os.listdir(src_dir)):
            if fn.endswith(".pkl"):
                os.symlink(os.path.join(src_dir, fn),
                           os.path.join(aug, fn))
        pos = "14954046_20405690_txt1_img1.pkl"
        shutil.copyfile(os.path.join(SAMPLE, "test", pos),
                        os.path.join(aug, "00" + pos[2:]))
    return aug


def _full_argv(spec: dict, sandbox: str) -> list:
    train_dir = (_augment_train_dir(sandbox)
                 if spec.get("augment_positive_val") else f"{SAMPLE}/train")
    return spec["argv"] + [
        "--train-data-path", train_dir,
        "--test-data-path", f"{SAMPLE}/test",
        "--image-data-path", os.path.join(sandbox, "images/"),
        "--biobert-path", "./data/mimic4_embeddings.h5",
        "--dir-result", os.path.join(sandbox, "results"),
        "--project-name", "golden",
        "--epochs", str(spec["epochs"]),
        # batch_size must be >=2 (torch BatchNorm1d in training refuses
        # [1, C]); every reference loader is drop_last=True
        # (data_preprocess.py:88-95), so raise --val-data-ratio from its 0.1
        # default or sample_data's val split rounds to <2 samples and
        # log_val_loss divides by zero.
        "--batch-size", "2", "--num-workers", "0",
        # per-config override: a reference run whose val split is
        # all-negative CRASHES (metrics.py:73-92: f1 stays the int 0 and
        # f1.cpu() raises), so the ratio must place >=1 positive stay in
        # val — mortality has exactly one positive train stay
        "--val-data-ratio", str(spec.get("val_ratio", 0.3)),
    ]


# ---------------------------------------------------------------------------
# phase `ref`: execute the reference's own 2_train.py
# ---------------------------------------------------------------------------

def phase_ref(spec_path: str) -> None:
    with open(spec_path) as f:
        spec = json.load(f)
    import numpy as np
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import ref_shim

    ref_shim.patch_torch_for_cpu_run()
    ref = ref_shim.import_reference(spec["argv"])
    args = ref["args"]
    args.seed_list = [412]   # --seed-list is argparse type=list (chars)
    if not hasattr(args, "multitoken"):
        # trainer.py:57 reads a flag that is commented out of the reference
        # config (control/config.py); 0 is the evidently-intended default
        args.multitoken = 0

    import torch
    # The reference constructor builds its swin trunk regardless of
    # input_types (tri_mbt_vsltcls.py:91-104), so both network-weight paths
    # need deterministic offline substitutes:
    #   * Swin_T_Weights.IMAGENET1K_V1 (torchvision download)
    #   * the NFS-only domain-finetuned ckpt (tri_mbt_vsltcls.py:95-100)
    import builder.models.src.swin_transformer as ref_swin

    def fake_state_dict(progress=True):
        torch.manual_seed(21)
        m = ref_swin.SwinTransformer(
            patch_size=[4, 4], embed_dim=96, depths=[2, 2, 6, 2],
            num_heads=[3, 6, 12, 24], window_size=[7, 7],
            stochastic_depth_prob=0.2, num_classes=1000)
        return m.state_dict()

    ref_swin.Swin_T_Weights.IMAGENET1K_V1.get_state_dict = fake_state_dict

    _torch_load = torch.load

    def _load_with_nfs_stub(path, *a, **k):
        if isinstance(path, str) and "chx_ckpts" in path:
            torch.manual_seed(33)
            m = ref_swin.swin_t_m(weights=None)
            return {"model": {f"img_encoder.{k2}": v
                              for k2, v in m.state_dict().items()}}
        return _torch_load(path, *a, **k)

    torch.load = _load_with_nfs_stub

    # The reference's sampler weighting (data_preprocess.py:67-72) assumes
    # type codes are contiguous 0..k-1: `weight = 1/np.unique(types)[counts]`
    # then `weight[types]`. On sample_data the surviving codes are sparse
    # (e.g. {0,1,6,7}) and raw-code indexing IndexErrors. Shim np.unique in
    # that module's namespace only, returning counts indexed BY CODE (absent
    # codes get a never-indexed filler) — the per-class 1/count weights the
    # reference intends, with its code unmodified.
    import builder.data.data_preprocess as DP

    def _unique_dense(x, return_counts=False, **kw):
        if not return_counts:
            return np.unique(x, **kw)
        vals, counts = np.unique(x, return_counts=True, **kw)
        vals = np.asarray(vals)
        if vals.dtype.kind in "iu" and vals.size and int(vals.min()) >= 0:
            dense = np.ones(int(vals.max()) + 1, dtype=counts.dtype)
            dense[vals] = counts
            return vals, dense
        return vals, counts

    class _NpProxy:
        unique = staticmethod(_unique_dense)

        def __getattr__(self, name):
            return getattr(np, name)

    DP.np = _NpProxy()

    # record every (y_true, prob) the reference's own eval loops emit;
    # reset() starts a new segment, so the last non-empty segment after the
    # driver finishes is the final test phase (2_train.py:318-380)
    import builder.utils.metrics as M
    segments = [[]]
    orig_add, orig_reset = M.Evaluator.add_batch, M.Evaluator.reset

    def add_batch(self, y_true, y_pred, rmse=None):
        segments[-1].append(
            (np.asarray(y_true.detach().cpu(), np.float64).reshape(-1),
             np.asarray(y_pred.detach().cpu(), np.float64).reshape(-1)))
        return orig_add(self, y_true, y_pred, rmse)

    def reset(self):
        segments.append([])
        return orig_reset(self)

    M.Evaluator.add_batch, M.Evaluator.reset = add_batch, reset

    src = open(REF_DRIVER).read()
    ns = {"__name__": "__main__", "__file__": REF_DRIVER}
    old_argv = sys.argv
    sys.argv = ["2_train.py"] + spec["argv"]
    try:
        exec(compile(src, REF_DRIVER, "exec"), ns)
    finally:
        sys.argv = old_argv

    test_seg = [s for s in segments if s][-1]
    y_true = np.concatenate([y for y, _ in test_seg])
    probs = np.concatenate([p for _, p in test_seg])
    rows = ns["test_loader"].dataset._data_list
    idents = [[os.path.basename(r[0]), int(r[1][0]), int(r[3])]
              for r in rows][:len(y_true)]
    seed, metric = ns["logger"].test_results
    ckpt = os.path.join(args.dir_result, args.project_name, "ckpts",
                        f"best_fold0_seed{args.seed}.pth")
    out = {
        "argv": spec["argv"],
        "seed": int(seed),
        "test_metrics": [float(x) for x in np.ravel(metric)],
        "y_true": y_true.tolist(),
        "probs": probs.tolist(),
        "test_identities": idents,
        "ckpt_path": ckpt,
        "n_val_segments": sum(1 for s in segments if s) - 1,
    }
    with open(spec["ref_json"], "w") as f:
        json.dump(out, f)
    print(f"[ref] test auc/apr/f1 = {out['test_metrics']}, "
          f"{len(probs)} test samples")


# ---------------------------------------------------------------------------
# phase `ours`: identical eval indices + converted best checkpoint
# ---------------------------------------------------------------------------

def phase_ours(spec_path: str) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    with open(spec_path) as f:
        spec = json.load(f)
    with open(spec["ref_json"]) as f:
        ref = json.load(f)

    sys.path.insert(0, REPO)
    from medical_tri_modal_pilot_tpu.config import parse_config
    from medical_tri_modal_pilot_tpu.data.dataset import EvalDataset
    from medical_tri_modal_pilot_tpu.data.indexer import (build_eval_index,
                                                          search_walk)
    from medical_tri_modal_pilot_tpu.models import get_model
    from medical_tri_modal_pilot_tpu.models.convert_ref import (
        load_reference_checkpoint)
    from medical_tri_modal_pilot_tpu.train.metrics import Evaluator
    from medical_tri_modal_pilot_tpu.train.trainer import Trainer

    # ours_extra: additive flags applied only to OUR side (e.g.
    # --use-pallas 2 pins the run-level parity on the kernel path)
    cfg = parse_config(spec["argv"] + ["--precision", "fp32"]
                       + list(spec.get("ours_extra") or []))
    test_paths = search_walk(cfg.test_data_path, ".pkl")
    index = build_eval_index(cfg, test_paths, "test")
    ds = EvalDataset(cfg, index, "test", seed=cfg.seed)
    pos = {(os.path.basename(s.pkl_path), int(s.key), int(s.win_size)): i
           for i, s in enumerate(index.samples)}
    order = []
    for base, key, win in ref["test_identities"]:
        ident = (base, int(key), int(win))
        if ident not in pos:
            raise SystemExit(
                f"eval-index mismatch: reference sample {ident} not in our "
                f"index ({sorted(pos)[:4]}...)")
    # identical multiset is required; identical order then follows from the
    # explicit reordering below
        order.append(pos[ident])
    samples = [ds[i] for i in order]

    def stack(sub):
        return {k: np.stack([s[k] for s in sub]) for k in sub[0]}

    B = cfg.batch_size
    model = get_model(cfg)
    trainer = Trainer(cfg, model, iters_per_epoch=1,
                      sample_batch=stack(samples[:B]), eval_only=True)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    merged = load_reference_checkpoint(cfg, variables, ref["ckpt_path"])
    trainer.state = trainer.state.replace(
        params=merged["params"],
        batch_stats=merged.get("batch_stats", trainer.state.batch_stats))

    ev = Evaluator()
    probs, y_true = [], []
    with jax.default_matmul_precision("highest"):
        for i in range(0, len(samples) - B + 1, B):
            batch = stack(samples[i:i + B])
            p, *_ = trainer.eval_step(batch)
            probs.append(np.asarray(p, np.float64))
            y_true.append(batch["target"].astype(np.float64))
            ev.add_batch(batch["target"], np.asarray(p))
    probs = np.concatenate(probs)
    y_true = np.concatenate(y_true)
    pm = ev.performance_metric()
    auc, apr, f1 = pm["auc"], pm["apr"], pm["f1"]

    ref_probs = np.asarray(ref["probs"])
    ref_y = np.asarray(ref["y_true"])
    out = {
        "n": int(len(probs)),
        "probs": probs.tolist(),
        "y_true": y_true.tolist(),
        "test_metrics": [float(auc), float(apr), float(f1)],
        "max_abs_dprob": float(np.max(np.abs(probs - ref_probs))),
        "mean_abs_dprob": float(np.mean(np.abs(probs - ref_probs))),
        "targets_match": bool(np.array_equal(y_true, ref_y)),
        "d_auroc": float(abs(auc - ref["test_metrics"][0])),
        "d_auprc": float(abs(apr - ref["test_metrics"][1])),
    }
    with open(spec["ours_json"], "w") as f:
        json.dump(out, f)
    print(f"[ours] auc/apr/f1 = {out['test_metrics']}  "
          f"max|dprob| = {out['max_abs_dprob']:.2e}  "
          f"dAUROC = {out['d_auroc']:.4f}  "
          f"targets_match = {out['targets_match']}")


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def run_config(name: str, workdir: str, timeout: int = 5400,
               ours_extra=None) -> dict:
    spec0 = CONFIGS[name]
    sandbox = _make_sandbox(workdir, name)
    spec = {
        "name": name,
        "argv": _full_argv(spec0, sandbox),
        "ours_extra": list(ours_extra or []),
        "ref_json": os.path.join(sandbox, "ref_result.json"),
        "ours_json": os.path.join(sandbox, "ours_result.json"),
    }
    spec_path = os.path.join(sandbox, "spec.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    for phase in ("_ref", "_ours"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), phase, spec_path],
            cwd=sandbox, timeout=timeout, capture_output=True, text=True)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
        print(f"--- {name} {phase} ---\n{tail}")
        if r.returncode != 0:
            return {"config": name, "error": f"{phase} failed", "log": tail}

    with open(spec["ref_json"]) as f:
        ref = json.load(f)
    with open(spec["ours_json"]) as f:
        ours = json.load(f)
    return {
        "config": name,
        "n_test_samples": ours["n"],
        "ref_auc_apr_f1": ref["test_metrics"],
        "ours_auc_apr_f1": ours["test_metrics"],
        "d_auroc": ours["d_auroc"],
        "d_auprc": ours["d_auprc"],
        "max_abs_dprob": ours["max_abs_dprob"],
        "mean_abs_dprob": ours["mean_abs_dprob"],
        "targets_match": ours["targets_match"],
        "pass": (ours["targets_match"] and ours["d_auroc"] <= 0.002
                 and ours["max_abs_dprob"] <= 5e-3),
    }


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("_ref", "_ours"):
        (phase_ref if argv[0] == "_ref" else phase_ours)(argv[1])
        return

    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=list(CONFIGS))
    p.add_argument("--workdir", default="/tmp/golden_parity")
    p.add_argument("--out", default=os.path.join(REPO, "GOLDEN_PARITY.json"))
    p.add_argument("--ours-use-pallas", type=int, default=None,
                   help="force --use-pallas N on OUR side only (2 = pin "
                        "run-level parity on the pallas kernel path)")
    a = p.parse_args(argv)

    extra = (["--use-pallas", str(a.ours_use_pallas)]
             if a.ours_use_pallas is not None else None)
    rows = [run_config(c, a.workdir, ours_extra=extra) for c in a.configs]
    payload = {"rows": rows,
               "tolerance": {"d_auroc": 0.002, "max_abs_dprob": 5e-3}}
    with open(a.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()

"""Benchmark: tri-modal training throughput (samples/sec/chip) at batch 64.

Runs the flagship tri_mbt_vsltcls configuration from BASELINE.json
(TIE-len 1000, 6 fusion layers, d=256, frozen Swin-T 224, BioBERT text
128x768) with the full jitted train step (fwd+bwd+AdamW) on synthetic
device-shaped batches, isolating device throughput from disk I/O.

Prints JSON lines: the LAST line is always the most complete record
{"metric", "value", "unit", "vs_baseline", ...}. Emission is incremental —
a record lands as soon as the first timing window completes and is
re-printed (enriched) after every optional stage — so a driver timeout or
SIGKILL at any point still leaves a parseable result on stdout. All stages
are gated on a total wall-clock budget (GRAFT_BENCH_TOTAL_BUDGET_S,
default 480 s) chosen to fit under the driver's bench timeout: round 3's
artifact was rc=124/parsed=null because the worst-case backend wait
(1200 s) + window budget (480 s) + verification exceeded it.

``vs_baseline`` denominator: the reference publishes no throughput numbers
(SURVEY.md §6) and its CUDA target isn't present here, so the denominator
is MEASURED — tools/bench_reference_torch.py executes the reference's own
TRI_MBT_VSLTCLS from /root/reference (torch CPU) on this host and records
BASELINE_TORCH.json. The host has a single CPU core, so the ratio mostly
reflects TPU-vs-1-core-CPU; ``denominator_provenance`` says so, and
``vs_gpu_estimate`` (vs a literature-scale 400 samples/s single-GPU guess)
plus ``mfu`` (absolute, FLOPs from XLA cost analysis over the measured
step time against the chip's calibrated matmul rate) are reported so the
number can't mislead.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache, shared with the e2e 2_train subprocess
# and across bench invocations: the flagship step compile measured ~190 s
# through a loaded tunnel (~1000 s at round-5 load; a trivial matmul jit
# alone measured 147-276 s cold vs 0.4 s on a cache hit), and the
# subprocess re-compiles the same shapes. NOTE: this jax build ignores
# the JAX_COMPILATION_CACHE_DIR env var — activation happens through the
# config API (utils/compile_cache.enable_compile_cache) inside main()
# right after the backend wait.

# Fallback-only context prior: literature-scale estimate of the reference's
# PyTorch fp16 single-A100 throughput for this model shape. Used as the
# vs_gpu_estimate denominator ONLY when the XLA-twin step-flop count is
# unavailable; otherwise the denominator is DERIVED (see
# gpu_denominator_derivation in main): A100 bf16 peak x a stated
# eager-PyTorch MFU range / measured flops-per-sample.
REFERENCE_GPU_ESTIMATE = 400.0
A100_PEAK_TFLOPS = 312.0          # A100 80GB bf16/fp16 tensor-core peak
# Eager PyTorch + torch.cuda.amp on this architecture: a d=256/4-head
# multimodal transformer over seq-1000 TIE streams with unfused custom
# attention (builder/models/transformer module), per-layer kernel-launch
# overhead, LN/elementwise between every matmul — published MFU for
# comparable mid-size eager models is 5-15%. The legacy 400/s flat prior
# corresponds to 7.7% at the measured 60.6 GFLOP/sample, inside this range.
TORCH_GPU_MFU = (0.05, 0.15)

BATCH = 64
WARMUP = 3
ITERS = 20
WINDOWS = 3
IMG_PRESENT_FRAC = 0.25   # modeled train-missing CXR coverage (bench batch)

_T0 = time.time()


def _budget_total() -> float:
    # must end (with a parsed JSON on stdout) before the driver's bench
    # timeout: rounds 1-2 completed, round 3's worst case (1200 s backend
    # wait + 480 s windows + verify) was killed at rc=124, so the driver
    # allows on the order of 15-25 min. 900 s + incremental emission keeps
    # the artifact parseable either way. Backend init alone has measured
    # 119 s under tunnel load; the full stage chain measured 880 s + the
    # e2e subprocess ~300 s cold (compile-dominated; warm repeats hit the
    # shared XLA disk cache).
    return float(os.environ.get("GRAFT_BENCH_TOTAL_BUDGET_S", "1080"))


def _remaining() -> float:
    return _budget_total() - (time.time() - _T0)


_METRIC = "tri-modal train samples/sec/chip (batch 64, TIE-1000, swin frozen)"
_RECORD = {
    "metric": _METRIC,
    "value": None,
    "unit": "samples/sec/chip",
    "vs_baseline": None,
}


def _emit() -> None:
    """Print the current record as one JSON line and flush. Called after
    every stage so the last stdout line is always the best-so-far result,
    parseable even if the process is killed right after."""
    _RECORD["elapsed_s"] = round(time.time() - _T0, 1)
    print(json.dumps(_RECORD), flush=True)
    _save_lkg()


_LKG_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LKG.json")
_GIT_HEAD: list = []


def _lkg_prev() -> dict:
    """The LKG file as it stood BEFORE this run started. _save_lkg
    overwrites the file after every stage emit, so end-of-run carry logic
    reading the file live would only ever see this run's own (possibly
    incomplete) record — snapshot once instead."""
    if not hasattr(_lkg_prev, "_snap"):
        try:
            with open(_LKG_PATH) as f:
                _lkg_prev._snap = json.load(f)
        except Exception:
            _lkg_prev._snap = {}
    return _lkg_prev._snap


_lkg_prev()   # snapshot at import, before any stage can overwrite the file


def _save_lkg() -> None:
    """Persist the newest measurement that produced a real number so a later
    outage record can carry it (with provenance) instead of nothing. Called
    after every stage emit (cheap: one small JSON write), so even a killed
    run leaves its best-so-far numbers on disk."""
    if _RECORD.get("value") is None:
        return
    if not _GIT_HEAD:
        try:
            import subprocess
            _GIT_HEAD.append(subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True,
                cwd=os.path.dirname(_LKG_PATH)).stdout.strip())
        except Exception:
            _GIT_HEAD.append("")
    head = _GIT_HEAD[0]
    try:
        record = {k: v for k, v in _RECORD.items()
                  if k != "last_known_good"}
        # crash insurance: a mid-run save must not wipe the previous run's
        # e2e evidence from the LKG file — keep it (with provenance) until
        # this run measures its own
        prev = _lkg_prev()
        prev_rec = prev.get("record", {})
        for k in ("e2e_samples_per_sec_cold", "e2e_samples_per_sec_warm",
                  "e2e_provenance", "e2e_inprocess_samples_per_sec_cold",
                  "e2e_inprocess_samples_per_sec_warm",
                  "e2e_inprocess_provenance"):
            if k not in record and k in prev_rec:
                record[k] = prev_rec[k]
                record.setdefault(
                    "e2e_lkg_carried_from",
                    f"{prev.get('measured_at')} (git {prev.get('git_head')})")
        with open(_LKG_PATH, "w") as f:
            json.dump({"measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                    time.gmtime()),
                       "git_head": head,
                       "record": record}, f, indent=1)
    except Exception:
        pass


def _attach_lkg() -> None:
    """On an outage, attach the newest committed measurement so the driver
    artifact still carries real numbers with explicit provenance."""
    try:
        lkg = _lkg_prev()
        _RECORD["last_known_good"] = {
            "measured_at": lkg.get("measured_at"),
            "git_head": lkg.get("git_head"),
            "value": lkg.get("record", {}).get("value"),
            "note": ("most recent successful bench.py run on this "
                     "repo (committed as BENCH_LKG.json); the current "
                     "run could not reach the device backend"),
        }
    except Exception:
        pass


def _calibrate_matmul_tflops() -> float:
    """Best-of-3 big bf16 matmul rate on this chip (the achievable peak
    under the time-shared tunnel; used as the MFU denominator)."""
    import jax
    import jax.numpy as jnp
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    _ = float(f(a, b)[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(a, b)
        for _ in range(9):
            o = f(o, b)
        _ = float(o[0, 0])
        best = min(best, time.perf_counter() - t0)
    return 10 * 2 * n ** 3 / best / 1e12


def _bench_host_pipeline(batch: int) -> dict:
    """Throughput of the real host input pipeline (pkl decode -> window
    slice -> TIE assembly -> image/text fetch -> batch stack) over a
    1000-stay synthetic fixture set with the reference schema — the number
    the device-resident measurement deliberately excludes.

    Measures the first full epoch cold (every pkl decode and jpeg load
    misses) and subsequent epochs warm, for the pure-python thread workers
    and for --worker-type native (threads + the C++ TIE assembler,
    data/native.py). Returns {} on any failure so the device benchmark
    always reports."""
    try:
        fix = _ensure_fixtures(_remaining() - 60)
        from medical_tri_modal_pilot_tpu.config import parse_config
        from medical_tri_modal_pilot_tpu.data.pipeline import get_data_loaders

        def run(worker_type: str) -> dict:
            # earlier stages (and the other worker type's run) warmed the
            # MODULE-level decoded-image LRU on these same fixtures; drop
            # it so each run's cold epoch is actually cold (the on-disk
            # image cache is off here: no --image-cache-dir in this cfg)
            from medical_tri_modal_pilot_tpu.data import images as _images
            _images.set_image_cache_mb(0)
            _images.set_image_cache_mb(256)
            cfg = parse_config([
                "--train-data-path", os.path.join(fix, "train"),
                "--test-data-path", os.path.join(fix, "test"),
                "--image-data-path", os.path.join(fix, "images/"),
                "--biobert-path", os.path.join(fix, "mimic4_embeddings.h5"),
                "--input-types", "vslt_img_txt", "--output-type", "intubation",
                "--modality-inclusion", "train-missing_test-missing",
                "--model", "tri_mbt_vsltcls", "--batch-size", str(batch),
                "--TIE-len", "1000", "--num-workers", "4",
                "--worker-type", worker_type,
                # token files live under {fix}/builder/data/text/; without
                # this every txt1 stay would be DROPPED from the index
                # (reference missing-branch semantics, dataset_new.py:306)
                "--dir-root", fix,
            ])
            train_loader, _val_l, _test_l = get_data_loaders(cfg)
            # default 2_train path: txt rides the device table, so the
            # host pipeline's per-item work excludes the h5 reads
            from medical_tri_modal_pilot_tpu.data.txt_table import \
                build_txt_table
            build_txt_table(cfg, (train_loader.dataset, _val_l.dataset,
                                  _test_l.dataset))
            t0 = time.perf_counter()
            seen = 0
            for b in iter(train_loader):   # cold: pkl/jpeg caches empty
                seen += len(b["target"])
            cold = seen / (time.perf_counter() - t0)
            best = 0.0
            for _ in range(2):
                t0 = time.perf_counter()
                seen = 0
                for b in iter(train_loader):
                    seen += len(b["target"])
                best = max(best, seen / (time.perf_counter() - t0))
            return {"cold": round(cold, 1), "warm": round(best, 1),
                    "n_batches": len(train_loader)}

        res = {wt: run(wt) for wt in ("thread", "native")}
        chosen = "native" if res["native"]["warm"] >= res["thread"]["warm"] \
            else "thread"
        # cold-gap probe: the cold-vs-warm delta is jpeg decode work (the
        # only epoch-1-exclusive host cost once pkls are OS-page-cached).
        # Measure the per-image decode+equalize rate so the artifact itself
        # explains the gap: on this N-core host, cold ~= warm + n_decodes x
        # decode_ms / N_workers_that_have_cores (1-core: fully serial and
        # unhideable; --image-cache-dir amortizes it to once EVER)
        decode = {}
        try:
            import glob as _glob
            from medical_tri_modal_pilot_tpu.data.images import _decode_eq
            paths = sorted(_glob.glob(os.path.join(
                fix, "images", "**", "*.jpg"), recursive=True))[:64]
            if paths:
                t0 = time.perf_counter()
                for p in paths:
                    _decode_eq(p)
                decode = {
                    "image_decode_ms_per_image": round(
                        (time.perf_counter() - t0) / len(paths) * 1000, 2),
                    "image_decode_probe_n": len(paths)}
        except Exception:
            pass
        return {
            **decode,
            "host_pipeline_samples_per_sec": res[chosen]["warm"],
            "host_pipeline_cold_samples_per_sec": res[chosen]["cold"],
            "host_pipeline_by_worker": res,
            "host_pipeline_note": (
                f"real loader, 1000-stay synthetic fixtures "
                f"({res[chosen]['n_batches']} batches/epoch of {batch}), "
                f"pkl+jpeg+h5; measured worker types: thread = pure-python "
                f"window assembly, native = threads + C++ TIE assembler "
                f"(data/native.py); reported rate is worker type "
                f"'{chosen}', warm epoch (cold = first epoch, every cache "
                f"missing) on a {os.cpu_count()}-core host; training "
                "overlaps host with device compute via device_prefetch, so "
                "e2e ~= min(host, device)")}
    except Exception as e:   # pragma: no cover - best-effort diagnostics
        return {"host_pipeline_error": f"{type(e).__name__}: {e}"}


def _ensure_fixtures(budget_s: float) -> str:
    """Build the 1000-stay synthetic fixture set (reference schema) if it
    is not already on disk; shared by the e2e/realistic/host stages."""
    import subprocess
    fix = "/tmp/graft_bench_synth_1k"
    if not os.path.isdir(os.path.join(fix, "train")):
        root = os.path.dirname(os.path.abspath(__file__))
        subprocess.run(
            [sys.executable,
             os.path.join(root, "tools/make_synthetic_fixtures.py"),
             "--out", fix, "--n-train", "1000", "--n-test", "16",
             "--seed", "5"],
            check=True, capture_output=True,
            timeout=max(min(budget_s, 600), 30))
    return fix


def _bench_e2e_train(budget_s: float) -> dict:
    """End-to-end training throughput as ONE wall-clock number: 2_train.py
    epochs over the 1000-stay fixtures with the real loader feeding the
    real device step (native workers + device_prefetch overlap). Runs in a
    subprocess so its compile/backend state can't disturb the main
    measurement; parses the per-epoch '(N iters, T s elapsed)' lines.
    Reports the cold first epoch (every pkl/jpeg cache missing) and the
    best warm epoch.

    The subprocess pins every shape-determining flag to the main
    measurement's values (model dims, --img-pack-frac 0.5 = the bench
    trainer's direct-construction capacity, --tie-buckets off) so its
    train/eval step compiles HIT the shared XLA disk cache the main
    process just populated — compile time was what starved this stage in
    rounds 2-4. A TimeoutExpired still yields numbers: the exception
    carries the partial stdout, and completed epoch lines are parsed from
    it (2_train flushes them per epoch)."""
    import re
    import subprocess
    try:
        fix = _ensure_fixtures(budget_s - 120)
        root = os.path.dirname(os.path.abspath(__file__))
        out_dir = "/tmp/graft_bench_e2e"
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
        cmd = [sys.executable, os.path.join(root, "2_train.py"),
               "--train-data-path", os.path.join(fix, "train"),
               "--test-data-path", os.path.join(fix, "test"),
               "--image-data-path", os.path.join(fix, "images/"),
               "--biobert-path", os.path.join(fix, "mimic4_embeddings.h5"),
               "--input-types", "vslt_img_txt", "--output-type", "intubation",
               "--modality-inclusion", "train-missing_test-missing",
               "--model", "tri_mbt_vsltcls", "--batch-size", str(BATCH),
               "--TIE-len", "1000", "--num-workers", "4",
               "--worker-type", "native", "--epochs", "2",
               # shape-pinning for XLA disk-cache hits (see docstring):
               "--transformer-num-layers", "6", "--transformer-dim", "256",
               "--transformer-num-head", "4", "--img-model-type", "swin",
               "--imgtxt-time", "1", "--precision", "bf16",
               "--img-pack-frac", "0.5",
               "--tie-buckets", "off", "--length-rebatch", "0",
               "--eval-length-rebatch", "0",
               "--image-cache-dir", "/tmp/graft_img_cache",   # persistent
               #                      decode cache: cold epochs stay warm
               #                      across workers and bench invocations
               "--dir-root", fix,   # token files: {fix}/builder/data/text
               "--seed-list", "1004", "--dir-result", out_dir,
               "--project-name", "bench_e2e", "--log-iter", "1000000"]
        to = max(min(_remaining() - 20, budget_s), 60)
        env = dict(os.environ)
        # persistent XLA compile cache, shared with the main process
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/graft_jax_cache")
        env.setdefault("GRAFT_TIME_PHASES", "1")   # diagnostics on stdout
        timeout_note = ""
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=to, env=env)
            stdout, stderr, rc = r.stdout, r.stderr, r.returncode
        except subprocess.TimeoutExpired as e:
            # the partial pipe still holds every '(N iters, T s)' line the
            # run flushed before the kill — a completed first epoch is a
            # real cold number even when the run as a whole timed out
            def _txt(b):
                return (b.decode("utf-8", "replace")
                        if isinstance(b, bytes) else (b or ""))
            stdout, stderr, rc = _txt(e.stdout), _txt(e.stderr), "timeout"
            timeout_note = f" (run killed at its {to:.0f}s budget)"
        times, iters = [], []
        for m in re.finditer(r"epoch (\d+)/\d+ done \((\d+) iters, "
                             r"([0-9.]+)s elapsed\)", stdout):
            iters.append(int(m.group(2)))
            times.append(float(m.group(3)))
        if not times:
            tail = (stdout + stderr).strip().splitlines()[-3:]
            return {"e2e_error": f"rc={rc}; tail={tail}"}
        samples = iters[0] * BATCH   # iteration counts are cumulative
        # 'elapsed' is cumulative from train start (includes val eval time)
        epoch_s = [times[0]] + [times[i] - times[i - 1]
                                for i in range(1, len(times))]
        out = {
            "e2e_samples_per_sec_cold": round(samples / epoch_s[0], 1),
            "e2e_note": ("wall-clock 2_train.py epochs on the 1000-stay "
                         "fixtures (real loader + jitted step + per-epoch "
                         "val), native workers, device_prefetch; cold = "
                         "first epoch incl. host cache misses and (on a "
                         "cold XLA disk cache) the step compile; epoch "
                         "times include the per-epoch validation pass "
                         "when the val split fills a batch (the 1000-stay "
                         "fixtures' 10% split doesn't at B=64)"
                         + timeout_note + ")")}
        if len(times) >= 2:
            out["e2e_samples_per_sec_warm"] = round(
                samples / min(epoch_s[1:]), 1)
        return out
    except Exception as e:   # pragma: no cover
        return {"e2e_error": f"{type(e).__name__}: {e}"}


def _bench_realistic_length(trainer) -> dict:
    """Device training throughput over the REAL stream-length distribution
    (the headline deliberately measures the worst case: every TIE stream
    padded to the full 1000-row cap). Real ICU stays are far shorter —
    the reference pads every one of them to the fixed cap and pays full
    flops anyway (dataset_new.py:645-663 zero-fills a [TIE_len, 3]
    tensor), while this trainer slices each pooled-and-sorted batch to its
    --tie-buckets shape (trainer.py::_bucket_batch) and pays only the
    bucket's flops. This stage drives the SAME jitted train step over the
    1000-stay fixtures' actual host batches (length_rebatch-pooled, like
    2_train with --length-rebatch 8) and reports samples/s plus the
    bucket-hit histogram. Device-resident like the headline: batches are
    bucketed + shipped once, then timed over repeated sweeps."""
    try:
        import jax
        fix = _ensure_fixtures(_remaining() - 150)
        from medical_tri_modal_pilot_tpu.config import parse_config
        from medical_tri_modal_pilot_tpu.data.pipeline import (
            get_data_loaders, length_rebatch)
        cfg = parse_config([
            "--train-data-path", os.path.join(fix, "train"),
            "--test-data-path", os.path.join(fix, "test"),
            "--image-data-path", os.path.join(fix, "images/"),
            "--biobert-path", os.path.join(fix, "mimic4_embeddings.h5"),
            "--input-types", "vslt_img_txt", "--output-type", "intubation",
            "--modality-inclusion", "train-missing_test-missing",
            "--model", "tri_mbt_vsltcls", "--batch-size", str(BATCH),
            "--TIE-len", "1000", "--num-workers", "4",
            "--worker-type", "native", "--dir-root", fix,
            "--img-pack-frac", "0.5",   # match the headline wire capacity
        ])
        train_loader, _val_l, _test_l = get_data_loaders(cfg)
        # attach the fixtures' txt table so host batches carry txt_id and
        # the headline wire program is reused as-is (the ids index the
        # TRAINER's synthetic device table — wrong text values, right
        # shapes; this stage measures throughput, not accuracy)
        from medical_tri_modal_pilot_tpu.data.txt_table import \
            build_txt_table
        build_txt_table(cfg, (train_loader.dataset, _val_l.dataset,
                              _test_l.dataset))
        host = [b for b in length_rebatch(train_loader, 8)
                if len(b["target"]) == BATCH]
        if not host:
            return {"realistic_error": "no full-size host batches"}
        # bucket + ship every batch once (H2D excluded, as in the headline);
        # group by compiled shape so each bucket compiles at most once and
        # a budget squeeze can skip the biggest shapes, not the stage
        hist: dict = {}
        by_bucket: dict = {}
        for b in host:
            bb = trainer._bucket_batch(b)
            L = int(bb["vslt"].shape[1])
            hist[L] = hist.get(L, 0) + 1
            by_bucket.setdefault(L, []).append(b)
        dev, skipped = [], []
        for L in sorted(by_bucket):
            if _remaining() < 120 and dev:
                skipped.append(L)   # keep what already compiled
                continue
            batches = [trainer._device_batch(b) for b in by_bucket[L]]
            rng = jax.random.PRNGKey(1)
            trainer.state, loss = trainer._train_step(
                trainer.state, batches[0], rng,
                trainer._txt_table_dev)   # compile (or cache hit)
            _ = float(loss)
            dev.extend(batches)
        if not dev:
            return {"realistic_error": "budget exhausted before compile"}
        rng = jax.random.PRNGKey(1)
        n_chips = len(jax.devices())
        best = float("inf")
        reps = max(int(np.ceil(ITERS / len(dev))), 1)
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(reps):
                for db in dev:
                    trainer.state, loss = trainer._train_step(
                        trainer.state, db, rng, trainer._txt_table_dev)
            _ = float(loss)   # materialization barrier (see headline note)
            best = min(best, time.perf_counter() - t0)
        sps = len(dev) * BATCH * reps / best / n_chips
        lens = np.concatenate([np.asarray(b["input_length"]) for b in host])
        out = {
            "train_samples_per_sec_realistic": round(sps, 2),
            "realistic_bucket_histogram": {
                str(k): v for k, v in sorted(hist.items())},
            "realistic_stream_len_percentiles": {
                "p50": int(np.percentile(lens, 50)),
                "p90": int(np.percentile(lens, 90)),
                "max": int(lens.max())},
            "realistic_note": (
                f"same jitted step over the fixtures' real host batches "
                f"({len(dev)} batches of {BATCH}, length_rebatch pool 8, "
                f"--tie-buckets {getattr(trainer.cfg, 'tie_buckets', '?')}"
                f" -> compiled shapes {sorted(by_bucket)}"
                + (f", skipped (budget) {skipped}" if skipped else "")
                + "); the reference zero-pads every stay to the fixed "
                "TIE cap and pays full-length flops for this same data "
                "(dataset_new.py:645-663), so vs_gpu_estimate_realistic "
                "divides by the same full-length GPU denominator")}
        return out
    except Exception as e:   # pragma: no cover
        return {"realistic_error": f"{type(e).__name__}: {e}"}


def _bench_e2e_inprocess(trainer) -> dict:
    """Wall-clock loader+device training epochs INSIDE this process,
    reusing the programs the headline/realistic stages already compiled.

    The subprocess e2e stage (2_train.py, the gold evidence) re-pays its
    compiles every run because the tunnel backend's compile cache is
    SERVER-side and ephemeral (measured: identical pallas programs re-took
    255 s in a fresh process minutes later, with the jax disk cache
    populated and hitting) — under tunnel load that alone can exceed the
    stage budget. This stage is the guaranteed fallback: the same real
    host pipeline (fixtures, native workers, txt table, packed uint8
    wire, device_prefetch) driving the same jitted wire-format train
    step, with zero new compiles when run after the realistic stage
    (identical batch trees, bucket shapes included). Epoch 1 = cold host
    caches; best of the rest = warm."""
    try:
        import jax
        fix = _ensure_fixtures(_remaining() - 120)
        from medical_tri_modal_pilot_tpu.config import parse_config
        from medical_tri_modal_pilot_tpu.data.pipeline import get_data_loaders
        from medical_tri_modal_pilot_tpu.data.txt_table import build_txt_table
        cfg = parse_config([
            "--train-data-path", os.path.join(fix, "train"),
            "--test-data-path", os.path.join(fix, "test"),
            "--image-data-path", os.path.join(fix, "images/"),
            "--biobert-path", os.path.join(fix, "mimic4_embeddings.h5"),
            "--input-types", "vslt_img_txt", "--output-type", "intubation",
            "--modality-inclusion", "train-missing_test-missing",
            "--model", "tri_mbt_vsltcls", "--batch-size", str(BATCH),
            "--TIE-len", "1000", "--num-workers", "4",
            "--worker-type", "native", "--dir-root", fix,
            "--img-pack-frac", "0.5",
        ])
        train_loader, _val_l, _test_l = get_data_loaders(cfg)
        build_txt_table(cfg, (train_loader.dataset, _val_l.dataset,
                              _test_l.dataset))
        rng = jax.random.PRNGKey(2)
        rates = []
        for _ep in range(3):
            if _ep and _remaining() < 60:
                break
            t0 = time.perf_counter()
            n = 0
            loss = None
            for db in trainer.prefetch(iter(train_loader)):
                trainer.state, loss = trainer._train_step(
                    trainer.state, db, rng, trainer._txt_table_dev)
                n += BATCH
            if loss is None:
                return {"e2e_inprocess_error": "empty train loader"}
            _ = float(loss)   # materialization barrier
            rates.append(n / (time.perf_counter() - t0))
        out = {
            "e2e_inprocess_samples_per_sec_cold": round(rates[0], 1),
            "e2e_inprocess_note": (
                "real host pipeline (1000-stay fixtures, native workers, "
                "txt device table + packed uint8 wire, device_prefetch "
                "overlap) driving the headline's jitted wire-format step "
                "in-process, train loop only (no val/ckpt); cold = first "
                "epoch, every host cache missing. The 2_train subprocess "
                "stage remains the whole-CLI evidence when the tunnel's "
                "compile queue lets it finish.")}
        if len(rates) > 1:
            out["e2e_inprocess_samples_per_sec_warm"] = round(
                max(rates[1:]), 1)
        return out
    except Exception as e:   # pragma: no cover
        return {"e2e_inprocess_error": f"{type(e).__name__}: {e}"}


def _verify_kernels() -> dict:
    """Compiled pallas-vs-XLA parity (fwd+bwd) on the benchmark backend —
    interpret-mode CPU tests can't catch Mosaic-compiled divergence, so
    every bench run re-checks on the real chip (tools/verify_kernels_tpu)."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from verify_kernels_tpu import verify_all
        v = verify_all()
        return {"kernel_parity_pass": v["pass"],
                "kernel_parity_max_err": v["max_err"],
                "kernel_parity_backend": v["backend"],
                "kernel_parity_cases": len(v["errors"])}
    except Exception as e:   # pragma: no cover
        return {"kernel_parity_error": f"{type(e).__name__}: {e}"}


def _wait_for_backend(max_wait_s: float) -> bool:
    """The tunneled TPU backend has been observed UNAVAILABLE for stretches
    (external outage/load). jax caches a failed platform init for the
    process lifetime, so probe in a SUBPROCESS and only import jax here
    once a probe succeeds. Returns False (after emitting an honest outage
    record) when the backend stays down past the budget."""
    import subprocess
    deadline = time.time() + max_wait_s
    delay = 15.0
    last_err = ""
    # when the environment configures a device platform (axon/tpu), a
    # probe that silently fell back to CPU is NOT success — benching the
    # headline metric on host CPU would be a silent ~1000x regression
    expected = os.environ.get("JAX_PLATFORMS", "")
    need_device = bool(expected) and expected != "cpu"
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.ones((8,)).sum()), "
                 "jax.default_backend())"],
                capture_output=True, text=True,
                # backend init alone has measured 119 s under tunnel load —
                # a shorter probe timeout misreads load as an outage
                timeout=max(min(180, deadline - time.time()), 20))
            if r.returncode == 0:
                backend = (r.stdout.split() or [""])[-1]
                if not need_device or backend != "cpu":
                    return True
                last_err = (f"backend fell back to '{backend}' "
                            f"(JAX_PLATFORMS={expected})")
            else:
                tail = (r.stderr or "").strip().splitlines()[-1:] or [""]
                last_err = tail[0][:300]
        except subprocess.TimeoutExpired:
            last_err = "backend probe timed out"
        if time.time() + delay > deadline:
            _RECORD["error"] = (f"device backend unavailable for "
                                f"{max_wait_s:.0f}s; last probe: {last_err}")
            _attach_lkg()
            _emit()
            return False
        time.sleep(delay)
        delay = min(delay * 2, 120.0)


def main() -> None:
    # insurance record: if the process is killed during backend wait or
    # the first compile, stdout still ends with a parseable line saying so
    _RECORD["error"] = ("in progress — killed before the first timing "
                        "window completed")
    _emit()
    # backend wait gets at most a quarter of the budget; the rest is
    # reserved for compile + timing windows + the gated extra stages
    # the 0.35 fraction keeps the driver's default 1080 s budget mostly
    # for measurement; a deliberately enlarged budget (manual warm runs)
    # buys a proportionally longer outage wait, capped at 15 min
    if not _wait_for_backend(max(min(_remaining() * 0.35, 900.0), 30.0)):
        return

    import jax
    from medical_tri_modal_pilot_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()   # env-var route is ignored by this jax build
    from medical_tri_modal_pilot_tpu import ops
    from medical_tri_modal_pilot_tpu.config import parse_config
    from medical_tri_modal_pilot_tpu.models import get_model
    from medical_tri_modal_pilot_tpu.train.trainer import Trainer
    from __graft_entry__ import _synthetic_batch

    argv = [
        "--input-types", "vslt_img_txt",
        "--output-type", "intubation",
        "--modality-inclusion", "train-missing_test-missing",
        "--model", "tri_mbt_vsltcls",
        "--batch-size", str(BATCH),
        "--TIE-len", "1000",
        "--transformer-num-layers", "6",
        "--transformer-dim", "256",
        "--transformer-num-head", "4",
        "--img-model-type", "swin",
        "--imgtxt-time", "1",
        "--precision", "bf16",
        # pin the packed-swin capacity the models' direct-construction
        # fallback uses AND enable the packed uint8 image wire at the same
        # static capacity (trainer.wire_pack) — 2_train pins the same
        "--img-pack-frac", "0.5",
    ]
    cfg = parse_config(argv)
    ops.configure(bool(cfg.use_pallas) and jax.default_backend() == "tpu")
    model = get_model(cfg)
    batch = _synthetic_batch(cfg, BATCH)
    # realistic train-missing image mix: most ICU stay windows carry no CXR
    # (reference loads images only for type codes 0/5, dataset_new.py:677);
    # 25% present is the modeled rate. The frozen swin trunk is presence-
    # packed (--img-pack auto, models/models.py): its compute is set by the
    # STATIC packed capacity ceil(B * frac) + 1, not by the draw. frac here
    # is the direct-construction fallback 0.5 (33 rows) — 2_train resolves
    # the -1 auto default from the train sampler instead
    # (pipeline.auto_img_pack_frac).
    _r = np.random.default_rng(7)
    img_present = _r.random(BATCH) < IMG_PRESENT_FRAC
    batch["missing"][:, 1] = 1.0 - img_present
    batch["img"] = (batch["img"] *
                    img_present[:, None, None, None]).astype(np.float32)
    batch["img_time"] = np.where(img_present, batch["img_time"],
                                 -1.0).astype(np.float32)
    # Headline = the H2D wire-format program, i.e. what 2_train actually
    # runs on TPU: txt rides a device-resident table (int32 row ids,
    # gathered in-graph), pixels ship as packed uint8 and scatter+rescale
    # in-graph (trainer._wire_resolve). The table replicates the dense
    # batch's rows exactly, so the step computes the same numbers the
    # round-4 dense headline did (modulo u8 pixel quantization of the
    # synthetic pixels — shapes and math are identical).
    from medical_tri_modal_pilot_tpu.data.txt_table import TxtTable
    _txt_rows = np.concatenate(
        [np.zeros((1,) + batch["txt"].shape[1:], np.float32),
         batch["txt"].astype(np.float32)])
    _txt_tab = TxtTable(
        rows=_txt_rows,
        lengths=np.concatenate(
            [[0], np.asarray(batch["txt_length"])]).astype(np.int32))
    batch.pop("txt")
    batch["txt_id"] = np.arange(1, BATCH + 1, dtype=np.int32)
    batch["img"] = np.rint(np.clip(batch["img"], 0.0, 1.0)
                           * 255.0).astype(np.uint8)
    trainer = Trainer(cfg, model, iters_per_epoch=100, sample_batch=batch,
                      txt_table=_txt_tab)
    # measure device throughput: ship the batch once (the host input
    # pipeline is asynchronous in training and benchmarked separately)
    dbatch = trainer._device_batch(batch)

    rng = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        trainer.state, loss = trainer._train_step(trainer.state, dbatch, rng,
                                                  trainer._txt_table_dev)
    _ = float(loss)   # true barrier: jax.block_until_ready returns early on
    #                   the tunneled TPU backend; only value materialization
    #                   actually waits for execution

    try:
        cost = trainer._train_step.lower(
            trainer.state, dbatch, rng).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
    except Exception:
        step_flops = 0.0
    # XLA's cost analysis cannot see inside Pallas custom calls, so the
    # number above undercounts once the attention/FFN kernels are fused.
    # The mathematically-equivalent all-XLA step's flop count is the
    # model-level figure for MFU — shape-determined, so it is cached in
    # BENCH_MODEL_FLOPS.json; recompiling the XLA twin through a loaded
    # tunnel can block for many minutes, so a cache MISS skips the model
    # figure rather than risk the budget (run tools/profile_* by hand to
    # refresh the cache).
    model_flops = step_flops
    cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_MODEL_FLOPS.json")
    cache_key = " ".join(argv)
    try:
        with open(cache_path) as f:
            c = json.load(f)
        if c.get("config") == cache_key:
            model_flops = float(c["flops"])
    except Exception:
        pass
    if (model_flops == step_flops and cfg.use_pallas
            and jax.default_backend() == "tpu" and _remaining() > 180):
        try:
            ops.configure(False)
            # fresh lambda: jit's trace cache is keyed on the callable, and
            # trainer._train_step_impl already has a (pallas) trace cached
            # from the warmup steps
            xla_step = jax.jit(
                lambda s, b, r: trainer._train_step_impl(
                    s, b, r, trainer._txt_table_dev))
            mcost = xla_step.lower(
                trainer.state, dbatch, rng).compile().cost_analysis()
            model_flops = float(mcost.get("flops", 0.0)) or step_flops
            try:
                with open(cache_path, "w") as f:
                    json.dump({"config": cache_key, "flops": model_flops}, f)
            except Exception:
                pass
        except Exception as e:
            print(f"model-flops costing failed ({type(e).__name__}: {e}); "
                  "falling back to the pallas-opaque XLA count",
                  file=sys.stderr)
        finally:
            ops.configure(True)

    # The TPU may be tunneled/time-shared: consecutive identical windows
    # have been observed to differ ~2x under external load. Take the best
    # of WINDOWS timing windows — closest to unloaded-hardware throughput —
    # and keep adding windows (within the remaining-time budget) while
    # either (a) the best two windows disagree by >10% (noisy), or (b) a
    # quick matmul probe says the tunnel is visibly loaded (<85% of the
    # unloaded calibration), so one calm window during the budget suffices.
    # The probe is ~15 ms of device time per window; UNLOADED_TFLOPS is the
    # chip calibration recorded in BASELINE_MEASURED.md. Each window
    # re-emits the best-so-far record.
    import jax.numpy as _jnp
    UNLOADED_TFLOPS = 96.5
    _pn = 4096
    _pa = _jnp.ones((_pn, _pn), _jnp.bfloat16)
    _pmm = jax.jit(lambda a, b: a @ b)
    _ = float(_pmm(_pa, _pa)[0, 0])

    def _probe_tflops() -> float:
        t0 = time.perf_counter()
        o = _pmm(_pa, _pa)
        for _ in range(4):
            o = _pmm(o, _pa)
        _ = float(o[0, 0])
        return 5 * 2 * _pn ** 3 / (time.perf_counter() - t0) / 1e12

    n_chips = len(jax.devices())
    denom_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_TORCH.json")
    if os.path.exists(denom_path):
        with open(denom_path) as f:
            denom = json.load(f)
        denom_sps = denom["samples_per_sec"]
        provenance = denom["provenance"]
    else:
        denom_sps = REFERENCE_GPU_ESTIMATE
        provenance = ("BASELINE_TORCH.json missing — fell back to the "
                      "400 samples/s literature-scale GPU estimate")
    _RECORD.pop("error", None)
    _RECORD.update({
        "denominator_provenance": provenance,
        "denominator_samples_per_sec": denom_sps,
        "step_gflops_xla": round(step_flops / 1e9, 1),
        "step_gflops_model": round(model_flops / 1e9, 1),
        "device_kind": jax.devices()[0].device_kind,
    })

    # auditable GPU denominator: derive the eager-PyTorch-A100 bound from
    # the measured XLA-twin step flops at the stated MFU range instead of
    # trusting the flat 400/s prior (full derivation: BASELINE_MEASURED.md)
    gpu_mid = REFERENCE_GPU_ESTIMATE
    if model_flops:
        fps = model_flops / BATCH
        lo = A100_PEAK_TFLOPS * 1e12 * TORCH_GPU_MFU[0] / fps
        hi = A100_PEAK_TFLOPS * 1e12 * TORCH_GPU_MFU[1] / fps
        gpu_mid = (lo + hi) / 2
        _RECORD["gpu_denominator_derivation"] = {
            "a100_bf16_peak_tflops": A100_PEAK_TFLOPS,
            "assumed_eager_torch_mfu": list(TORCH_GPU_MFU),
            "flops_per_sample_gflops": round(fps / 1e9, 2),
            "gpu_samples_per_sec_interval": [round(lo, 1), round(hi, 1)],
            "gpu_samples_per_sec_midpoint": round(gpu_mid, 1),
            "legacy_flat_prior_samples_per_sec": REFERENCE_GPU_ESTIMATE,
            "note": ("vs_gpu_estimate* = measured samples/s divided by the "
                     "interval midpoint; flops = XLA-equivalent train step "
                     "(fwd+bwd+adamw) per sample at the full TIE-1000 pad, "
                     "which the reference always pays "
                     "(dataset_new.py:645-663 zero-fills the fixed cap)"),
        }
    _RECORD["gpu_denominator_samples_per_sec"] = round(gpu_mid, 1)

    def _update_headline(best_dt: float, windows: int) -> None:
        sps = BATCH * ITERS / best_dt / n_chips
        _RECORD.update({
            "value": round(sps, 2),
            "vs_baseline": round(sps / denom_sps, 3),
            "vs_gpu_estimate": round(sps / gpu_mid, 3),
            "step_ms": round(best_dt / ITERS * 1000, 1),
            "bench_windows": windows,
            "mfu_vs_unloaded_calibration": (
                round(model_flops / (best_dt / ITERS) / 96.5e12, 3)
                if model_flops else None),
        })

    # reserve tail time for the extras (eval timing + kernel parity verify
    # + host pipeline); under a loaded tunnel the window loop would happily
    # consume everything hunting for a calm window, so cap it hard
    best_dt = float("inf")
    second_dt = float("inf")
    t_budget = time.perf_counter() + max(
        min(float(os.environ.get("GRAFT_BENCH_WINDOW_BUDGET_S", "120")),
            _remaining() - 300), 10)
    w = 0
    loaded = True
    while (w < WINDOWS
           or ((second_dt > 1.10 * best_dt or loaded)
               and time.perf_counter() < t_budget)):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            trainer.state, loss = trainer._train_step(
                trainer.state, dbatch, rng, trainer._txt_table_dev)
        # the final loss depends on the whole donated-state chain, so
        # materializing it forces every step in the window
        _ = float(loss)
        dt = time.perf_counter() - t0
        if dt < best_dt:
            best_dt, second_dt = dt, best_dt
        elif dt < second_dt:
            second_dt = dt
        w += 1
        _update_headline(best_dt, w)
        _emit()
        try:
            loaded = _probe_tflops() < 0.85 * UNLOADED_TFLOPS
        except Exception:
            loaded = False

    # inference/serving throughput: the jitted eval step (fwd-only,
    # deterministic). The custom-vjp primal path runs the lean kernels
    # (no backward-only attn/stats HBM writes). Runs BEFORE the e2e stage
    # on purpose: it populates the XLA disk cache with the batch-64
    # full-length eval compile the subprocess's per-epoch validation needs.
    if _remaining() > 60:
        try:
            probs, eloss, _ = trainer._eval_step(trainer.state, dbatch,
                                                 trainer._txt_table_dev)
            _ = float(eloss)
            best_ev = float("inf")
            for _ in range(WINDOWS):
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    probs, eloss, _ = trainer._eval_step(
                        trainer.state, dbatch, trainer._txt_table_dev)
                _ = float(eloss)
                best_ev = min(best_ev, time.perf_counter() - t0)
            eval_ms = best_ev / ITERS * 1000
            _RECORD.update({
                "eval_step_ms": round(eval_ms, 1),
                "eval_samples_per_sec_per_chip":
                    round(BATCH / (eval_ms / 1000) / n_chips, 2)})
            _emit()
        except Exception:
            pass

    # e2e wall-clock training (loader + device step together): the single
    # most important evidence stage, so it runs FIRST after the device
    # measurements with a reserved budget slice — rounds 2-4 ran it last on
    # leftovers and starved it. Compile-dominated on a cold XLA disk cache;
    # the shape-pinned flags make warm runs pure wall-clock.
    # GRAFT_BENCH_E2E=0 disables.
    if (_remaining() > 120
            and os.environ.get("GRAFT_BENCH_E2E", "1") != "0"):
        _RECORD.update(_bench_e2e_train(
            max(min(_remaining() - 300, 900), 120)))
        _emit()

    # realistic-length device throughput (--tie-buckets payoff evidence):
    # reuses this process's trainer; compiles at most the two short bucket
    # shapes beyond the headline's full-length program
    if _remaining() > 150:
        _RECORD.update(_bench_realistic_length(trainer))
        if _RECORD.get("train_samples_per_sec_realistic"):
            _RECORD["vs_gpu_estimate_realistic"] = round(
                _RECORD["train_samples_per_sec_realistic"] / gpu_mid, 3)
        _emit()

    # in-process e2e (guaranteed loader+device wall-clock; zero new
    # compiles after the realistic stage — see docstring)
    if _remaining() > 60:
        _RECORD.update(_bench_e2e_inprocess(trainer))
        _emit()

    if _remaining() > 90:
        _RECORD.update(_verify_kernels())
        _emit()
    if _remaining() > 60:
        _RECORD.update(_bench_host_pipeline(BATCH))
        _emit()

    # H2D wire probe: e2e through the tunneled backend is bounded by the
    # host->device link, not by host assembly or device compute. Measure
    # the link rate and the actual post-wire-format bytes per batch so the
    # artifact itself explains (and bounds) the e2e number: the reference
    # ships ~40 MB/batch; the wire format (txt device table + uint8 packed
    # images, trainer._wire_resolve) cuts it to ~2.5 MB.
    if _remaining() > 45:
        try:
            # the actual wire batch 2_train ships per step at this shape
            # (txt_id + packed uint8 pixels, trainer.wire_pack)
            wire = trainer.wire_pack(dict(batch))
            wire_mb = sum(np.asarray(v).nbytes
                          for v in wire.values()) / 2 ** 20
            probe = np.random.default_rng(0).integers(
                0, 255, (4 << 20,), np.uint8)
            _h = jax.jit(lambda a: a[0])
            _ = int(_h(jax.device_put(probe)))   # compile + first ship
            best = float("inf")
            for _i in range(3):
                t0 = time.perf_counter()
                _ = int(_h(jax.device_put(probe)))
                best = min(best, time.perf_counter() - t0)
            bw = probe.nbytes / 2 ** 20 / best
            _RECORD.update({
                "h2d_mb_per_sec": round(bw, 1),
                "wire_bytes_per_batch_mb": round(wire_mb, 2),
                "e2e_h2d_bound_samples_per_sec": round(
                    BATCH / (wire_mb / bw), 1),
                "h2d_note": (
                    "tunneled backend: the host->device link (measured "
                    "h2d_mb_per_sec) bounds e2e training at "
                    "e2e_h2d_bound_samples_per_sec for the wire-format "
                    "batch (wire_bytes_per_batch_mb; the reference "
                    "streams ~40 MB/batch dense). On a directly-attached "
                    "TPU host the same traffic rides PCIe at GB/s and "
                    "e2e ~= min(host, device).")})
            _emit()
        except Exception:   # pragma: no cover
            pass

    try:
        calibrated_tflops = _calibrate_matmul_tflops()
        mfu = (model_flops / (best_dt / ITERS) / (calibrated_tflops * 1e12)
               if model_flops else None)
        _RECORD.update({
            "calibrated_matmul_tflops": round(calibrated_tflops, 1),
            "mfu_vs_calibrated": round(mfu, 3) if mfu is not None else None,
            "mfu_note": ("flops = XLA-equivalent step (incl. padding "
                         "compute the pallas kernels skip per-sample); "
                         "calibration shares the tunnel's external load, "
                         "so under load this ratio can exceed 1; "
                         "mfu_vs_unloaded_calibration uses the 96.5 "
                         "TFLOP/s unloaded chip calibration")})
        _emit()
    except Exception:
        pass

    # --train-multi-k super-batches (K optimizer steps per dispatch via
    # lax.scan, the wired 2_train default for TIE on TPU) amortize the
    # tunnel/host dispatch latency — report the amortized rate too.
    # opt-in: the scanned super-batch has its own multi-minute compile on
    # a loaded tunnel; measured 2026-08-17: 67.4 ms/step amortized (~= the
    # single-dispatch rate — the 66 ms step dwarfs dispatch latency)
    K = 4 if os.environ.get("GRAFT_BENCH_MULTI") else 0
    try:
        if not K or _remaining() < 240:
            raise RuntimeError("train-multi timing disabled")
        kbatch = jax.tree.map(
            lambda x: np.broadcast_to(np.asarray(x)[None],
                                      (K,) + np.asarray(x).shape),
            batch)
        from jax.sharding import NamedSharding, PartitionSpec as P
        kbatch = jax.device_put(
            kbatch, NamedSharding(trainer.mesh, P(None, "data")))
        losses = trainer.train_multi(kbatch, on_device=True)
        _ = float(losses[-1])
        best_multi = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(max(ITERS // K, 1)):
                losses = trainer.train_multi(kbatch, on_device=True)
            _ = float(losses[-1])
            best_multi = min(best_multi, time.perf_counter() - t0)
        multi_ms = best_multi / max(ITERS // K, 1) / K * 1000
        _RECORD.update({
            "train_multi_k4_step_ms": round(multi_ms, 1),
            "train_multi_k4_samples_per_sec_per_chip":
                round(BATCH / (multi_ms / 1000) / n_chips, 2)})
        _emit()
    except Exception:
        pass

    if ("e2e_samples_per_sec_warm" not in _RECORD
            or "e2e_inprocess_samples_per_sec_warm" not in _RECORD):
        # budget squeeze or loaded tunnel: carry the newest successful e2e
        # measurement (the pre-run BENCH_LKG.json snapshot — the live file
        # was already overwritten by this run's own emits) with explicit
        # provenance so the driver artifact still has the wall-clock
        # training numbers
        try:
            rec = _lkg_prev()
            prev = rec.get("record", {})
            if ("e2e_samples_per_sec_warm" not in _RECORD
                    and prev.get("e2e_samples_per_sec_warm") is not None):
                why = ("hit: " + str(_RECORD.get("e2e_error"))
                       if _RECORD.get("e2e_error")
                       else "had no budget left for the e2e stage")
                carried = {"e2e_samples_per_sec_warm":
                           prev["e2e_samples_per_sec_warm"]}
                # never clobber a cold number THIS run measured (e.g. the
                # subprocess timed out after epoch 1)
                if "e2e_samples_per_sec_cold" not in _RECORD:
                    carried["e2e_samples_per_sec_cold"] = prev.get(
                        "e2e_samples_per_sec_cold")
                carried["e2e_provenance"] = (
                    f"warm carried from the last successful run "
                    f"({rec.get('measured_at')}, git "
                    f"{rec.get('git_head')}); this run {why}")
                _RECORD.update(carried)
            # same carry for the in-process e2e evidence
            if ("e2e_inprocess_samples_per_sec_warm" not in _RECORD
                    and prev.get("e2e_inprocess_samples_per_sec_warm")
                    is not None):
                _RECORD.update({
                    "e2e_inprocess_samples_per_sec_warm":
                        prev["e2e_inprocess_samples_per_sec_warm"],
                    "e2e_inprocess_samples_per_sec_cold":
                        _RECORD.get("e2e_inprocess_samples_per_sec_cold",
                                    prev.get(
                                        "e2e_inprocess_samples_per_sec_cold")),
                    "e2e_inprocess_provenance": (
                        f"carried from the last successful run "
                        f"({rec.get('measured_at')}, git "
                        f"{rec.get('git_head')})")})
        except Exception:
            pass
    _emit()


if __name__ == "__main__":
    main()

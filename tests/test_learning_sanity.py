"""Learning-curve sanity on realistic data volume (VERDICT r2 weak #6):
train the vslt transformer for a few epochs on signal-bearing synthetic
fixtures (tools/make_synthetic_fixtures.py --signal 1: HR rises in the 8 h
before each intubation onset, so positive windows carry a local cue — a
window-max-HR linear probe scores AUROC ~0.84 on these fixtures) and assert
test AUROC ends well above chance. Catches silent optimizer/loss/masking
regressions that execution-only smoke runs cannot."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_auroc_learns_on_signal_fixtures(tmp_path):
    fix = tmp_path / "fixtures"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synthetic_fixtures.py"),
         "--out", str(fix), "--n-train", "120", "--n-test", "48",
         "--seed", "11", "--signal", "1.0"],
        check=True, capture_output=True, timeout=600)

    results = tmp_path / "results"
    (tmp_path / "data").mkdir(exist_ok=True)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "2_train.py"),
         "--input-types", "vslt", "--output-type", "intubation",
         "--model", "unimodal_transformer", "--vslt-type", "TIE",
         "--modality-inclusion", "train-missing_test-missing",
         "--transformer-num-layers", "2", "--transformer-dim", "64",
         "--transformer-num-head", "4", "--TIE-len", "256",
         "--train-data-path", str(fix / "train"),
         "--test-data-path", str(fix / "test"),
         "--dir-result", str(results), "--project-name", "sanity",
         "--batch-size", "16", "--num-workers", "2", "--epochs", "15",
         "--seed-list", "412", "--lr-init", "1e-3",
         # pinned: the assertion calibrates one exact SGD trajectory
         # (0.64 @ 10 epochs -> 0.85 @ 15), and the C++ assembler's
         # <=2e-5 float-assembly deltas (now the --worker-type auto
         # default; parity-tested in test_native_loader.py) are enough to
         # butterfly that endpoint on a 48-sample test AUROC
         "--worker-type", "thread",
         "--train-multi-k", "1"],
        capture_output=True, text=True, timeout=3600, cwd=str(tmp_path),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]

    # final test metrics are printed by Logger.test_result_only
    lines = [l for l in out.stdout.splitlines() if l.startswith("[test]")]
    assert lines, out.stdout[-2000:]
    auc = float(lines[-1].split("auc=")[1].split()[0])
    # the planted cue's linear-probe ceiling is ~0.84; anything >= 0.70
    # demonstrates real learning, chance is 0.50. 15 epochs on the CPU
    # trajectory measures 0.85 (10 epochs stops mid-learning at 0.64 —
    # the test historically passed at 10 only because the subprocess
    # silently ran on the TPU before 2_train honored JAX_PLATFORMS).
    assert auc >= 0.70, (auc, out.stdout[-1500:])

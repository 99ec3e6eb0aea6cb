"""CLI pin for the super-batch dispatch path (--train-multi-k > 1).

On TPU, 2_train auto-enables K=4 lax.scan super-batches with a
one-dispatch-deep loss drain (run_steps/drain_losses/flush_steps) — but
the CPU CI default is K=1, so nothing else in the suite executes the
drain's bookkeeping end-to-end. This forces K=2 on CPU and pins:

- the run completes with finite test metrics,
- NO iteration is lost: each epoch line reports the full cumulative
  iteration count (the drain holds one dispatch in flight and must flush
  it before the epoch closes — a dropped tail dispatch or an unflushed
  pipeline shows up here immediately),
- checkpoints exist (the epoch save runs after flush_steps).
"""
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_train_multi_k2_cli_iteration_accounting(tmp_path):
    fix = tmp_path / "fixtures"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synthetic_fixtures.py"),
         "--out", str(fix), "--n-train", "24", "--n-test", "8",
         "--seed", "7"],
        check=True, capture_output=True, timeout=600)
    results = tmp_path / "results"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "2_train.py"),
         "--input-types", "vslt_img_txt", "--output-type", "intubation",
         "--model", "tri_mbt_vsltcls", "--vslt-type", "TIE",
         "--modality-inclusion", "train-missing_test-missing",
         "--transformer-num-layers", "2", "--transformer-dim", "64",
         "--transformer-num-head", "2", "--TIE-len", "64",
         "--img-model-type", "resnet18", "--precision", "fp32",
         "--train-data-path", str(fix / "train"),
         "--test-data-path", str(fix / "test"),
         "--image-data-path", str(fix) + "/images/",
         "--biobert-path", str(fix / "mimic4_embeddings.h5"),
         "--dir-root", str(fix),
         "--dir-result", str(results), "--project-name", "multik",
         "--batch-size", "4", "--num-workers", "1", "--epochs", "2",
         "--seed-list", "412",
         # K=2 with an ODD dispatch count per epoch exercises both the
         # stacked scan path and the single-step tail inside run_steps
         "--train-multi-k", "2"],
        capture_output=True, text=True, timeout=1800, cwd=str(tmp_path),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]

    iters_m = re.search(r"# of Iterations \(per epoch\):\s+(\d+)",
                        out.stdout)
    assert iters_m, out.stdout[-2000:]
    per_epoch = int(iters_m.group(1))
    assert per_epoch > 0
    epochs = re.findall(r"epoch (\d+)/2 done \((\d+) iters", out.stdout)
    assert [e for e, _ in epochs] == ["1", "2"], out.stdout[-2000:]
    # cumulative count: the drain pipeline must flush every dispatch
    # (including the in-flight one and the odd tail) before the epoch ends
    assert [int(n) for _, n in epochs] == [per_epoch, 2 * per_epoch], epochs

    lines = [l for l in out.stdout.splitlines() if l.startswith("[test]")]
    assert lines and "auc=" in lines[-1], out.stdout[-2000:]
    ckpts = os.listdir(results / "multik" / "ckpts")
    assert any(c.startswith("best_") for c in ckpts), ckpts
    assert any(c.startswith("last_") for c in ckpts), ckpts

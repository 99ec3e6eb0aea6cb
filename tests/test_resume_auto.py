"""Kill-and-resume crash recovery: --resume auto discovers the newest
checkpoint (step-granular 'last' saves from --checkpoint-every, or the
per-eval 'best'/'last') and restores state + epoch + iteration without
operator flags — extending the reference's manual --checkpoint --best/--last
contract (/root/reference/2_train.py:86-107)."""
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARGV = [
    "--input-types", "vslt", "--output-type", "intubation",
    "--model", "unimodal_transformer", "--vslt-type", "TIE",
    "--modality-inclusion", "train-missing_test-missing",
    "--transformer-num-layers", "1", "--transformer-dim", "32",
    "--transformer-num-head", "2", "--TIE-len", "128",
    "--train-data-path", "/root/reference/data/sample_data/train",
    "--test-data-path", "/root/reference/data/sample_data/test",
    "--batch-size", "2", "--num-workers", "1", "--seed-list", "412",
    "--val-data-ratio", "0.3", "--checkpoint-every", "2",
    "--train-multi-k", "1", "--project-name", "resume_e2e",
]


def _run(extra, results_dir, kill_after_epoch=None, timeout=900):
    # -u: the kill trigger reads the child's stdout line-by-line through a
    # pipe; without it python block-buffers and "epoch N done" never arrives
    cmd = [sys.executable, "-u", os.path.join(REPO, "2_train.py")] + ARGV + [
        "--dir-result", results_dir] + extra
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONUNBUFFERED": "1"}
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, env=env,
                         cwd=results_dir)
    out = []
    t0 = time.time()
    for line in p.stdout:
        out.append(line)
        if kill_after_epoch and f"epoch {kill_after_epoch}/" in line:
            # crash mid-training: SIGKILL right after the epoch report, the
            # async step saves + epoch-level 'last' are already on disk
            p.kill()
            p.wait()
            return "".join(out), -signal.SIGKILL
        if time.time() - t0 > timeout:
            p.kill()
            p.wait()
            raise TimeoutError("".join(out)[-2000:])
    rc = p.wait(timeout=60)
    return "".join(out), rc


@pytest.mark.slow
def test_kill_and_resume_auto(tmp_path):
    results = str(tmp_path)
    (tmp_path / "data").mkdir(exist_ok=True)

    out1, rc1 = _run(["--epochs", "3"], results, kill_after_epoch=1)
    assert rc1 == -signal.SIGKILL
    ckpts = os.listdir(os.path.join(results, "resume_e2e", "ckpts"))
    assert any(c.startswith("last_") for c in ckpts), ckpts

    out2, rc2 = _run(["--epochs", "3", "--resume", "auto"], results)
    assert rc2 == 0, out2[-3000:]
    assert "resumed from" in out2, out2[-3000:]
    # restored mid-run: epoch > 0 and a nonzero iteration came back
    line = [l for l in out2.splitlines() if "resumed from" in l][0]
    assert "epoch 1" in line and "iteration 0" not in line, line
    assert "epoch 3/3 done" in out2, out2[-3000:]


@pytest.mark.slow
def test_resume_auto_noop_without_checkpoints(tmp_path):
    (tmp_path / "data").mkdir(exist_ok=True)
    out, rc = _run(["--epochs", "1", "--resume", "auto"], str(tmp_path))
    assert rc == 0, out[-3000:]
    assert "resumed from" not in out

"""Multi-host (multi-process) SPMD validation on CPU with gloo collectives.

The reference is single-process/single-GPU (SURVEY.md §5 "Distributed
communication backend": none); the framework's scale-out path is
``parallel.distributed.maybe_init_distributed`` + a global device mesh.
This test launches TWO OS processes, each with two virtual CPU devices,
rendezvoused via ``jax.distributed.initialize`` (gloo backend), builds the
4-device global 'data' mesh in each, runs one jitted train step + eval
step of the tiny tri-modal flagship on the identical global batch, and
asserts (a) both processes agree bit-for-bit and (b) the result matches a
plain single-process 4-device run — i.e. multi-host changes nothing but
the process layout.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys
import numpy as np
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
dist = sys.argv[4] == "dist"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d" % (
    2 if dist else 4)
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from medical_tri_modal_pilot_tpu.parallel.distributed import (
    maybe_init_distributed, is_primary)
from medical_tri_modal_pilot_tpu.config import parse_config
if dist:
    cfg0 = parse_config([
        "--input-types", "vslt_img_txt", "--output-type", "intubation",
        "--dist-coordinator", "localhost:" + port,
        "--dist-num-processes", str(n), "--dist-process-id", str(pid)])
    pidx, pcnt = maybe_init_distributed(cfg0)
    assert (pidx, pcnt) == (pid, n), (pidx, pcnt)
assert jax.device_count() == 4, jax.devices()

import __graft_entry__ as g
cfg = g._tiny_cfg(batch_size=8, trimodal=True).replace(dp_size=4)
if sys.argv[5] == "kern":
    # pallas kernels forced (interpret mode on CPU): the shard_map-wrapped
    # kernels must execute across PROCESS boundaries exactly as on the
    # single-process mesh. dropout=0 so in-kernel PRNG streams can't
    # differ between process layouts.
    cfg = cfg.replace(use_pallas=2, dropout=0.0)
batch = g._synthetic_batch(cfg, 8, seed=7)   # identical on every process
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.train.trainer import Trainer
trainer = Trainer(cfg, get_model(cfg), iters_per_epoch=4,
                  sample_batch=batch, seed=0)
loss = float(trainer.train_step(batch))
probs, eval_loss, _ = trainer.eval_step(batch)
out = {"pid": pid, "primary": is_primary(), "loss": loss,
       "eval_loss": float(eval_loss), "probs": np.asarray(probs).tolist()}
print("RESULT " + json.dumps(out), flush=True)
""".replace("{repo!r}", repr(REPO))


def _run_child(args, env):
    return subprocess.Popen([sys.executable, "-c", _CHILD, *args],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            env=env, cwd=REPO, text=True)


def _result(proc, timeout=600):
    out, _ = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, out[-4000:]
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError("no RESULT line in child output:\n" + out[-4000:])


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["xla", "kern"])
def test_two_process_mesh_matches_single_process(tmp_path, mode):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"

    with socket.socket() as s:                  # free rendezvous port
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    procs = [_run_child([str(i), "2", port, "dist", mode], env)
             for i in range(2)]
    single = _run_child(["0", "1", port, "single", mode], env)
    r0, r1 = (_result(p) for p in procs)
    rs = _result(single)

    assert r0["primary"] and not r1["primary"]
    # both processes computed the same replicated loss and gathered the
    # same full probability vector
    assert r0["loss"] == r1["loss"]
    assert r0["eval_loss"] == r1["eval_loss"]
    assert np.allclose(r0["probs"], r1["probs"], atol=0, rtol=0)
    assert len(r0["probs"]) == 8
    # and the 2-process x 2-device run equals the 1-process x 4-device run
    # (same mesh shape, same seeds — only the process layout differs;
    # cross-process reduction order may perturb the last float bits)
    assert abs(r0["loss"] - rs["loss"]) < 1e-5, (r0["loss"], rs["loss"])
    assert abs(r0["eval_loss"] - rs["eval_loss"]) < 1e-5
    assert np.allclose(r0["probs"], rs["probs"], atol=1e-5)

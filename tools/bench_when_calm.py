"""Watch the time-shared TPU tunnel and run bench.py in a calm window.

The tunnel's external load varies ~2x run-to-run (BASELINE_MEASURED.md);
step-time measurements taken under load undersell the framework. This
watcher probes the achievable matmul rate every --interval seconds (in a
subprocess, so a dead tunnel can't wedge the watcher) and, once the probe
clears --calm-frac of the unloaded calibration, runs the full benchmark
and appends its JSON line to --out. Exits after --max-hours regardless.

    python tools/bench_when_calm.py --out /tmp/bench_calm.jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> float:
    """unloaded_frac from tools/probe_load.py, or -1 on failure."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools/probe_load.py")],
            capture_output=True, text=True, timeout=300)
        for tok in (r.stdout or "").split():
            if tok.startswith("unloaded_frac="):
                return float(tok.split("=")[1])
    except Exception:
        pass
    return -1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bench_calm.jsonl")
    ap.add_argument("--interval", type=float, default=300.0)
    ap.add_argument("--calm-frac", type=float, default=0.85)
    ap.add_argument("--max-hours", type=float, default=6.0)
    ap.add_argument("--runs", type=int, default=1,
                    help="stop after this many successful bench runs")
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    done = 0
    while time.time() < deadline and done < args.runs:
        frac = probe()
        line = {"ts": time.time(), "unloaded_frac": frac}
        if frac >= args.calm_frac:
            r = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                capture_output=True, text=True, timeout=3600)
            tail = [ln for ln in (r.stdout or "").splitlines()
                    if ln.startswith("{")]
            line["bench"] = json.loads(tail[-1]) if tail else None
            line["rc"] = r.returncode
            if tail:
                done += 1
        with open(args.out, "a") as f:
            f.write(json.dumps(line) + "\n")
        print(json.dumps(line)[:200], flush=True)
        if done < args.runs:
            time.sleep(args.interval)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Probe the tunneled TPU's current achievable matmul rate.

The tunnel is time-shared; step-time measurements vary ~2x with external
load (BASELINE_MEASURED.md). This prints one line with the best-of-3
4096^3 bf16 matmul rate so bench runs can be scheduled into calm windows:

    python tools/probe_load.py        ->  "tflops=92.1 unloaded_frac=0.95"

Unloaded calibration for this chip: 96.5 TFLOP/s (BASELINE_MEASURED.md).
"""
import sys
import time

UNLOADED_TFLOPS = 96.5


def main() -> None:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("tflops=nan unloaded_frac=nan (no tpu backend)")
        return
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
    tflops = 10 * 2 * n ** 3 / best / 1e12
    print(f"tflops={tflops:.1f} unloaded_frac={tflops / UNLOADED_TFLOPS:.2f}")


if __name__ == "__main__":
    sys.exit(main())

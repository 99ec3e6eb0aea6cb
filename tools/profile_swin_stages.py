"""Per-piece swin timing on the real TPU: per-stage window-attention
(xla vs pallas), MLP, windowing transpose, roll. Informs kernel tuning."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

B = 64
DT = jnp.bfloat16


def bench(fn, *args, iters=20):
    o = fn(*args)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        _ = float(jax.tree.leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000


def main():
    from medical_tri_modal_pilot_tpu.kernels.swin_attention import (
        pallas_window_attention, xla_window_attention)
    from medical_tri_modal_pilot_tpu.models.swin import _shift_attn_mask

    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    stages = [(56, 96, 3, 2), (28, 192, 6, 2), (14, 384, 12, 6), (7, 768, 24, 2)]
    tot_x, tot_p = 0.0, 0.0
    for HW, C, nh, nblocks in stages:
        M = (HW // 7) ** 2
        I = B * M
        N = 49
        xw = jnp.asarray(rng.standard_normal((I, N, C)), DT)
        wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * .05, jnp.float32)
        bqkv = jnp.zeros(3 * C, jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((C, C)) * .05, jnp.float32)
        bproj = jnp.zeros(C, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((nh, N, N)) * .1, jnp.float32)
        smask = jnp.asarray(_shift_attn_mask(HW, HW, 7, 3)) if HW > 7 else None
        fx = jax.jit(lambda *a: xla_window_attention(*a, smask, nh))
        fp = jax.jit(lambda *a: pallas_window_attention(*a, smask, nh))
        tx = bench(fx, xw, wqkv, bqkv, wproj, bproj, bias)
        tp = bench(fp, xw, wqkv, bqkv, wproj, bproj, bias)
        print(f"stage HW={HW} C={C}: attn xla {tx:.2f} ms  pallas {tp:.2f} ms  (x{nblocks} blocks)")
        tot_x += tx * nblocks
        tot_p += tp * nblocks

        # MLP of this stage
        x = jnp.asarray(rng.standard_normal((B, HW, HW, C)), DT)
        w1 = jnp.asarray(rng.standard_normal((C, 4 * C)) * .05, DT)
        w2 = jnp.asarray(rng.standard_normal((4 * C, C)) * .05, DT)
        fm = jax.jit(lambda x: jax.nn.gelu(x @ w1, approximate=False) @ w2)
        print(f"  mlp: {bench(fm, x):.2f} ms")

        # windowing round-trip + roll
        def windows(x):
            Bb, H, W, Cc = x.shape
            nHW = H // 7
            y = x.reshape(Bb, nHW, 7, nHW, 7, Cc).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(Bb * nHW * nHW, 49, Cc)
            z = y.reshape(Bb, nHW, nHW, 7, 7, Cc).transpose(0, 1, 3, 2, 4, 5)
            return z.reshape(Bb, H, W, Cc)
        print(f"  window roundtrip: {bench(jax.jit(windows), x):.2f} ms   "
              f"roll: {bench(jax.jit(lambda x: jnp.roll(x, (3, 3), (1, 2))), x):.2f} ms")
    print(f"total attn: xla {tot_x:.1f} ms  pallas {tot_p:.1f} ms")


if __name__ == "__main__":
    main()

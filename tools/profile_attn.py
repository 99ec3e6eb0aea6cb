"""Micro-bench: fusion-stack attention fwd and fwd+bwd at bench shapes,
pallas vs XLA, on the real TPU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from medical_tri_modal_pilot_tpu.kernels.attention import pallas_masked_attention
from medical_tri_modal_pilot_tpu.models.modules import masked_softmax_attention

B, H, D = 64, 4, 64


def bench(fn, *args, iters=10):
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
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    for L, name in [(1005, "vslt"), (54, "img"), (130, "txt")]:
        q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
        lengths = rng.integers(L // 10, L, B)
        mask = jnp.asarray(np.arange(L)[None] >= lengths[:, None])  # [B, L]
        scale = float(np.sqrt(D))

        fp = jax.jit(lambda q, k, v, m: pallas_masked_attention(q, k, v, m, scale))
        fx = jax.jit(lambda q, k, v, m: masked_softmax_attention(q, k, v, m, scale))
        gp = jax.jit(jax.grad(lambda q, k, v, m: pallas_masked_attention(
            q, k, v, m, scale).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        gx = jax.jit(jax.grad(lambda q, k, v, m: masked_softmax_attention(
            q, k, v, m, scale).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        print(f"{name} L={L}: fwd pallas {bench(fp, q, k, v, mask):.2f} "
              f"xla {bench(fx, q, k, v, mask):.2f} | "
              f"grad pallas {bench(gp, q, k, v, mask):.2f} "
              f"xla {bench(gx, q, k, v, mask):.2f} ms")


if __name__ == "__main__":
    main()

"""Compiled-kernel parity verification on the *current default backend*.

Kernel unit tests run in Pallas interpret mode on CPU (conftest forces
CPU); Mosaic-compiled semantics on the real TPU can diverge from interpret
mode, and one silent regression there corrupts training. This tool runs
every production kernel COMPILED against its pure-XLA oracle at the real
model shapes — forward and backward — and returns max abs errors.

bench.py invokes ``verify_all`` on the real TPU in every benchmark run and
records the result in the bench JSON (VERDICT r2 "what's weak" #4).

Oracles (same math, plain jnp):
  flash attention  <- models/modules.masked_softmax_attention
  fused LN-FFN     <- kernels/ffn.xla_ffn
  swin window attn <- kernels/swin_attention.xla_window_attention
  swin MLP         <- kernels/swin_mlp.xla_swin_mlp

Usage:  python tools/verify_kernels_tpu.py          # prints one JSON line
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from medical_tri_modal_pilot_tpu.utils.compile_cache import \
    enable_compile_cache

# 24 compiled kernel+oracle cases; through a loaded tunnel each cold
# compile costs minutes — the persistent cache makes re-verification
# (every bench run) near-free (env-var route ignored by this jax build)
enable_compile_cache()

TOL = 2e-5   # f32 accumulation differences over 1024-key softmax rows


def _err(a, b) -> float:
    """max abs error scaled by the oracle's magnitude (weight-gradient sums
    over thousands of rows make raw abs error scale-dependent)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return float(jnp.max(jnp.abs(a - b)) /
                 jnp.maximum(1.0, jnp.max(jnp.abs(b))))


def _attention_cases():
    """(name, q, k, v, mask, scale, is_self) at flagship-like shapes."""
    rng = np.random.default_rng(0)
    B, H, Dh = 4, 4, 64
    L = 1024   # TIE-1000 padded to the q tile

    def qkv(lq, lk):
        return (jnp.asarray(rng.normal(0, 1, (B, lq, H, Dh)), jnp.float32),
                jnp.asarray(rng.normal(0, 1, (B, lk, H, Dh)), jnp.float32),
                jnp.asarray(rng.normal(0, 1, (B, lk, H, Dh)), jnp.float32))

    cases = []
    # 1. TIE self-attention: tail-contiguous per-sample lengths + skip path
    q, k, v = qkv(L, L)
    lens = np.array([37, 411, 1000, 640])
    m = jnp.asarray(np.arange(L)[None, :] >= lens[:, None])
    cases.append(("tie_self_skip", q, k, v, m, float(np.sqrt(Dh)), True))
    # 2. mid-sequence holes (early-fusion concat padding): cross-attn form
    holes = np.zeros((B, L), bool)
    holes[:, 300:512] = True
    holes[:, 900:] = True
    cases.append(("mid_hole_mask", q, k, v, jnp.asarray(holes),
                  float(np.sqrt(Dh)), False))
    # 3. vmulti 3-D block mask
    Lb = 256
    q3, k3, v3 = qkv(Lb, Lb)
    blk = np.zeros((B, Lb, Lb), bool)
    blk[:, :128, 128:] = True
    blk[:, 128:, :64] = True
    blk[:, :, 250:] = True
    cases.append(("vmulti_block_mask", q3, k3, v3, jnp.asarray(blk),
                  float(np.sqrt(Dh)), False))
    # 4. no mask
    cases.append(("unmasked", q3, k3, v3, None, float(np.sqrt(Dh)), False))
    return cases


def verify_attention() -> dict:
    from medical_tri_modal_pilot_tpu.kernels.attention import (
        pallas_masked_attention)
    from medical_tri_modal_pilot_tpu.models.modules import (
        masked_softmax_attention)
    out = {}
    for name, q, k, v, m, scale, is_self in _attention_cases():
        # dead q rows under is_self (masked everywhere as keys, read by
        # nothing downstream) are DON'T-CARE: the kernel zeroes whole
        # skipped q BLOCKS while XLA emits unused weighted averages.
        # Compare — and send cotangents — only through live rows, exactly
        # like the fusion encoder that consumes row 0 / valid tokens.
        live = (jnp.logical_not(m)[:, :, None, None].astype(jnp.float32)
                if (is_self and m is not None and m.ndim == 2) else 1.0)

        def make_loss(fn):
            def loss(q, k, v):
                o = fn(q, k, v, m, scale, is_self) * live
                return jnp.sum(o * jnp.cos(o.astype(jnp.float32))), o
            return loss

        gp, op = jax.jit(jax.grad(make_loss(pallas_masked_attention),
                                  argnums=(0, 1, 2), has_aux=True))(q, k, v)
        gx, ox = jax.jit(jax.grad(make_loss(masked_softmax_attention),
                                  argnums=(0, 1, 2), has_aux=True))(q, k, v)
        out[f"attn/{name}/fwd"] = _err(op, ox)
        out[f"attn/{name}/bwd"] = max(_err(a, b) for a, b in zip(gp, gx))
    return out


def verify_attn_block() -> dict:
    """Fused StdLN->qkv->flash->+residual block (kernels/attn_block.py)
    at the flagship vslt-stream shape, vs the unfused XLA composition.
    Dead q blocks emit the pure residual (documented deviation, unread
    downstream) — compared and cotangent-driven through live rows only."""
    from medical_tri_modal_pilot_tpu.kernels.attn_block import (
        pallas_attn_block, xla_attn_block)
    rng = np.random.default_rng(7)
    B, L, C, H = 4, 1024, 256, 4
    x = jnp.asarray(rng.normal(0, 1, (B, L, C)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1, 0.1, C), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, C), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.05, (3 * C,)), jnp.float32)
    lens = np.array([37, 411, 1000, 640])
    m = jnp.asarray(np.arange(L)[None, :] >= lens[:, None])
    # live q blocks at the kernel's 256-row q-tile granularity
    live_rows = np.zeros((B, L), np.float32)
    for i, n in enumerate(lens):
        live_rows[i, :((n - 1) // 256 + 1) * 256] = 1.0
    am = jnp.asarray(live_rows)[:, :, None]
    scale = float(np.sqrt(C // H))

    def run(fn):
        def loss(x, gamma, beta, w, b):
            o = fn(x, gamma, beta, w, b, m, scale, H) * am
            return jnp.sum(o * jnp.cos(o.astype(jnp.float32))), o
        return jax.jit(jax.grad(loss, argnums=tuple(range(5)),
                                has_aux=True))(x, gamma, beta, w, b)

    gp, op = run(pallas_attn_block)
    gx, ox = run(xla_attn_block)
    out = {"attn_block/fwd": _err(op, ox),
           "attn_block/bwd": max(_err(a, r) for a, r in zip(gp, gx))}

    # 3-D block mask (multitoken vmulti geometry): group-diagonal
    # attend-within-group plus the bottleneck group, every row live
    Lb = 256
    xb = jnp.asarray(rng.normal(0, 1, (B, Lb, C)), jnp.float32)
    g3 = np.minimum(np.arange(Lb) * 4 // Lb, 3)
    allow = (g3[:, None] == g3[None, :]) | (g3[None, :] == 0)
    m3 = jnp.asarray(np.broadcast_to(~allow, (B, Lb, Lb)))

    def run3(fn):
        def loss(x, gamma, beta, w, b):
            o = fn(x, gamma, beta, w, b, m3, scale, H)
            return jnp.sum(o * jnp.cos(o.astype(jnp.float32))), o
        return jax.jit(jax.grad(loss, argnums=tuple(range(5)),
                                has_aux=True))(xb, gamma, beta, w, b)

    gp3, op3 = run3(pallas_attn_block)
    gx3, ox3 = run3(xla_attn_block)
    out["attn_block/3d_fwd"] = _err(op3, ox3)
    out["attn_block/3d_bwd"] = max(_err(a, r) for a, r in zip(gp3, gx3))
    return out


def verify_ffn() -> dict:
    from medical_tri_modal_pilot_tpu.kernels.ffn import pallas_ffn, xla_ffn
    rng = np.random.default_rng(1)
    R, C, F = 2048, 256, 1024   # flagship d_model=256, d_ff=4x
    x = jnp.asarray(rng.normal(0, 1, (R, C)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1, 0.1, (C,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (C, F)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.05, (F,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (F, C)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.05, (C,)), jnp.float32)
    seed = jnp.zeros(2, jnp.int32)

    def run(fn):
        def loss(x, gamma, beta, w1, b1, w2, b2):
            o = fn(x, gamma, beta, w1, b1, w2, b2, p=0.1,
                   deterministic=True, seed=seed)
            return jnp.sum(o * jnp.cos(o.astype(jnp.float32))), o
        g, o = jax.jit(jax.grad(loss, argnums=tuple(range(7)),
                                has_aux=True))(x, gamma, beta, w1, b1, w2, b2)
        return g, o

    gp, op = run(pallas_ffn)
    gx, ox = run(xla_ffn)
    return {"ffn/fwd": _err(op, ox),
            "ffn/bwd": max(_err(a, b) for a, b in zip(gp, gx))}


def verify_rowmm() -> dict:
    from medical_tri_modal_pilot_tpu.kernels.rowmm import (
        pallas_rowskip_affine, xla_rowskip_affine)
    rng = np.random.default_rng(4)
    B, L, C = 8, 512, 256   # flagship fused-QKV shape (Cout = 3*d_model)
    x = jnp.asarray(rng.normal(0, 1, (B, L, C)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.05, (3 * C,)), jnp.float32)
    lens = rng.integers(1, L + 1, B)
    alive = np.arange(L)[None] < lens[:, None]
    bv = jnp.asarray(alive.reshape(B, L // 256, 256).any(-1), jnp.int32)
    am = jnp.asarray(alive[:, :, None], jnp.float32)

    def run(fn, bvv):
        def loss(x, w, b):
            o = fn(x, w, b, bvv) * am   # dead rows: zero cotangent
            return jnp.sum(o * jnp.cos(o.astype(jnp.float32))), o
        g, o = jax.jit(jax.grad(loss, argnums=(0, 1, 2),
                                has_aux=True))(x, w, b)
        return g, o

    gp, op = run(pallas_rowskip_affine, bv)
    gx, ox = run(xla_rowskip_affine, None)
    return {"rowmm/fwd": _err(op * am, ox * am),
            "rowmm/bwd": max(_err(a, r) for a, r in zip(gp, gx))}


def verify_rowmm_ln() -> dict:
    from medical_tri_modal_pilot_tpu.kernels.rowmm import (
        pallas_rowskip_ln_affine, xla_rowskip_ln_affine)
    rng = np.random.default_rng(11)
    B, L, C = 8, 512, 256
    x = jnp.asarray(rng.normal(0, 1, (B, L, C)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1, 0.1, C), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, C), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.05, (3 * C,)), jnp.float32)
    lens = rng.integers(1, L + 1, B)
    alive = np.arange(L)[None] < lens[:, None]
    bv = jnp.asarray(alive.reshape(B, L // 256, 256).any(-1), jnp.int32)
    am = jnp.asarray(alive[:, :, None], jnp.float32)

    def run(fn, bvv):
        def loss(x, gamma, beta, w, b):
            q, k, v = fn(x, gamma, beta, w, b, bvv)
            o = jnp.concatenate([q, k, v], axis=-1) * am
            return jnp.sum(o * jnp.cos(o.astype(jnp.float32))), o
        g, o = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4),
                                has_aux=True))(x, gamma, beta, w, b)
        return g, o

    gp, op = run(pallas_rowskip_ln_affine, bv)
    gx, ox = run(xla_rowskip_ln_affine, None)
    return {"rowmm_ln/fwd": _err(op * am, ox * am),
            "rowmm_ln/bwd": max(_err(a, r) for a, r in zip(gp, gx))}


def verify_swin() -> dict:
    from medical_tri_modal_pilot_tpu.kernels.swin_attention import (
        pallas_window_attention, xla_window_attention)
    from medical_tri_modal_pilot_tpu.kernels.swin_mlp import (
        pallas_swin_mlp, xla_swin_mlp)
    rng = np.random.default_rng(2)
    I, N, C, H = 128, 49, 96, 3   # stage-1 shape, B=2 images, 64 windows
    xw = jnp.asarray(rng.normal(0, 1, (I, N, C)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.float32)
    bqkv = jnp.asarray(rng.normal(0, 0.05, (3 * C,)), jnp.float32)
    wproj = jnp.asarray(rng.normal(0, 0.05, (C, C)), jnp.float32)
    bproj = jnp.asarray(rng.normal(0, 0.05, (C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (H, N, N)), jnp.float32)
    M = 64
    sm = np.zeros((M, N, N), bool)
    sm[1::2, :20, 20:] = True
    sm[1::2, 20:, :20] = True
    smask = jnp.asarray(sm)
    out = {}
    for name, mask in (("plain", None), ("shifted", smask)):
        def loss(fn, xw, wqkv, bqkv, wproj, bproj, bias):
            def f(xw, wqkv, bqkv, wproj, bproj, bias):
                o = fn(xw, wqkv, bqkv, wproj, bproj, bias, mask, H)
                return jnp.sum(o * jnp.cos(o.astype(jnp.float32))), o
            return jax.jit(jax.grad(f, argnums=tuple(range(6)),
                                    has_aux=True))(xw, wqkv, bqkv, wproj,
                                                   bproj, bias)
        gp, op = loss(pallas_window_attention, xw, wqkv, bqkv, wproj, bproj, bias)
        gx, ox = loss(xla_window_attention, xw, wqkv, bqkv, wproj, bproj, bias)
        out[f"swin_attn/{name}/fwd"] = _err(op, ox)
        out[f"swin_attn/{name}/bwd"] = max(_err(a, b) for a, b in zip(gp, gx))

    sc = jnp.asarray(rng.normal(1, 0.1, (C,)), jnp.float32)
    bb = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (C, 4 * C)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.05, (4 * C,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (4 * C, C)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.05, (C,)), jnp.float32)

    def mlp_loss(fn, *a):
        def f(*a):
            o = fn(*a)
            return jnp.sum(o * jnp.cos(o.astype(jnp.float32))), o
        return jax.jit(jax.grad(f, argnums=tuple(range(7)), has_aux=True))(*a)

    x2 = xw.reshape(-1, C)   # kernel operates on flattened [rows, C]
    gp, op = mlp_loss(pallas_swin_mlp, x2, sc, bb, w1, b1, w2, b2)
    gx, ox = mlp_loss(xla_swin_mlp, x2, sc, bb, w1, b1, w2, b2)
    out["swin_mlp/fwd"] = _err(op, ox)
    out["swin_mlp/bwd"] = max(_err(a, b) for a, b in zip(gp, gx))
    return out


def verify_all(tol: float = TOL) -> dict:
    """Run every kernel-vs-oracle comparison; returns
    {"pass": bool, "tol": tol, "backend": ..., "max_err": float,
     "errors": {case: err}}."""
    with jax.default_matmul_precision("highest"):
        errors = {}
        errors.update(verify_attention())
        errors.update(verify_attn_block())
        errors.update(verify_ffn())
        errors.update(verify_rowmm())
        errors.update(verify_rowmm_ln())
        errors.update(verify_swin())
    mx = max(errors.values())
    return {"pass": bool(mx <= tol), "tol": tol,
            "backend": jax.default_backend(),
            "interpret_mode": jax.default_backend() != "tpu",
            "max_err": mx,
            "errors": {k: round(v, 9) for k, v in errors.items()}}


if __name__ == "__main__":
    res = verify_all()
    print(json.dumps(res))
    sys.exit(0 if res["pass"] else 1)

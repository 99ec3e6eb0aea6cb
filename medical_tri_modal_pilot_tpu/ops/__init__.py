"""Compute-op dispatch: selects the Pallas fused kernels or the XLA
reference implementations for the model hot loops.

Multi-chip: a ``pallas_call`` is an opaque custom call XLA's SPMD
partitioner cannot split — left bare, every kernel operand is ALL-GATHERED
onto each device (measured: 19 all-gathers for one attention on an 8-way
data mesh). ``configure(mesh=...)`` therefore wraps each kernel in
``shard_map`` so it runs on the local shard:

  * flash attention   in/out [B, L, H, Dh] -> P(data, None, model, None)
                      (heads are embarrassingly parallel — the natural
                      tensor-parallel split; no collectives inside)
  * fused LN-FFN      [B, L, C] -> P(data); per-shard dropout seeds are
                      decorrelated by folding in axis_index. Under
                      --mp-size > 1 the FFN keeps the plain-XLA path so
                      SPMD partitions its matmuls over 'model' (the fused
                      kernel would force the w1/w2 shards back together).
  * swin window attn  [I, N, C] -> P(data) on the window-instance dim
  * swin MLP          [R, C]   -> P(data)
  * UMSE stem         [B, L, 3]-> P(data)

Every wrapper falls back to the unwrapped kernel when the leading dim does
not divide the mesh axis (e.g. the presence-packed swin trunk's cap+1
rows) — correct, just not partitioned.
"""
from __future__ import annotations

from typing import Optional

from ..models import modules as _modules
from ..models import swin as _swin
from ..models import umse as _umse


# trace-time fallback counter: each shard_map wrapper increments this when
# a shape misalignment forces the bare (unpartitionable) pallas_call, whose
# operands XLA SPMD can only all-gather. Tests assert it stays 0 on the
# flagship multi-chip path (dp-aligned packing keeps every leading dim a
# multiple of the data axis).
_MESH_FALLBACKS = 0


def _note_mesh_fallback(name: str) -> None:
    global _MESH_FALLBACKS
    _MESH_FALLBACKS += 1


def reset_mesh_fallback_count() -> None:
    global _MESH_FALLBACKS
    _MESH_FALLBACKS = 0


def mesh_fallback_count() -> int:
    return _MESH_FALLBACKS


def _shard_map_compat():
    """``jax.shard_map`` (jax >= 0.6, ``check_vma=``) with a fallback to the
    pre-promotion ``jax.experimental.shard_map`` (``check_rep=``) so the
    kernel dispatch layer survives on either side of the upstream rename.
    Replication checking stays off either way: the kernel wrappers
    intentionally pass replicated weights into per-shard bodies."""
    import jax
    if hasattr(jax, "shard_map"):
        def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
            return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=check_rep)
        return shard_map
    from jax.experimental.shard_map import shard_map
    return shard_map


def _wrap_pallas_for_mesh(mesh):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P
    shard_map = _shard_map_compat()

    from ..kernels.attention import pallas_masked_attention
    from ..kernels.attn_block import pallas_attn_block
    from ..kernels.ffn import pallas_ffn
    from ..kernels.rowmm import (pallas_rowskip_affine,
                                 pallas_rowskip_ln_affine)
    from ..kernels.swin_attention import pallas_window_attention
    from ..kernels.swin_mlp import pallas_swin_mlp
    from ..kernels.umse import pallas_umse
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    dp = mesh.shape[DATA_AXIS]
    mp = mesh.shape.get(MODEL_AXIS, 1)

    def attn_block(x, gamma, beta, w, b, key_mask, scale, num_heads):
        if x.shape[0] % dp != 0:
            _note_mesh_fallback("attn_block")
            return pallas_attn_block(x, gamma, beta, w, b, key_mask,
                                     scale, num_heads)
        B, L, _ = x.shape
        if key_mask is None:
            key_mask = jnp.zeros((B, L), bool)
        xs = P(DATA_AXIS, None, None)
        ms = P(DATA_AXIS, None) if key_mask.ndim == 2 \
            else P(DATA_AXIS, None, None)

        def body(x, gamma, beta, w, b, m):
            return pallas_attn_block(x, gamma, beta, w, b, m, scale,
                                     num_heads)

        return shard_map(
            body, mesh=mesh,
            in_specs=(xs, P(None), P(None), P(None, None), P(None), ms),
            out_specs=xs, check_rep=False)(x, gamma, beta, w, b, key_mask)

    def attention(q, k, v, key_mask, scale, is_self=False):
        B, _, H, _ = q.shape
        if B % dp != 0 or (mp > 1 and H % mp != 0):
            _note_mesh_fallback("attention")
            return pallas_masked_attention(q, k, v, key_mask, scale, is_self)
        hax = MODEL_AXIS if mp > 1 else None
        qs = P(DATA_AXIS, None, hax, None)
        if key_mask is None:
            key_mask = jnp.zeros((B, k.shape[1]), bool)
        ms = P(DATA_AXIS, None) if key_mask.ndim == 2 \
            else P(DATA_AXIS, None, None)

        def body(q, k, v, m):
            return pallas_masked_attention(q, k, v, m, scale, is_self)

        return shard_map(body, mesh=mesh, in_specs=(qs, qs, qs, ms),
                         out_specs=qs, check_rep=False)(q, k, v, key_mask)

    def ffn(x, gamma, beta, w1, b1, w2, b2, *, p, deterministic, seed,
            block_valid=None):
        if x.shape[0] % dp != 0:
            _note_mesh_fallback("ffn")
            return pallas_ffn(x, gamma, beta, w1, b1, w2, b2, p=p,
                              deterministic=deterministic, seed=seed,
                              block_valid=block_valid)
        if seed is None:
            seed = jnp.zeros(2, jnp.int32)
        xs = P(*([DATA_AXIS] + [None] * (x.ndim - 1)))
        wspecs = (P(None), P(None), P(None, None), P(None), P(None, None),
                  P(None), P(None))

        if block_valid is None:
            def body0(x, gamma, beta, w1, b1, w2, b2, seed):
                # decorrelate in-kernel dropout across data shards
                seed = seed + jax.lax.axis_index(DATA_AXIS)
                return pallas_ffn(x, gamma, beta, w1, b1, w2, b2, p=p,
                                  deterministic=deterministic, seed=seed)
            return shard_map(
                body0, mesh=mesh, in_specs=(xs,) + wspecs,
                out_specs=xs, check_rep=False)(
                    x, gamma, beta, w1, b1, w2, b2, seed)

        def body(x, gamma, beta, w1, b1, w2, b2, seed, bv):
            seed = seed + jax.lax.axis_index(DATA_AXIS)
            return pallas_ffn(x, gamma, beta, w1, b1, w2, b2, p=p,
                              deterministic=deterministic, seed=seed,
                              block_valid=bv)

        return shard_map(
            body, mesh=mesh,
            in_specs=(xs,) + wspecs + (P(DATA_AXIS, None),),
            out_specs=xs, check_rep=False)(
                x, gamma, beta, w1, b1, w2, b2, seed, block_valid)

    def qkv_affine(x, w, b, block_valid):
        if x.ndim != 3 or x.shape[0] % dp != 0 or block_valid is None:
            if block_valid is not None:   # None = legitimate plain path
                _note_mesh_fallback("qkv_affine")
            return pallas_rowskip_affine(x, w, b, block_valid)
        xs = P(DATA_AXIS, None, None)
        ys = P(DATA_AXIS, None, None)
        return shard_map(
            pallas_rowskip_affine, mesh=mesh,
            in_specs=(xs, P(None, None), P(None), P(DATA_AXIS, None)),
            out_specs=ys, check_rep=False)(x, w, b, block_valid)

    def qkv_ln_affine(x, gamma, beta, w, b, block_valid):
        if x.ndim != 3 or x.shape[0] % dp != 0 or block_valid is None:
            if block_valid is not None:
                _note_mesh_fallback("qkv_ln_affine")
            return pallas_rowskip_ln_affine(x, gamma, beta, w, b, block_valid)
        xs = P(DATA_AXIS, None, None)
        ys = P(DATA_AXIS, None, None)
        return shard_map(
            pallas_rowskip_ln_affine, mesh=mesh,
            in_specs=(xs, P(None), P(None), P(None, None), P(None),
                      P(DATA_AXIS, None)),
            out_specs=(ys, ys, ys), check_rep=False)(
                x, gamma, beta, w, b, block_valid)

    def window_attention(xw, wqkv, bqkv, wproj, bproj, bias, smask,
                         num_heads):
        M = 1 if smask is None else smask.shape[0]
        # instance i uses smask[i % M]: splitting I over dp keeps the
        # modular indexing aligned only when the per-shard count is a
        # multiple of M (always true for whole images per shard)
        if xw.shape[0] % (dp * M) != 0:
            _note_mesh_fallback("window_attention")
            return pallas_window_attention(xw, wqkv, bqkv, wproj, bproj,
                                           bias, smask, num_heads)
        xs = P(DATA_AXIS, None, None)

        def body(xw, wqkv, bqkv, wproj, bproj, bias, smask):
            return pallas_window_attention(xw, wqkv, bqkv, wproj, bproj,
                                           bias, smask, num_heads)

        if smask is None:
            def body2(xw, wqkv, bqkv, wproj, bproj, bias):
                return pallas_window_attention(xw, wqkv, bqkv, wproj, bproj,
                                               bias, None, num_heads)
            return shard_map(
                body2, mesh=mesh,
                in_specs=(xs, P(None, None), P(None), P(None, None), P(None),
                          P(None, None, None)),
                out_specs=xs, check_rep=False)(
                    xw, wqkv, bqkv, wproj, bproj, bias)
        return shard_map(
            body, mesh=mesh,
            in_specs=(xs, P(None, None), P(None), P(None, None), P(None),
                      P(None, None, None), P(None, None, None)),
            out_specs=xs, check_rep=False)(
                xw, wqkv, bqkv, wproj, bproj, bias, smask)

    def swin_mlp(x, scale, bias, w1, b1, w2, b2):
        if x.shape[0] % dp != 0:
            _note_mesh_fallback("swin_mlp")
            return pallas_swin_mlp(x, scale, bias, w1, b1, w2, b2)
        xs = P(DATA_AXIS, None)
        return shard_map(
            pallas_swin_mlp, mesh=mesh,
            in_specs=(xs, P(None), P(None), P(None, None), P(None),
                      P(None, None), P(None)),
            out_specs=xs, check_rep=False)(x, scale, bias, w1, b1, w2, b2)

    def umse(x, wv, bv, sv, bbv, wt, bt, st, bbt, feat_emb, dtype):
        if x.shape[0] % dp != 0:
            _note_mesh_fallback("umse")
            return pallas_umse(x, wv, bv, sv, bbv, wt, bt, st, bbt,
                               feat_emb, dtype)
        xs = P(DATA_AXIS, None, None)

        def body(x, wv, bv, sv, bbv, wt, bt, st, bbt, feat_emb):
            return pallas_umse(x, wv, bv, sv, bbv, wt, bt, st, bbt,
                               feat_emb, dtype)

        w2 = P(None, None)
        w1 = P(None)
        return shard_map(
            body, mesh=mesh,
            in_specs=(xs, w2, w1, w1, w1, w2, w1, w1, w1, w2),
            out_specs=xs, check_rep=False)(
                x, wv, bv, sv, bbv, wt, bt, st, bbt, feat_emb)

    return (attention, ffn, qkv_affine, qkv_ln_affine, window_attention,
            swin_mlp, umse, attn_block)


def configure(use_pallas: bool, mesh=None) -> None:
    """Select kernel implementations. ``mesh``: when given and it has more
    than one device, pallas kernels are shard_map-wrapped so SPMD never
    all-gathers their operands (module docstring), and the packed-swin
    trunk aligns its static row count to the data axis so those wrappers
    never hit their unpartitioned fallback."""
    from ..parallel.mesh import DATA_AXIS as _DA
    _modules.set_pack_alignment(
        mesh.shape.get(_DA, 1) if mesh is not None and mesh.devices.size > 1
        else 1)
    if use_pallas:
        from ..kernels.attention import pallas_masked_attention
        from ..kernels.ffn import pallas_ffn
        from ..kernels.swin_attention import pallas_window_attention
        from ..kernels.swin_mlp import pallas_swin_mlp
        from ..kernels.umse import pallas_umse
        from ..parallel.mesh import MODEL_AXIS

        multi = mesh is not None and mesh.devices.size > 1
        if multi:
            (attention, ffn, qkv_affine, qkv_ln_affine, window_attention,
             swin_mlp, umse, attn_block) = _wrap_pallas_for_mesh(mesh)
            _modules.set_attention_impl(attention)
            # bare (non-LN) row-skip projections measured SLOWER than plain
            # XLA matmuls (58 vs 55 ms/step: the skip saves fewer flops than
            # the lost XLA fusion costs) — only the LN-fused variant, which
            # also removes the pre-norm HBM round-trip, pays for itself
            _modules.set_qkv_impl(None)
            _modules.set_qkv_ln_impl(qkv_ln_affine)
            if mesh.shape.get(MODEL_AXIS, 1) > 1:
                # plain XLA FFN: SPMD shards its matmuls over 'model'
                # (parallel/mesh._tp_spec); the fused kernel would force
                # the w1/w2 shards back together. Same for the fused
                # attention block, whose qkv weights shard over 'model'.
                _modules.set_ffn_impl(None)
                _modules.set_attn_block_impl(None)
            else:
                _modules.set_ffn_impl(ffn)
                _modules.set_attn_block_impl(attn_block)
            _swin.set_window_attention_impl(window_attention)
            _swin.set_swin_mlp_impl(swin_mlp)
            _umse.set_umse_impl(umse)
        else:
            from ..kernels.attn_block import pallas_attn_block
            from ..kernels.rowmm import pallas_rowskip_ln_affine
            _modules.set_attention_impl(pallas_masked_attention)
            _modules.set_qkv_impl(None)   # see the multi-branch comment
            _modules.set_qkv_ln_impl(pallas_rowskip_ln_affine)
            _modules.set_attn_block_impl(pallas_attn_block)
            _modules.set_ffn_impl(pallas_ffn)
            _swin.set_window_attention_impl(pallas_window_attention)
            _swin.set_swin_mlp_impl(pallas_swin_mlp)
            _umse.set_umse_impl(pallas_umse)
    else:
        from ..kernels.swin_attention import xla_window_attention
        from ..kernels.swin_mlp import xla_swin_mlp
        from ..kernels.umse import xla_umse
        _modules.set_attention_impl(_modules.masked_softmax_attention)
        _modules.set_qkv_impl(None)
        _modules.set_qkv_ln_impl(None)
        _modules.set_attn_block_impl(None)
        _modules.set_ffn_impl(None)
        _swin.set_window_attention_impl(xla_window_attention)
        _swin.set_swin_mlp_impl(xla_swin_mlp)
        _umse.set_umse_impl(xla_umse)


def current_attention_impl():
    return _modules.get_attention_impl()

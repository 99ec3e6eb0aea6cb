"""Transformer primitives (flax.linen), numerically faithful to the
reference's nonstandard details:

* ``StdLayerNorm`` normalizes by the *standard deviation with Bessel's
  correction* and adds eps to the std, not the variance — numerically
  different from nn.LayerNorm (reference module.py:130-144).
* attention scores are masked with -65504 (fp16-safe min) before softmax
  (attention.py:35-41); fully-masked rows therefore softmax to uniform.
* ``MultiHeadAttention`` has NO output projection — heads are concatenated
  and returned directly (attention.py:65-84).
* the FFN is the "conv1x1" variant: relu(W1 x) -> drop -> W2 -> drop
  (module.py:57-80); a 1x1 Conv1d over tokens == per-token Dense.
* q/k/v projections use xavier-uniform weights + zero bias
  (module.py:113-127).
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..constants import MASK_FILL_VALUE

Dtype = jnp.dtype

xavier_dense = lambda feats, name=None, dtype=jnp.float32: nn.Dense(
    feats, kernel_init=nn.initializers.xavier_uniform(),
    bias_init=nn.initializers.zeros, name=name, dtype=dtype)


class LayerNorm(nn.LayerNorm):
    """``nn.LayerNorm`` with torch's default epsilon.

    flax defaults to 1e-6 where torch.nn.LayerNorm uses 1e-5. On ordinary
    activations the difference is invisible (~1e-4), but on near-zero-
    variance vectors the epsilon dominates the rsqrt: the barely-trained
    ``cls_tokens`` (var ~1e-8) normalizes 3.16x too large under 1e-6,
    shifting every downstream logit (found via tools/golden_parity.py).
    Every reference site that uses the *torch builtin* LN maps to this
    class; sites using the reference's custom std-based LN
    (transformer/module.py:130, eps 1e-6) map to StdLayerNorm below."""
    epsilon: float = 1e-5


class StdLayerNorm(nn.Module):
    """(x - mean) / (std + eps) * gamma + beta, std with Bessel correction.

    Params live in setup() so ``scales()`` can hand them to fused kernels
    (kernels/ffn.py) without running the XLA computation; the param tree
    is identical either way."""
    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    def setup(self):
        self.gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        self.beta = self.param("beta", nn.initializers.zeros, (self.dim,))

    def scales(self):
        return self.gamma, self.beta

    def __call__(self, x):
        return stdln_apply(x, self.gamma, self.beta, self.dtype, self.eps)


def stdln_apply(x, gamma, beta, dtype, eps: float = 1e-6):
    """StdLayerNorm math as a function (shared by the module and the
    MultiHeadAttention prenorm fall-back path)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    n = xf.shape[-1]
    var = jnp.sum((xf - mean) ** 2, axis=-1, keepdims=True) / (n - 1)
    # tiny floor keeps the backward finite at zero variance (torch's
    # std backward yields 0 there; bare sqrt(0) would give inf*0=NaN)
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    out = (xf - mean) / (std + eps) * gamma + beta
    return out.astype(dtype)


import functools as _functools
import numpy as _np


@_functools.lru_cache(maxsize=32)
def _pe_table(length: int, d_model: int) -> _np.ndarray:
    # host-side constant (numpy, f32 like the torch buffer) — XLA's f32 sin
    # loses ~1e-4 at large arguments, the host libm doesn't
    position = _np.arange(length, dtype=_np.float32)[:, None]
    div_term = _np.exp(_np.arange(0, d_model, 2, dtype=_np.float32)
                       * -(math.log(10000.0) / d_model)).astype(_np.float32)
    angles = position * div_term
    pe = _np.zeros((length, d_model), dtype=_np.float32)
    pe[:, 0::2] = _np.sin(angles)
    pe[:, 1::2] = _np.cos(angles)
    return pe[None]


def positional_encoding(length: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal PE table [1, length, d_model] (module.py:11-32)."""
    return jnp.asarray(_pe_table(length, d_model), dtype=dtype)


def length_key_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """bool [B, L]; True = key position masked (>= per-sample length).
    Replaces the reference's python-loop mask builder
    (transformer/utils.py:79-94) with a broadcasted iota compare."""
    iota = jnp.arange(max_len)[None, :]
    return iota >= lengths[:, None]


def masked_softmax_attention(q, k, v, key_mask: Optional[jnp.ndarray],
                             scale: float,
                             is_self: bool = False) -> jnp.ndarray:
    """[B, Lq, H, Dh] x [B, Lk, H, Dh] with an optional bool mask: either a
    key-pad mask [B, Lk] or a full [B, Lq, Lk] block mask (the multitoken
    MBT variants use hand-built block masks, mbt_encoder.py:381-423).

    The head axis deliberately sits NEXT TO the feature axis (the natural
    output layout of the qkv projections) — a [B, H, L, Dh] interface
    would force a real transpose copy on both sides of every fused-kernel
    call (measured ~2 ms/step at the flagship shape).

    XLA reference path; the Pallas fused kernel (kernels/attention.py) is a
    drop-in replacement selected by ops dispatch.
    """
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / scale
    if key_mask is not None:
        if key_mask.ndim == 2:
            scores = jnp.where(key_mask[:, None, None, :], MASK_FILL_VALUE,
                               scores)
        else:
            scores = jnp.where(key_mask[:, None, :, :], MASK_FILL_VALUE,
                               scores)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


# set by ops dispatch; see medical_tri_modal_pilot_tpu/ops/__init__.py
_ATTENTION_IMPL: Callable = masked_softmax_attention


def set_attention_impl(fn: Callable) -> None:
    global _ATTENTION_IMPL
    _ATTENTION_IMPL = fn


def get_attention_impl() -> Callable:
    return _ATTENTION_IMPL


# set by ops dispatch: row-block-skipped affine (kernels/rowmm.py) for the
# q/k/v projections over length-padded self-attention streams, or None for
# plain XLA matmuls
_QKV_IMPL: Optional[Callable] = None

# set by ops dispatch: the LN-fused variant (StdLN folded into the same
# row-block pass) used when the caller hands the attention pre-norm scales
_QKV_LN_IMPL: Optional[Callable] = None


def set_qkv_impl(fn) -> None:
    global _QKV_IMPL
    _QKV_IMPL = fn


def set_qkv_ln_impl(fn) -> None:
    global _QKV_LN_IMPL
    _QKV_LN_IMPL = fn


# set by ops dispatch: the fully fused attention block (kernels/attn_block
# .py — StdLN -> qkv -> flash attention -> +residual in one kernel, q/k/v
# never leaving VMEM), used for self-attention with 2-D key masks when the
# caller hands both the pre-norm scales and the residual stream
_ATTN_BLOCK_IMPL: Optional[Callable] = None


def set_attn_block_impl(fn) -> None:
    global _ATTN_BLOCK_IMPL
    _ATTN_BLOCK_IMPL = fn


# set by ops dispatch when a multi-device mesh is configured: static
# leading-dim alignment (the data-axis size). The presence-packed swin
# trunk rounds its packed row count (cap+1) up to a multiple of this so
# the shard_map'd kernels keep their partitioned fast path — an unaligned
# row count falls back to the bare pallas_call, which XLA's SPMD
# partitioner can only handle by ALL-GATHERING every operand
# (ops/__init__.py docstring).
_PACK_ALIGN: int = 1


def set_pack_alignment(n: int) -> None:
    global _PACK_ALIGN
    _PACK_ALIGN = max(int(n), 1)


def get_pack_alignment() -> int:
    return _PACK_ALIGN


class _XavierParams(nn.Module):
    """nn.Dense-shaped params ({kernel, bias}, xavier/zeros init) exposed
    raw — same tree and init as ``xavier_dense`` so checkpoints are
    interchangeable between the fused and plain projection paths."""
    fin: int
    fout: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                                 (self.fin, self.fout))
        self.bias = self.param("bias", nn.initializers.zeros, (self.fout,))

    def __call__(self):
        return self.kernel, self.bias


class MultiHeadAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_mask: Optional[jnp.ndarray] = None,
                 prenorm: Optional[tuple] = None,
                 residual: Optional[jnp.ndarray] = None):
        """``prenorm``: optional (gamma, beta) StdLayerNorm scales. When
        given, query/key/value are the RAW residual stream (must be the
        same array) and the pre-norm is applied here — fused into the
        projection kernel when available, as a separate XLA StdLN
        otherwise. Lets TransformerEncoderLayer skip the standalone
        pre-norm HBM round-trip without changing the param tree.

        ``residual``: optional stream to add to the attention output
        (the encoder layer's residual connection). Handing it in lets the
        fully fused attention-block kernel (kernels/attn_block.py) fold
        the add into its epilogue; on every other path it is an ordinary
        XLA add here — math identical either way."""
        d_head = self.dim // self.num_heads
        B, Lq, _ = query.shape
        Lk = key.shape[1]
        dt = self.dtype
        wq, bq = _XavierParams(query.shape[-1], self.dim, name="query_proj")()
        wk, bk = _XavierParams(key.shape[-1], self.dim, name="key_proj")()
        wv, bv_ = _XavierParams(value.shape[-1], self.dim, name="value_proj")()
        is_self = query is key and key is value
        blocks = _ffn_row_blocks(query, key_mask) if is_self else None
        if prenorm is not None:
            if not is_self:
                raise ValueError("prenorm requires query is key is value")
            gamma, beta = prenorm
            if _ATTN_BLOCK_IMPL is not None and residual is not None \
                    and residual is query:
                wcat = jnp.concatenate([wq, wk, wv], axis=1).astype(dt)
                bcat = jnp.concatenate([bq, bk, bv_]).astype(dt)
                return _ATTN_BLOCK_IMPL(query.astype(dt), gamma, beta,
                                        wcat, bcat, key_mask,
                                        math.sqrt(d_head), self.num_heads)
            if _QKV_LN_IMPL is not None and blocks is not None:
                wcat = jnp.concatenate([wq, wk, wv], axis=1).astype(dt)
                bcat = jnp.concatenate([bq, bk, bv_]).astype(dt)
                q, k, v = _QKV_LN_IMPL(query.astype(dt), gamma, beta,
                                       wcat, bcat, blocks)
                q = q.reshape(B, Lq, self.num_heads, d_head)
                k = k.reshape(B, Lk, self.num_heads, d_head)
                v = v.reshape(B, Lk, self.num_heads, d_head)
                ctx = _ATTENTION_IMPL(q, k, v, key_mask, math.sqrt(d_head),
                                      is_self=True)
                out = ctx.reshape(B, Lq, self.dim)
                return out if residual is None else out + residual
            query = key = value = stdln_apply(query, gamma, beta, dt)
        if _QKV_IMPL is not None and blocks is not None:
            # one fused row-block-skipped matmul for all three projections:
            # padded rows (masked keys/dead queries) pay no projection flops
            wcat = jnp.concatenate([wq, wk, wv], axis=1).astype(dt)
            bcat = jnp.concatenate([bq, bk, bv_]).astype(dt)
            qkv = _QKV_IMPL(query.astype(dt), wcat, bcat, blocks)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = query.astype(dt) @ wq.astype(dt) + bq.astype(dt)
            k = key.astype(dt) @ wk.astype(dt) + bk.astype(dt)
            v = value.astype(dt) @ wv.astype(dt) + bv_.astype(dt)
        # [B, L, H, Dh] — no head transpose; the attention impls take the
        # head axis in place (see masked_softmax_attention docstring)
        q = q.reshape(B, Lq, self.num_heads, d_head)
        k = k.reshape(B, Lk, self.num_heads, d_head)
        v = v.reshape(B, Lk, self.num_heads, d_head)
        # is_self: q/k/v from the same stream — lets the fused kernel skip
        # dead q rows past each sample's valid length (kernels/attention.py)
        ctx = _ATTENTION_IMPL(q, k, v, key_mask, math.sqrt(d_head),
                              is_self=query is key)
        out = ctx.reshape(B, Lq, self.dim)
        return out if residual is None else out + residual


class _LinearParams(nn.Module):
    """Param holder matching nn.Dense's tree ({kernel, bias}) and default
    init (lecun_normal/zeros) — lets FeedForward expose raw weights to the
    fused FFN kernel while keeping checkpoints interchangeable."""
    fin: int
    fout: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.fin, self.fout))
        self.bias = self.param("bias", nn.initializers.zeros, (self.fout,))

    def __call__(self):
        return self.kernel, self.bias


class FeedForward(nn.Module):
    """relu(W1 x) -> drop -> W2 -> drop (FeedForwardUseConv, module.py:74-80).
    Conv1d with kernel 1 == Dense; torch Conv1d default init is
    kaiming-uniform — Dense default init is fine for a re-train."""
    d_model: int
    d_ff: int
    dropout_p: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.w_1 = _LinearParams(self.d_model, self.d_ff)
        self.w_2 = _LinearParams(self.d_ff, self.d_model)

    def weights(self):
        return (*self.w_1(), *self.w_2())

    def _drop(self, x, deterministic: bool):
        # nn.Dropout semantics without a submodule (setup-based modules
        # cannot create children inline): keep/(1-p) else 0
        if deterministic or self.dropout_p == 0.0:
            return x
        q = 1.0 - self.dropout_p
        keep = jax.random.bernoulli(self.make_rng("dropout"), q, x.shape)
        return jnp.where(keep, x / q, jnp.zeros_like(x))

    def __call__(self, x, deterministic: bool = True):
        w1, b1, w2, b2 = self.weights()
        dt = self.dtype
        h = nn.relu(jnp.dot(x.astype(dt), w1.astype(dt)) + b1.astype(dt))
        h = self._drop(h, deterministic)
        h = jnp.dot(h.astype(dt), w2.astype(dt)) + b2.astype(dt)
        return self._drop(h, deterministic)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm block: LN -> MHA -> +res; LN -> FFN -> +res
    (encoder.py:8-34). No dropout on the attention path."""
    d_model: int
    num_heads: int
    d_ff: int
    dropout_p: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        # hand the pre-norm scales to MHA instead of normalizing here: on
        # the kernel path StdLN fuses into the q/k/v projection pass
        # (kernels/rowmm.py), saving a full-stream HBM round-trip per layer;
        # param tree and math are identical either way
        pre = StdLayerNorm(self.d_model, dtype=self.dtype,
                           name="attention_prenorm")
        x = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype,
                               name="self_attention")(x, x, x, key_mask,
                                                      prenorm=pre.scales(),
                                                      residual=x)
        # self-attention: the key mask indexes the same rows x carries, so
        # it doubles as the FFN's row-validity source (row-block skip)
        return _ffn_block(self, x, deterministic, key_mask=key_mask)


# set by ops dispatch: fused LN->FFN->residual kernel (kernels/ffn.py) or
# None for the XLA module composition
_FFN_IMPL = None


def set_ffn_impl(fn) -> None:
    global _FFN_IMPL
    _FFN_IMPL = fn


def _ffn_row_blocks(x, key_mask):
    """Per-row-block validity flags for the fused FFN kernel: a block of
    BLOCK_R consecutive rows (sample-major [B, L] order) is skippable when
    every row in it is a masked key — padded rows are row-local in the FFN
    and read by nothing downstream. None when the layout doesn't align to
    whole blocks (L % BLOCK_R) or the mask is a 3-D block mask."""
    if key_mask is None or key_mask.ndim != 2 or x.ndim != 3:
        return None
    from ..kernels.ffn import BLOCK_R
    B, L, _ = x.shape
    if L % BLOCK_R != 0 or key_mask.shape != (B, L):
        return None
    alive = jnp.logical_not(key_mask).reshape(B, L // BLOCK_R, BLOCK_R)
    flags = jnp.any(alive, axis=-1)
    # all-masked sample: the attention kernels deliberately fall back to
    # uniform attention over every real key (the reference's txt len==3
    # -> 0 behavior, mbt_encoder.py:707), so those rows ARE read
    # downstream — keep every block live instead of passing x through
    return flags | jnp.logical_not(flags.any(axis=-1, keepdims=True))


def _ffn_block(layer: nn.Module, x, deterministic: bool, key_mask=None):
    """The pre-norm FFN half of an encoder layer: x + FFN(StdLN(x)).

    Params always come from the same StdLayerNorm/FeedForward submodules
    (identical tree/checkpoints); on TPU the computation dispatches to the
    fused Pallas kernel with in-kernel dropout and per-sample row-block
    skipping (padded TIE rows pay no FFN flops)."""
    prenorm = StdLayerNorm(layer.d_model, dtype=layer.dtype,
                           name="feed_forward_prenorm")
    ffn = FeedForward(layer.d_model, layer.d_ff, layer.dropout_p,
                      dtype=layer.dtype, name="feed_forward")
    if _FFN_IMPL is None:
        return x + ffn(prenorm(x), deterministic)
    seed = None
    if not deterministic and layer.dropout_p > 0.0:
        # the fused kernel's in-kernel dropout uses the TPU hardware PRNG
        # (pltpu.prng_*), which has no interpret-mode lowering off-TPU —
        # --use-pallas 2 (forced kernels on CPU) composes this half instead
        if jax.default_backend() != "tpu":
            return x + ffn(prenorm(x), deterministic)
        seed = jax.random.randint(layer.make_rng("dropout"), (2,),
                                  -2 ** 31, 2 ** 31 - 1, dtype=jnp.int32)
    gamma, beta = prenorm.scales()
    w1, b1, w2, b2 = ffn.weights()
    return _FFN_IMPL(x, gamma, beta, w1, b1, w2, b2, p=layer.dropout_p,
                     deterministic=deterministic, seed=seed,
                     block_valid=_ffn_row_blocks(x, key_mask))


# --remat: rematerialize each encoder layer in the backward pass
# (jax.checkpoint via flax's lifted nn.remat — identical param tree, ~O(1)
# layer activations resident instead of O(n_layers); trades recompute
# FLOPs for HBM, the TPU-native way to scale batch/super-batch size).
_REMAT = False


def set_remat(on: bool) -> None:
    global _REMAT
    _REMAT = bool(on)


def encoder_layer(d_model, num_heads, d_ff, dropout_p=0.1,
                  dtype=jnp.float32, name=None) -> nn.Module:
    """TransformerEncoderLayer, wrapped in nn.remat when --remat is set.
    The lifted transform preserves the module's name and param tree, so
    checkpoints are interchangeable between the two modes."""
    cls = TransformerEncoderLayer
    if _REMAT:
        # lifted-transform arg indices include the module itself at 0:
        # (mdl, x, key_mask, deterministic) -> deterministic is static arg 3
        cls = nn.remat(TransformerEncoderLayer, static_argnums=(3,))
    return cls(d_model, num_heads, d_ff, dropout_p, dtype, name=name)


class CrossmodalTransformerEncoderLayer(nn.Module):
    """q/kv pre-norm cross-attention block (encoder.py:251-278)."""
    d_model: int
    num_heads: int
    d_ff: int
    dropout_p: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, key_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        q = StdLayerNorm(self.d_model, dtype=self.dtype, name="attention_prenorm_q")(q_in)
        kv = StdLayerNorm(self.d_model, dtype=self.dtype, name="attention_prenorm_kv")(kv_in)
        h = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype,
                               name="self_attention")(q, kv, kv, key_mask)
        x = q_in + h
        return _ffn_block(self, x, deterministic)


class MLPStem(nn.Module):
    """Dense -> LayerNorm -> ReLU, the UMSE input-embedding stem shape
    (tri_mbt_vsltcls.py:61-76). Uses standard LayerNorm (the reference stems
    use torch nn.LayerNorm, not the custom one)."""
    d_model: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.d_model, dtype=self.dtype)(x)
        h = LayerNorm(dtype=self.dtype)(h)
        return nn.relu(h)

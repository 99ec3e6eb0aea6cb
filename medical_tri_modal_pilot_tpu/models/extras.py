"""Long-tail components from the reference inventory (SURVEY.md §2.5):

* ``InfoNCE`` — CPC-style contrastive loss with scrambled negatives
  (src/module/infonce.py:11-176; used by the legacy 5_bi_vslt_txt
  auxcpc models).
* ``TransformerDecoder`` — pre-norm cross-attention decoder for the
  (commented-out) CXR-report auxiliary loss
  (src/reports_transformer_decoder.py:30-200, src/transformer/decoder.py).
* ``RelativeMultiHeadAttention`` — Transformer-XL-style relative-position
  attention (src/transformer/attention.py:87-237; unused in the live path
  but part of the primitive inventory).
* ``FEATURE_TEMPORAL_V1`` — per-timestep feature-graph transformer +
  temporal transformer (8_missing_models/feature_temporal_v1.py; the
  reference file reads an ``args.graph`` flag that does not exist in
  control/config.py and cannot run — implemented here in its
  'gtransformer' form).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..constants import MASK_FILL_VALUE
from .encoder import TransformerEncoder
from .heads import ClsHead
from .modules import (MultiHeadAttention, StdLayerNorm, FeedForward, LayerNorm,
                      length_key_mask, positional_encoding, xavier_dense)


# ---------------------------------------------------------------------------
# InfoNCE
# ---------------------------------------------------------------------------

def l2_normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Gradient-safe unit normalization: rsqrt(sum_sq + eps) keeps the
    backward pass finite at the exact-zero vectors an all-missing modality
    produces (jnp.linalg.norm has a NaN gradient at 0)."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def info_nce(query: jnp.ndarray, positive: jnp.ndarray,
             negatives: Optional[jnp.ndarray] = None,
             temperature: float = 0.1,
             weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """InfoNCE loss. query/positive: [B, D]; negatives: [B, N, D] or None
    (in-batch negatives: every other positive, the reference's
    'unpaired' mode with scrambled negatives, infonce.py:11-176).
    ``weights`` ([B], e.g. modality-present indicators) masks samples out
    of the mean."""
    q = l2_normalize(query)
    p = l2_normalize(positive)
    if negatives is None:
        logits = q @ p.T / temperature                   # [B, B]
        labels = jnp.arange(q.shape[0])
        per_sample = -jax.nn.log_softmax(logits, axis=-1)[labels, labels]
    else:
        n = l2_normalize(negatives)
        pos_logit = jnp.sum(q * p, axis=-1, keepdims=True) / temperature
        neg_logits = jnp.einsum("bd,bnd->bn", q, n) / temperature
        logits = jnp.concatenate([pos_logit, neg_logits], axis=1)
        per_sample = -jax.nn.log_softmax(logits, axis=-1)[:, 0]
    if weights is None:
        return jnp.mean(per_sample)
    w = weights.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


# ---------------------------------------------------------------------------
# Relative-position MHA (Transformer-XL style)
# ---------------------------------------------------------------------------

class RelativeMultiHeadAttention(nn.Module):
    dim: int = 512
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, pos_embedding,
                 key_mask: Optional[jnp.ndarray] = None):
        B, Lq, _ = query.shape
        Lk = key.shape[1]
        d_head = self.dim // self.num_heads
        q = xavier_dense(self.dim, "query_proj", self.dtype)(query)
        k = xavier_dense(self.dim, "key_proj", self.dtype)(key)
        v = xavier_dense(self.dim, "value_proj", self.dtype)(value)
        pos = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="pos_proj")(pos_embedding)
        u = self.param("u_bias", nn.initializers.xavier_uniform(),
                       (self.num_heads, d_head))
        w = self.param("v_bias", nn.initializers.xavier_uniform(),
                       (self.num_heads, d_head))
        q = q.reshape(B, Lq, self.num_heads, d_head)
        k = k.reshape(B, Lk, self.num_heads, d_head)
        v = v.reshape(B, Lk, self.num_heads, d_head)
        pos = pos.reshape(-1, Lk, self.num_heads, d_head)
        content = jnp.einsum("bqhd,bkhd->bhqk", q + u, k)
        p_score = jnp.einsum("bqhd,pkhd->bhqk", q + w, pos)
        # relative shift (attention.py:142-152)
        p_score = jnp.pad(p_score, ((0, 0), (0, 0), (0, 0), (1, 0)))
        p_score = p_score.reshape(B, self.num_heads, Lk + 1, Lq)[:, :, 1:]
        p_score = p_score.reshape(B, self.num_heads, Lq, Lk)
        score = (content + p_score) / math.sqrt(d_head)
        if key_mask is not None:
            score = jnp.where(key_mask[:, None, None, :], MASK_FILL_VALUE, score)
        attn = jax.nn.softmax(score, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Lq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(ctx)


# ---------------------------------------------------------------------------
# Transformer decoder (reports aux head)
# ---------------------------------------------------------------------------

class TransformerDecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, self_mask=None, memory_key_mask=None,
                 deterministic: bool = True):
        h = StdLayerNorm(self.d_model, dtype=self.dtype, name="self_prenorm")(x)
        h = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype,
                               name="self_attention")(h, h, h, self_mask)
        x = x + h
        h = StdLayerNorm(self.d_model, dtype=self.dtype, name="cross_prenorm")(x)
        h = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype,
                               name="cross_attention")(h, memory, memory,
                                                       memory_key_mask)
        x = x + h
        h = StdLayerNorm(self.d_model, dtype=self.dtype, name="ff_prenorm")(x)
        h = FeedForward(self.d_model, self.d_ff, self.dropout_p,
                        dtype=self.dtype, name="feed_forward")(h, deterministic)
        return x + h


class TransformerDecoder(nn.Module):
    """Teacher-forced token decoder over encoder memory
    (src/reports_transformer_decoder.py:30-200): token embedding * sqrt(d)
    + PE, causal+pad self-attention, cross-attention to the image memory,
    vocab projection."""
    vocab_size: int = 30522
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 1024
    n_layers: int = 2
    pad_id: int = 0
    dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, memory, memory_key_mask=None,
                 deterministic: bool = True):
        B, L = tokens.shape
        emb = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                       name="embedding")(tokens.astype(jnp.int32))
        h = emb * math.sqrt(self.d_model) + positional_encoding(
            L, self.d_model, self.dtype)
        h = nn.Dropout(self.dropout_p)(h, deterministic=deterministic)
        causal = jnp.triu(jnp.ones((L, L), bool), k=1)
        pad = (tokens == self.pad_id)
        self_mask = causal[None] | pad[:, None, :]
        for i in range(self.n_layers):
            h = TransformerDecoderLayer(
                self.d_model, self.num_heads, self.d_ff, self.dropout_p,
                self.dtype, name=f"layers_{i}")(h, memory, self_mask,
                                                memory_key_mask, deterministic)
        # reference head: custom-std LayerNorm -> bias-free Linear
        # (reports_transformer_decoder.py:132-135)
        h = StdLayerNorm(self.d_model, dtype=self.dtype, name="fc_norm")(h)
        return nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype,
                        name="vocab_proj")(h)


# ---------------------------------------------------------------------------
# feature_temporal_v1
# ---------------------------------------------------------------------------

class FEATURE_TEMPORAL_V1(nn.Module):
    """Per-timestep feature-graph transformer (18 tokens: 16 features +
    age + gender) -> cls per step -> temporal transformer -> cls head
    (feature_temporal_v1.py:177-238, 'gtransformer' form). Carryforward
    only."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True):
        cfg = self.cfg
        from .models import model_dtype
        dt = model_dtype(cfg)
        x = batch["vslt"][:, 0].astype(dt)                 # [B, T, F]
        B, T, F = x.shape
        D = cfg.transformer_dim
        # per-feature 1->D stems
        kernels = self.param("feat_stems", nn.initializers.lecun_normal(),
                             (F, 1, D))
        bias = self.param("feat_bias", nn.initializers.zeros, (F, D))
        tokens = x[..., None] * kernels[None, None, :, 0, :] + bias
        tokens = nn.relu(LayerNorm(dtype=dt, name="stem_ln")(tokens))
        age = nn.Dense(D, dtype=dt, name="age_encoder")(
            batch["static"][:, 1:2].astype(dt))
        gen = nn.Dense(D, dtype=dt, name="gender_encoder")(
            batch["static"][:, 0:1].astype(dt))
        age = jnp.broadcast_to(age[:, None, None, :], (B, T, 1, D))
        gen = jnp.broadcast_to(gen[:, None, None, :], (B, T, 1, D))
        inst = jnp.concatenate([tokens, age, gen], axis=2)  # [B, T, F+2, D]
        inst = inst.reshape(B * T, F + 2, D)
        inst_out = TransformerEncoder(
            d_input=D, n_layers=2, n_head=cfg.transformer_num_head,
            d_model=D, d_ff=D * 4, dropout=cfg.dropout, use_pe=False,
            classification=True, mask=False, dtype=dt,
            name="instance_graph_transformer")(inst, None, deterministic)
        step_feats = inst_out[:, 0].reshape(B, T, D)
        temp_out = TransformerEncoder(
            d_input=D, n_layers=cfg.transformer_num_layers,
            n_head=cfg.transformer_num_head, d_model=D, d_ff=D * 4,
            dropout=cfg.dropout, use_pe=True, classification=True, dtype=dt,
            name="temporal_transformer")(
                step_feats, batch["input_length"].astype(jnp.int32) + 1,
                deterministic)
        h = LayerNorm(dtype=dt, name="final_ln")(temp_out[:, 0])
        logits = ClsHead(D, cfg.output_dim, cfg.activation, dtype=dt,
                         name="fc_list")(h, deterministic)[..., 0]
        return logits, None, None


# ---------------------------------------------------------------------------
# LocationAwareAttention + MaskCNN (unused-in-live-path primitives kept for
# inventory parity, src/transformer/attention.py:148-237, module.py:170-239)
# ---------------------------------------------------------------------------

class LocationAwareAttention(nn.Module):
    """Hybrid content+location attention (Chorowski et al.): a 1-D conv
    over the previous alignment contributes a location term to the score
    (attention.py:148-237). Single-head, additive form."""
    dim: int
    smoothing: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, last_align: Optional[jnp.ndarray] = None):
        B, Lq, _ = query.shape
        Lv = value.shape[1]
        if last_align is None:
            last_align = jnp.zeros((B, Lv), self.dtype)
        loc = nn.Conv(self.dim, (3,), padding="SAME", dtype=self.dtype,
                      name="loc_conv")(last_align[..., None])     # [B, Lv, D]
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     name="query_proj")(query)                     # [B, Lq, D]
        v = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     name="value_proj")(value)                     # [B, Lv, D]
        bias = self.param("score_bias", nn.initializers.zeros, (self.dim,))
        e = jnp.tanh(q[:, :, None, :] + v[:, None, :, :]
                     + loc[:, None, :, :] + bias)                  # [B,Lq,Lv,D]
        score = nn.Dense(1, use_bias=False, dtype=self.dtype,
                         name="score_proj")(e)[..., 0]             # [B,Lq,Lv]
        if self.smoothing:
            s = nn.sigmoid(score)
            align = s / jnp.sum(s, axis=-1, keepdims=True).clip(1e-8)
        else:
            align = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bqv,bvd->bqd", align.astype(value.dtype), value)
        return ctx, align[:, -1, :]


class MaskCNN(nn.Module):
    """Conv stack that re-zeroes positions beyond each sample's length
    after every conv — the reference's MaskCNN (module.py:170-239) for
    speech-style 2-D inputs [B, 1, D, T]. Lengths are per-sample time
    lengths; downsampling halves them per strided conv."""
    out_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, seq_lengths):
        # NCHW [B, 1, D, T] -> NHWC
        x = jnp.transpose(x.astype(self.dtype), (0, 2, 3, 1))
        lengths = seq_lengths.astype(jnp.int32)
        for i, stride in enumerate((2, 1)):
            x = nn.Conv(self.out_channels, (3, 3), strides=(stride, stride),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = jnp.clip(x, 0.0, 20.0)      # Hardtanh(0, 20)
            lengths = (lengths + stride - 1) // stride if stride > 1 else lengths
            t = x.shape[2]
            keep = (jnp.arange(t)[None, :] < lengths[:, None])
            x = x * keep[:, None, :, None].astype(x.dtype)
        return jnp.transpose(x, (0, 3, 1, 2)), lengths

"""Baseline model families: GRU-D, LSTM EHR encoder, and the
MedFuse / MMTM / DAFT fusion baselines (reference
builder/models/1_uni_vslt/binary_gru_d.py, src/lstm.py,
src/baseline_{medfuse,mmtm,daft}.py, 8_missing_models/fusiontrainer.py).

All consume the carryforward vslt layout ([3, T, F]: data/mask/delta) with
age/gender appended as two extra constant channels (fusiontrainer.py:86-88),
and return logits (the reference applies sigmoid inside the model;
the trainer here applies sigmoid at eval like all other models).

The reference fusiontrainer loads NFS-path pretrained ehr/cxr checkpoints
(fusiontrainer.py:43-62) unavailable outside their cluster; weights here
initialize randomly and can be restored through the standard checkpoint
path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import LayerNorm

from ..config import Config
from .models import ImageEncoder, ModelOutput, model_dtype
from .swin import SwinTransformer


def _unpack_carryforward(batch):
    """batch['vslt'] is [B, 3, T, F] (data, mask, delta)."""
    v = batch["vslt"]
    return v[:, 0], v[:, 1], v[:, 2]


def _with_demo(x, batch):
    """Append age/gender as constant channels (fusiontrainer.py:86-88)."""
    B, T, _ = x.shape
    age = jnp.broadcast_to(batch["static"][:, 1][:, None, None], (B, T, 1))
    gen = jnp.broadcast_to(batch["static"][:, 0][:, None, None], (B, T, 1))
    return jnp.concatenate([x, age.astype(x.dtype), gen.astype(x.dtype)],
                           axis=-1)


class GRU_D(nn.Module):
    """Decay-gated GRU (binary_gru_d.py:8-73): per-feature input decay from
    delta, hidden-state decay, carry-forward imputation toward the feature
    mean, final state at the last valid step -> MLP head. lax.scan over
    time (TPU-friendly static loop)."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        x, m, d = _unpack_carryforward(batch)
        x = x.astype(dt)
        m = m.astype(dt)
        d = d.astype(dt)
        B, T, F = x.shape
        x_mean = jnp.asarray(cfg.feature_means / 1.0, dtype=dt)  # population mean
        # per-feature input decay: exp(-relu(w_f * delta_f + b_f))
        w = self.param("input_decay_w", nn.initializers.normal(0.02), (F,))
        b = self.param("input_decay_b", nn.initializers.zeros, (F,))
        x_d = jnp.exp(-nn.relu(d * w + b))
        x = m * x + (1 - m) * x_d * x + (1 - m) * (1 - x_d) * x_mean

        scan_cell = nn.scan(
            _GRUDCell, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )(hidden_size=cfg.hidden_size, dtype=dt, name="gru")
        h0 = jnp.zeros((B, cfg.hidden_size), dt)
        _, hs = scan_cell(h0, (x, m, d))                     # [B, T, H]
        idx = jnp.clip(batch["input_length"].astype(jnp.int32), 0, T - 1)
        last = jnp.take_along_axis(hs, idx[:, None, None].repeat(hs.shape[-1], -1),
                                   axis=1)[:, 0]
        h = nn.Dense(64, dtype=dt, name="fc1")(last)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=dt,
                         name="bn")(h)
        h = nn.relu(h)
        logits = nn.Dense(1, dtype=dt, name="fc2")(h)[..., 0]
        return logits, None, None


class _GRUDCell(nn.Module):
    """One GRU-D step: hidden decay from delta, then a GRU cell over
    [x_t ∥ m_t] (binary_gru_d.py:60-66)."""
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, inputs):
        x_t, m_t, d_t = inputs
        h_d = jnp.exp(-nn.relu(nn.Dense(self.hidden_size, dtype=self.dtype,
                                        name="hidden_decay")(d_t)))
        h = h_d * h
        h, y = nn.GRUCell(features=self.hidden_size, dtype=self.dtype,
                          name="cell")(h, jnp.concatenate([x_t, m_t], -1))
        return h, y


class _MaskedLSTMCell(nn.Module):
    """LSTM cell that freezes carry beyond each sample's length — the
    functional analog of pack_padded_sequence (src/lstm.py:39-44)."""
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, inputs):
        x_t, v_t = inputs
        new_carry, y = nn.OptimizedLSTMCell(
            features=self.hidden_dim, dtype=self.dtype, name="cell")(carry, x_t)
        keep = v_t.astype(y.dtype)
        carry = jax.tree.map(lambda n, o: n * keep + o * (1 - keep),
                             new_carry, carry)
        return carry, y * keep


class LSTMEncoder(nn.Module):
    """Stacked LSTM over padded sequences, last-valid-state features
    (src/lstm.py:6-47). Masked scan replaces pack_padded_sequence."""
    hidden_dim: int = 256
    layers: int = 2
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True,
                 return_sequence: bool = False):
        B, T, _ = x.shape
        valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        seq = x.astype(self.dtype)
        last_h = None
        for layer in range(self.layers):
            scan_cell = nn.scan(
                _MaskedLSTMCell, variable_broadcast="params",
                split_rngs={"params": False}, in_axes=1, out_axes=1,
            )(hidden_dim=self.hidden_dim, dtype=self.dtype,
              name=f"layer{layer}")
            carry0 = (jnp.zeros((B, self.hidden_dim), self.dtype),
                      jnp.zeros((B, self.hidden_dim), self.dtype))
            (c_fin, h_fin), seq = scan_cell(carry0, (seq, valid))
            last_h = h_fin
        feats = last_h
        if self.dropout > 0:
            feats = nn.Dropout(self.dropout)(feats, deterministic=deterministic)
        if return_sequence:
            return feats, seq
        return feats


def _txt_vector(cfg: Config, txt, dt, scope: nn.Module):
    """Single text vector (baseline_medfuse.py:46-82): biobert cls token
    normalized + projected; token-embedding mean otherwise. 3-D biobert
    embeddings are mean-pooled (the reference baselines assume the
    cls-token h5)."""
    if cfg.berttype == "biobert":
        if txt.ndim == 3:
            txt = jnp.mean(txt, axis=1)
        h = LayerNorm(dtype=dt, name="txtnorm")(txt.astype(dt))
        return nn.Dense(cfg.transformer_dim, dtype=dt, name="txt_embedding")(h)
    emb = nn.Embed(30000, cfg.transformer_dim, dtype=dt, name="txt_embedding")(
        txt.astype(jnp.int32))
    return jnp.mean(emb, axis=1)


class FUSIONTRAINER(nn.Module):
    """MedFuse / MMTM / DAFT fusion baselines behind --fuse-baseline
    (fusiontrainer.py:27-92). EHR LSTM + frozen Swin-T + text vector."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        kind = cfg.fuse_baseline or "Medfuse"
        x, m, d = _unpack_carryforward(batch)
        ehr_in = _with_demo(x.astype(dt), batch)
        lengths = jnp.clip(batch["input_length"].astype(jnp.int32), 1, None)

        ehr = LSTMEncoder(hidden_dim=cfg.transformer_dim, layers=2,
                          dropout=0.3, dtype=dt, name="ehr_model")
        swin = SwinTransformer(in_channels=1, dtype=dt, name="cxr_model")
        feats_map = swin(batch["img"], deterministic)        # [B, 7, 7, 768]
        feats_map = jax.lax.stop_gradient(feats_map) \
            if "uni_ehr" in cfg.fusion_type else feats_map
        cxr_pooled = jnp.mean(feats_map, axis=(1, 2))        # [B, 768]
        txt_vec = _txt_vector(cfg, batch["txt"], dt, self)   # [B, 256]

        if kind == "Medfuse":
            # (baseline_medfuse.py:62-111): [txt, ehr, cxr] -> fusion LSTM
            ehr_feats = ehr(ehr_in, lengths, deterministic)
            cxr_proj = nn.Dense(cfg.transformer_dim, dtype=dt,
                                name="projection")(cxr_pooled)
            tokens = jnp.stack([txt_vec, ehr_feats, cxr_proj], axis=1)
            fuse = LSTMEncoder(hidden_dim=768, layers=1, dropout=0.0,
                               dtype=dt, name="lstm_fusion_layer")
            fused = fuse(tokens, jnp.full((tokens.shape[0],), 3), deterministic)
            logits = nn.Dense(1, dtype=dt, name="lstm_fused_cls")(fused)[..., 0]
            return logits, None, None

        ehr_feats, ehr_seq = ehr(ehr_in, lengths, deterministic,
                                 return_sequence=True)
        if kind == "MMTM":
            # squeeze-excite cross-modal gating (baseline_mmtm.py:15-142)
            vis_flat = jnp.mean(feats_map.reshape(feats_map.shape[0], -1, 768),
                                axis=1)
            ehr_avg = jnp.mean(ehr_seq, axis=1)
            squeeze = jnp.concatenate([txt_vec, vis_flat, ehr_avg], axis=1)
            dim_out = squeeze.shape[-1] // int(cfg.mmtm_ratio)
            exc = nn.relu(nn.Dense(dim_out, dtype=dt, name="fc_squeeze")(squeeze))
            g_txt = 2 * nn.sigmoid(nn.Dense(cfg.transformer_dim, dtype=dt,
                                            name="fc_txt")(exc))
            g_vis = 2 * nn.sigmoid(nn.Dense(768, dtype=dt, name="fc_visual")(exc))
            g_ehr = 2 * nn.sigmoid(nn.Dense(cfg.transformer_dim, dtype=dt,
                                            name="fc_skeleton")(exc))
            txt_g = txt_vec * g_txt
            vis_g = cxr_pooled * g_vis
            ehr_g = jnp.mean(ehr_seq * g_ehr[:, None, :], axis=1)
            proj_txt = nn.Dense(768, dtype=dt, name="projection_txt")(txt_g)
            proj_ehr = nn.Dense(768, dtype=dt, name="projection")(ehr_g)
            feats = jnp.concatenate([proj_txt, proj_ehr, vis_g], axis=1)
            logits = nn.Dense(1, dtype=dt, name="joint_cls")(feats)[..., 0]
            return logits, None, None

        # DAFT: FiLM-style scale/shift of the EHR sequence conditioned on
        # [txt ∥ pooled image ∥ ehr mean] (baseline_daft.py:75-148)
        ehr_avg = jnp.mean(ehr_seq, axis=1)
        squeeze = jnp.concatenate([txt_vec, cxr_pooled, ehr_avg], axis=1)
        bottleneck = max(squeeze.shape[-1] // 7, 4)
        h = nn.Dense(bottleneck, use_bias=False, dtype=dt, name="aux_base")(squeeze)
        film = nn.Dense(2 * cfg.transformer_dim, use_bias=False, dtype=dt,
                        name="aux_out")(nn.relu(h))
        v_scale, v_shift = jnp.split(film, 2, axis=1)
        ehr_mod = ehr_seq * v_scale[:, None, :] + v_shift[:, None, :]
        head = LSTMEncoder(hidden_dim=cfg.transformer_dim, layers=1,
                           dropout=0.3, dtype=dt, name="daft_head")
        feats = head(ehr_mod, lengths, deterministic)
        logits = nn.Dense(1, dtype=dt, name="dense_layer")(feats)[..., 0]
        return logits, None, None


class LSTM_MODEL(nn.Module):
    """Standalone LSTM classifier over the carryforward grid — the
    'uni_ehr' baseline path (src/lstm.py + fusion_type=uni_ehr)."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        x, _m, _d = _unpack_carryforward(batch)
        ehr_in = _with_demo(x.astype(dt), batch)
        lengths = jnp.clip(batch["input_length"].astype(jnp.int32), 1, None)
        feats = LSTMEncoder(hidden_dim=cfg.transformer_dim, layers=2,
                            dropout=0.3, dtype=dt, name="ehr_model")(
                                ehr_in, lengths, deterministic)
        logits = nn.Dense(1, dtype=dt, name="dense_layer")(feats)[..., 0]
        return logits, None, None

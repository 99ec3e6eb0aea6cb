"""Legacy model families (reference builder/models/{1,2,4,5,6}_*).

The reference ships ~50 earlier-generation models outside the live
registry (builder/models/__init__.py keeps them commented out). They
reduce to a small set of archetypes, each implemented here once as a
configurable flax module and registered under every reference file name:

  1_uni_vslt/   time/feature transformers, GRU-D(+transformer), LSTM
                (binary_* = single task, multi_* = multi-task output_dim)
  2_uni_image/  CXR classifiers over resnet/swin/vit/patch backbones
  4_bi_vslt_img early/mid/late/cross fusion of carryforward vslt + CXR
  5_bi_vslt_txt same fusion shapes for vslt + clinical notes, plus the
                auxcpc_* contrastive-pretraining family (InfoNCE/cosine/l2
                auxiliary losses, src/module/infonce.py)
  6_tri_*       early tri-modal fusion

All consume the carryforward layout (batch['vslt'] = [B, 3, T, F], the
family these models were built for) and return the uniform
``(logits, rmse, aux_loss)`` contract; aux_loss is added to the training
loss with --auxiliary-loss-weight (trainer wiring).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .baselines import _GRUDCell, _unpack_carryforward, _with_demo, LSTMEncoder
from .encoder import TransformerEncoder
from .extras import info_nce
from .heads import ClsHead
from .maxvit import MaxViT
from .models import ModelOutput, model_dtype
from .modules import (CrossmodalTransformerEncoderLayer, MLPStem,
                      TransformerEncoderLayer, length_key_mask,
                      positional_encoding)
from .resnet import ResNet
from .swin import PatchEmbed, SwinTransformer
from .vit import VisionTransformer


# ---------------------------------------------------------------------------
# shared encoders
# ---------------------------------------------------------------------------

class GRUDEncoder(nn.Module):
    """GRU-D over the carryforward grid; returns (last_state, sequence)
    (binary_gru_d.py:8-73, latefusion_img_trans_vslt_grud.py:102-122).
    lax.scan over time keeps the loop on-device with static shapes."""
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, m, d, x_mean, lengths):
        B, T, F = x.shape
        w = self.param("input_decay_w", nn.initializers.normal(0.02), (F,))
        b = self.param("input_decay_b", nn.initializers.zeros, (F,))
        x_d = jnp.exp(-nn.relu(d * w + b))
        x = m * x + (1 - m) * x_d * x + (1 - m) * (1 - x_d) * x_mean
        scan_cell = nn.scan(
            _GRUDCell, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )(hidden_size=self.hidden_size, dtype=self.dtype, name="gru")
        h0 = jnp.zeros((B, self.hidden_size), self.dtype)
        _, hs = scan_cell(h0, (x, m, d))
        idx = jnp.clip(lengths.astype(jnp.int32) - 1, 0, T - 1)
        last = jnp.take_along_axis(
            hs, idx[:, None, None].repeat(hs.shape[-1], -1), axis=1)[:, 0]
        return last, hs


class _VsltTokens(nn.Module):
    """Carryforward grid + demographics channels -> d_model tokens
    (the init_fc pattern, cross_transformer_img_vslt_sssccc.py:57)."""
    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch):
        x, _, _ = _unpack_carryforward(batch)
        x = _with_demo(x.astype(self.dtype), batch)
        return nn.Dense(self.cfg.transformer_dim, dtype=self.dtype,
                        name="init_fc")(x)


class ImageBackbone(nn.Module):
    """CXR backbone by --img-model-type; returns (pooled [B, C], tokens
    [B, N, C]). resnet18/50 use the MONAI-shape ResNet
    (2_uni_image/resnet.py:9-18), swin/vit the shared encoders, maxvit the
    compact MaxViT."""
    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, deterministic: bool = True):
        kind = self.cfg.img_model_type
        train = not deterministic
        if kind.startswith("resnet"):
            fmap = ResNet(num_layers=int(kind.replace("resnet", "")),
                          dtype=self.dtype, name="img_encoder")(
                              img, train=train, pool=False)
            B, h, w, C = fmap.shape
            return jnp.mean(fmap, axis=(1, 2)), fmap.reshape(B, h * w, C)
        if kind == "maxvit":
            fmap = MaxViT(dtype=self.dtype, name="img_encoder")(
                img, train=train, pool=False, deterministic=deterministic)
            B, h, w, C = fmap.shape
            return jnp.mean(fmap, axis=(1, 2)), fmap.reshape(B, h * w, C)
        if kind == "vit":
            toks = VisionTransformer(in_channels=1,
                                     image_size=self.cfg.image_size,
                                     dtype=self.dtype, name="img_encoder")(
                                         img, deterministic)
            return jnp.mean(toks, axis=1), toks
        if kind == "swin":
            fmap = SwinTransformer(in_channels=1, dtype=self.dtype,
                                   name="img_encoder")(img, deterministic)
            B = fmap.shape[0]
            toks = fmap.reshape(B, -1, fmap.shape[-1])
            return jnp.mean(toks, axis=1), toks
        toks = PatchEmbed(img_size=self.cfg.image_size, patch_size=16,
                          hidden=self.cfg.transformer_dim, dtype=self.dtype,
                          name="patch_embedding")(img)
        return jnp.mean(toks, axis=1), toks


class _TxtTokens(nn.Module):
    """Note tokens -> d_model embeddings (token ids or BioBERT vectors)."""
    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, txt):
        if self.cfg.berttype == "bert" or txt.dtype in (jnp.int32, jnp.int64):
            toks = nn.Embed(30000, self.cfg.transformer_dim,
                            dtype=self.dtype, name="txt_embedding")(
                                txt.astype(jnp.int32))
        else:
            if txt.ndim == 2:
                txt = txt[:, None, :]
            toks = nn.Dense(self.cfg.transformer_dim, dtype=self.dtype,
                            name="txt_embedding")(txt.astype(self.dtype))
        return toks


def _head(cfg: Config, x, deterministic, name="fc_list"):
    logits = ClsHead(cfg.transformer_dim, cfg.output_dim, cfg.activation,
                     dtype=x.dtype, name=name)(x, deterministic)
    return logits[..., 0] if cfg.output_dim == 1 else logits


# ---------------------------------------------------------------------------
# 1_uni_vslt — time / feature transformers, GRU-D + transformer
# ---------------------------------------------------------------------------

class T_TRANSFORMER(nn.Module):
    """Time-axis transformer over the carryforward grid
    (1_uni_vslt/binary_t_transformer.py). multi_* variants are the same
    module with output_dim > 1."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        tokens = _VsltTokens(cfg, dt, name="vslt_tokens")(batch)
        enc = TransformerEncoder(
            d_input=cfg.transformer_dim, n_layers=cfg.transformer_num_layers,
            n_head=cfg.transformer_num_head, d_model=cfg.transformer_dim,
            d_ff=cfg.transformer_dim * 4, dropout=cfg.dropout,
            use_pe=True, classification=True, dtype=dt,
            name="transformer_encoder")(
                tokens, batch["input_length"].astype(jnp.int32) + 1,
                deterministic)
        x = nn.LayerNorm(dtype=dt, name="final_ln")(enc[:, 0])
        return _head(cfg, x, deterministic), None, None


class F_TRANSFORMER(nn.Module):
    """Feature-axis transformer: one token per vital/lab feature, embedded
    from its full time trace (1_uni_vslt/binary_f_transformer.py)."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        x, m, _ = _unpack_carryforward(batch)
        feat_traces = jnp.transpose(
            jnp.concatenate([x, m], axis=1).astype(dt), (0, 2, 1))  # [B,F,2T]
        tokens = nn.Dense(cfg.transformer_dim, dtype=dt,
                          name="feat_embed")(feat_traces)
        enc = TransformerEncoder(
            d_input=cfg.transformer_dim, n_layers=cfg.transformer_num_layers,
            n_head=cfg.transformer_num_head, d_model=cfg.transformer_dim,
            d_ff=cfg.transformer_dim * 4, dropout=cfg.dropout,
            use_pe=False, classification=True, mask=False, dtype=dt,
            name="transformer_encoder")(tokens, None, deterministic)
        x = nn.LayerNorm(dtype=dt, name="final_ln")(enc[:, 0])
        return _head(cfg, x, deterministic), None, None


class FT_TRANSFORMER(nn.Module):
    """Feature + time dual-stack, concatenated cls features
    (1_uni_vslt/multi_ft_transformer.py)."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        t_tokens = _VsltTokens(cfg, dt, name="vslt_tokens")(batch)
        t_enc = TransformerEncoder(
            d_input=cfg.transformer_dim, n_layers=cfg.transformer_num_layers,
            n_head=cfg.transformer_num_head, d_model=cfg.transformer_dim,
            d_ff=cfg.transformer_dim * 4, dropout=cfg.dropout, use_pe=True,
            classification=True, dtype=dt, name="t_encoder")(
                t_tokens, batch["input_length"].astype(jnp.int32) + 1,
                deterministic)
        x, m, _ = _unpack_carryforward(batch)
        traces = jnp.transpose(jnp.concatenate([x, m], 1).astype(dt), (0, 2, 1))
        f_tokens = nn.Dense(cfg.transformer_dim, dtype=dt,
                            name="feat_embed")(traces)
        f_enc = TransformerEncoder(
            d_input=cfg.transformer_dim, n_layers=cfg.transformer_num_layers,
            n_head=cfg.transformer_num_head, d_model=cfg.transformer_dim,
            d_ff=cfg.transformer_dim * 4, dropout=cfg.dropout, use_pe=False,
            classification=True, mask=False, dtype=dt, name="f_encoder")(
                f_tokens, None, deterministic)
        feats = jnp.concatenate([t_enc[:, 0], f_enc[:, 0]], axis=-1)
        feats = nn.Dense(cfg.transformer_dim, dtype=dt, name="merge")(feats)
        x = nn.LayerNorm(dtype=dt, name="final_ln")(feats)
        return _head(cfg, x, deterministic), None, None


class GRUD_T_TRANSFORMER(nn.Module):
    """GRU-D hidden sequence refined by a time transformer
    (1_uni_vslt/binary_gru_d_t_transformer.py)."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        x, m, d = _unpack_carryforward(batch)
        x_mean = jnp.asarray(cfg.feature_means, dtype=dt)
        _, hs = GRUDEncoder(cfg.transformer_dim, dtype=dt, name="grud")(
            x.astype(dt), m.astype(dt), d.astype(dt), x_mean,
            batch["input_length"])
        enc = TransformerEncoder(
            d_input=cfg.transformer_dim, n_layers=cfg.transformer_num_layers,
            n_head=cfg.transformer_num_head, d_model=cfg.transformer_dim,
            d_ff=cfg.transformer_dim * 4, dropout=cfg.dropout, use_pe=True,
            classification=True, dtype=dt, name="transformer_encoder")(
                hs, batch["input_length"].astype(jnp.int32) + 1,
                deterministic)
        xcls = nn.LayerNorm(dtype=dt, name="final_ln")(enc[:, 0])
        return _head(cfg, xcls, deterministic), None, None


# ---------------------------------------------------------------------------
# 2_uni_image — CXR classifiers
# ---------------------------------------------------------------------------

class UNI_IMAGE(nn.Module):
    """CXR-only classifier: backbone -> pooled -> linear
    (2_uni_image/{resnet,resnet_enc,swin_transformer,vit,vit_monai}.py).
    The reference applies sigmoid in-model; here the trainer applies it at
    eval, uniform with every other model."""
    cfg: Config
    backbone: Optional[str] = None   # override cfg.img_model_type

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        if self.backbone is not None:
            cfg = cfg.replace(img_model_type=self.backbone)
        pooled, _ = ImageBackbone(cfg, dt, name="img_backbone")(
            batch["img"], deterministic)
        logits = nn.Dense(cfg.output_dim, dtype=dt, name="fc")(pooled)
        return (logits[..., 0] if cfg.output_dim == 1 else logits), None, None


# ---------------------------------------------------------------------------
# 4/5/6 — fusion archetypes
# ---------------------------------------------------------------------------

def _modal_tokens(cfg: Config, batch, dt, scope, deterministic):
    """Per-modality token lists + pad masks for the fusion archetypes.
    Modalities follow cfg.input_types."""
    mods = cfg.input_types.split("_")
    tokens = [_VsltTokens(cfg, dt, name="vslt_tokens")(batch)]
    valid = [~length_key_mask(batch["input_length"].astype(jnp.int32),
                              tokens[0].shape[1])]
    if "img" in mods:
        _, toks = ImageBackbone(cfg, dt, name="img_backbone")(
            batch["img"], deterministic)
        toks = nn.Dense(cfg.transformer_dim, dtype=dt,
                        name="img_proj")(toks) \
            if toks.shape[-1] != cfg.transformer_dim else toks
        tokens.append(toks)
        valid.append(jnp.ones(toks.shape[:2], dtype=bool))
    if "txt" in mods:
        toks = _TxtTokens(cfg, dt, name="txt_tokens")(batch["txt"])
        tokens.append(toks)
        valid.append(~length_key_mask(
            jnp.clip(batch["txt_length"].astype(jnp.int32) + 2, 1,
                     toks.shape[1]), toks.shape[1]))
    return tokens, valid


class EARLYFUSION(nn.Module):
    """Concatenate all modality tokens, run one joint encoder, classify
    from a cls token (4_bi/earlyfusion_img_vslt.py:63-76,
    5_bi/earlyfusion_vslt_txt_transformer.py, 6_tri/earlyfusion_*)."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        tokens, valid = _modal_tokens(cfg, batch, dt, self, deterministic)
        B = tokens[0].shape[0]
        cls = self.param("cls_tokens", nn.initializers.zeros,
                         (1, 1, cfg.transformer_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.transformer_dim)).astype(dt)]
            + tokens, axis=1)
        key_mask = ~jnp.concatenate(
            [jnp.ones((B, 1), dtype=bool)] + valid, axis=1)
        h = nn.LayerNorm(dtype=dt, name="layer_norm_in")(x)
        h = h + positional_encoding(h.shape[1], cfg.transformer_dim, dt)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        for i in range(cfg.transformer_num_layers):
            h = TransformerEncoderLayer(
                cfg.transformer_dim, cfg.transformer_num_head,
                cfg.transformer_dim * 4, cfg.dropout, dt,
                name=f"layers_{i}")(h, key_mask, deterministic)
        x = nn.LayerNorm(dtype=dt, name="final_ln")(h[:, 0])
        return _head(cfg, x, deterministic), None, None


class _VsltFeature(nn.Module):
    """Pooled vslt feature by encoder kind: 'grud' last state or 'ttrans'
    cls token — the two variants of the mid/late fusion files."""
    cfg: Config
    kind: str = "ttrans"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        cfg = self.cfg
        dt = self.dtype
        if self.kind == "grud":
            x, m, d = _unpack_carryforward(batch)
            x_mean = jnp.asarray(cfg.feature_means, dtype=dt)
            last, _ = GRUDEncoder(cfg.transformer_dim, dtype=dt,
                                  name="grud")(
                x.astype(dt), m.astype(dt), d.astype(dt), x_mean,
                batch["input_length"])
            return last
        tokens = _VsltTokens(cfg, dt, name="vslt_tokens")(batch)
        enc = TransformerEncoder(
            d_input=cfg.transformer_dim, n_layers=cfg.transformer_num_layers,
            n_head=cfg.transformer_num_head, d_model=cfg.transformer_dim,
            d_ff=cfg.transformer_dim * 4, dropout=cfg.dropout, use_pe=True,
            classification=True, dtype=dt, name="t_encoder")(
                tokens, batch["input_length"].astype(jnp.int32) + 1,
                deterministic)
        return enc[:, 0]


def _other_feature(cfg: Config, batch, dt, deterministic):
    """Pooled feature of the non-vslt modality (img or txt)."""
    if "img" in cfg.input_types:
        pooled, _ = ImageBackbone(cfg, dt, name="img_backbone")(
            batch["img"], deterministic)
        return nn.Dense(cfg.transformer_dim, dtype=dt, name="img_proj")(pooled)
    toks = _TxtTokens(cfg, dt, name="txt_tokens")(batch["txt"])
    mask = ~length_key_mask(
        jnp.clip(batch["txt_length"].astype(jnp.int32) + 2, 1,
                 toks.shape[1]), toks.shape[1])
    w = mask.astype(dt)[..., None]
    return jnp.sum(toks * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)


class MIDFUSION(nn.Module):
    """Concatenate pooled per-modality features, joint MLP head
    (4_bi/midfusion_img_trans_vslt_{grud,ttrans}.py,
    5_bi/midfusion_vslt_txt_transformer.py)."""
    cfg: Config
    vslt_kind: str = "ttrans"

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        v = _VsltFeature(cfg, self.vslt_kind, dt, name="vslt_feature")(
            batch, deterministic)
        o = _other_feature(cfg, batch, dt, deterministic)
        x = nn.LayerNorm(dtype=dt, name="final_ln")(
            jnp.concatenate([v, o], axis=-1))
        x = nn.Dense(cfg.transformer_dim, dtype=dt, name="merge")(x)
        return _head(cfg, nn.relu(x), deterministic), None, None


class LATEFUSION(nn.Module):
    """Independent per-modality heads, averaged logits
    (4_bi/latefusion_img_trans_vslt_{grud,ttrans}.py,
    5_bi/latefusion_vslt_{grud_,}txt_transformer.py)."""
    cfg: Config
    vslt_kind: str = "ttrans"

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        v = _VsltFeature(cfg, self.vslt_kind, dt, name="vslt_feature")(
            batch, deterministic)
        o = _other_feature(cfg, batch, dt, deterministic)
        lv = _head(cfg, nn.LayerNorm(dtype=dt, name="v_ln")(v),
                   deterministic, name="fc_vslt")
        lo = _head(cfg, nn.LayerNorm(dtype=dt, name="o_ln")(o),
                   deterministic, name="fc_other")
        return (lv + lo) / 2, None, None


class CROSS_TRANSFORMER(nn.Module):
    """Self-attention stacks per modality, then bidirectional cross-modal
    layers, concat cls features (4_bi/cross_transformer_img_vslt_sssccc.py
    — 'sss' self layers then 'ccc' cross layers;
    5_bi/{bi_,}cross_transformer_txt_vslt.py)."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        tokens, valid = _modal_tokens(cfg, batch, dt, self, deterministic)
        v, o = tokens[0], tokens[1]
        v_mask, o_mask = ~valid[0], ~valid[1]
        n_self = max(cfg.transformer_num_layers // 2, 1)
        n_cross = max(cfg.transformer_num_layers - n_self, 1)
        for i in range(n_self):
            v = TransformerEncoderLayer(
                cfg.transformer_dim, cfg.transformer_num_head,
                cfg.transformer_dim * 4, cfg.dropout, dt,
                name=f"self_v_{i}")(v, v_mask, deterministic)
            o = TransformerEncoderLayer(
                cfg.transformer_dim, cfg.transformer_num_head,
                cfg.transformer_dim * 4, cfg.dropout, dt,
                name=f"self_o_{i}")(o, o_mask, deterministic)
        for i in range(n_cross):
            v_new = CrossmodalTransformerEncoderLayer(
                cfg.transformer_dim, cfg.transformer_num_head,
                cfg.transformer_dim * 4, cfg.dropout, dt,
                name=f"cross_v_{i}")(v, o, o_mask, deterministic)
            o = CrossmodalTransformerEncoderLayer(
                cfg.transformer_dim, cfg.transformer_num_head,
                cfg.transformer_dim * 4, cfg.dropout, dt,
                name=f"cross_o_{i}")(o, v, v_mask, deterministic)
            v = v_new
        vw = valid[0].astype(dt)[..., None]
        ow = valid[1].astype(dt)[..., None]
        v_feat = jnp.sum(v * vw, 1) / jnp.maximum(jnp.sum(vw, 1), 1.0)
        o_feat = jnp.sum(o * ow, 1) / jnp.maximum(jnp.sum(ow, 1), 1.0)
        x = nn.Dense(cfg.transformer_dim, dtype=dt, name="merge")(
            jnp.concatenate([v_feat, o_feat], axis=-1))
        x = nn.LayerNorm(dtype=dt, name="final_ln")(nn.relu(x))
        return _head(cfg, x, deterministic), None, None


# ---------------------------------------------------------------------------
# 5_bi_vslt_txt auxcpc_* — contrastive auxiliary losses
# ---------------------------------------------------------------------------

class AUXCPC(nn.Module):
    """vslt+txt model with a contrastive auxiliary objective
    (5_bi_vslt_txt/auxcpc_{early,grudtxt,mbt}*.py). The vslt stream is
    encoded (transformer or GRU-D by ``vslt_kind``), fused with text by
    ``fusion`` ('early' = joint encoder, 'cross' = cross-attention, 'mbt'
    approximated by the early joint encoder at this family's scale), and a
    CPC-style loss ties the vslt context to the text representation:
    'cpc' -> InfoNCE with in-batch negatives (src/module/infonce.py),
    'cosine' -> 1 - cosine similarity, 'l2' -> mean squared error
    (auxcpc_mbt.py:103-129 switches the same three modes)."""
    cfg: Config
    vslt_kind: str = "ttrans"
    fusion: str = "early"

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        # --- encode both streams
        v_tokens = _VsltTokens(cfg, dt, name="vslt_tokens")(batch)
        if self.vslt_kind == "grud":
            x, m, d = _unpack_carryforward(batch)
            x_mean = jnp.asarray(cfg.feature_means, dtype=dt)
            _, hs = GRUDEncoder(cfg.transformer_dim, dtype=dt, name="grud")(
                x.astype(dt), m.astype(dt), d.astype(dt), x_mean,
                batch["input_length"])
            v_tokens = hs
        t_tokens = _TxtTokens(cfg, dt, name="txt_tokens")(batch["txt"])
        B = v_tokens.shape[0]
        v_valid = ~length_key_mask(batch["input_length"].astype(jnp.int32),
                                   v_tokens.shape[1])
        t_valid = ~length_key_mask(
            jnp.clip(batch["txt_length"].astype(jnp.int32) + 2, 1,
                     t_tokens.shape[1]), t_tokens.shape[1])
        # --- fuse
        cls = self.param("cls_tokens", nn.initializers.zeros,
                         (1, 1, cfg.transformer_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.transformer_dim)).astype(dt),
             v_tokens, t_tokens], axis=1)
        key_mask = ~jnp.concatenate(
            [jnp.ones((B, 1), dtype=bool), v_valid, t_valid], axis=1)
        h = nn.LayerNorm(dtype=dt, name="layer_norm_in")(x)
        h = h + positional_encoding(h.shape[1], cfg.transformer_dim, dt)
        for i in range(cfg.transformer_num_layers):
            h = TransformerEncoderLayer(
                cfg.transformer_dim, cfg.transformer_num_head,
                cfg.transformer_dim * 4, cfg.dropout, dt,
                name=f"layers_{i}")(h, key_mask, deterministic)
        xcls = nn.LayerNorm(dtype=dt, name="final_ln")(h[:, 0])
        logits = _head(cfg, xcls, deterministic)
        # --- contrastive auxiliary between pooled streams (fp32)
        vw = v_valid.astype(jnp.float32)[..., None]
        tw = t_valid.astype(jnp.float32)[..., None]
        v32 = v_tokens.astype(jnp.float32)
        t32 = t_tokens.astype(jnp.float32)
        v_feat = jnp.sum(v32 * vw, 1) / jnp.maximum(jnp.sum(vw, 1), 1.0)
        t_feat = jnp.sum(t32 * tw, 1) / jnp.maximum(jnp.sum(tw, 1), 1.0)
        q = nn.Dense(cfg.transformer_dim, name="cpc_q")(v_feat)
        p = nn.Dense(cfg.transformer_dim, name="cpc_p")(t_feat)
        # samples with the note missing contribute nothing to the
        # contrastive term (their embedding is a padding artifact)
        w = 1.0 - batch["missing"][:, 2].astype(jnp.float32)
        aux_type = cfg.auxiliary_loss_type or ""
        if "cosine" in aux_type:
            from .extras import l2_normalize
            per = 1.0 - jnp.sum(l2_normalize(q) * l2_normalize(p), axis=-1)
            aux = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
        elif "l2" in aux_type:
            per = jnp.mean((q - p) ** 2, axis=-1)
            aux = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
        else:
            aux = info_nce(q, p, weights=w)
        return logits, None, aux


# ---------------------------------------------------------------------------
# registry wiring
# ---------------------------------------------------------------------------

def register_legacy(register) -> None:
    """Register every reference legacy file name (see module docstring)."""
    from .baselines import GRU_D, LSTM_MODEL
    from .models import TRI_MBT_V1, TRI_MBT_VSLTCLS
    part = functools.partial
    entries = {
        # 1_uni_vslt
        "binary_t_transformer": T_TRANSFORMER,
        "multi_t_transformer": T_TRANSFORMER,
        "binary_f_transformer": F_TRANSFORMER,
        "multi_f_transformer": F_TRANSFORMER,
        "multi_ft_transformer": FT_TRANSFORMER,
        "binary_gru_d": GRU_D,
        "multi_gru_d": GRU_D,
        "binary_lstm": LSTM_MODEL,
        "multi_lstm": LSTM_MODEL,
        "binary_gru_d_t_transformer": GRUD_T_TRANSFORMER,
        "multi_gru_d_t_transformer": GRUD_T_TRANSFORMER,
        # 2_uni_image
        "resnet": part(UNI_IMAGE, backbone="resnet18"),
        "resnet_enc": part(UNI_IMAGE, backbone="resnet18"),
        "swin_transformer": part(UNI_IMAGE, backbone="swin"),
        "vit": part(UNI_IMAGE, backbone="vit"),
        "vit_monai": part(UNI_IMAGE, backbone="patch"),
        "maxvit": part(UNI_IMAGE, backbone="maxvit"),
        # 4_bi_vslt_img
        "earlyfusion_img_vslt": EARLYFUSION,
        "earlyfusion_img_vslt_v2": EARLYFUSION,
        "latefusion_img_trans_vslt_grud": part(LATEFUSION, vslt_kind="grud"),
        "latefusion_img_trans_vslt_ttrans": part(LATEFUSION,
                                                 vslt_kind="ttrans"),
        "midfusion_img_trans_vslt_grud": part(MIDFUSION, vslt_kind="grud"),
        "midfusion_img_trans_vslt_ttrans": part(MIDFUSION,
                                                vslt_kind="ttrans"),
        "cross_transformer_img_vslt_sssccc": CROSS_TRANSFORMER,
        "mbt_v1_img": TRI_MBT_V1,
        # 5_bi_vslt_txt
        "earlyfusion_vslt_txt_transformer": EARLYFUSION,
        "latefusion_vslt_txt_transformer": part(LATEFUSION,
                                                vslt_kind="ttrans"),
        "latefusion_vslt_grud_txt_transformer": part(LATEFUSION,
                                                     vslt_kind="grud"),
        "midfusion_vslt_txt_transformer": part(MIDFUSION,
                                               vslt_kind="ttrans"),
        "cross_transformer_txt_vslt": CROSS_TRANSFORMER,
        "bi_cross_transformer_txt_vslt": CROSS_TRANSFORMER,
        "mbt_v1": TRI_MBT_V1,
        "auxcpc_early": part(AUXCPC, vslt_kind="ttrans", fusion="early"),
        "auxcpc_early2": part(AUXCPC, vslt_kind="ttrans", fusion="early"),
        "auxcpc_early_ct": part(AUXCPC, vslt_kind="ttrans", fusion="cross"),
        "auxcpc_early_direct": part(AUXCPC, vslt_kind="ttrans",
                                    fusion="early"),
        "auxcpc_grudtxt": part(AUXCPC, vslt_kind="grud", fusion="early"),
        "auxcpc_grudtxt_ct": part(AUXCPC, vslt_kind="grud", fusion="cross"),
        "auxcpc_grudtxt_dir": part(AUXCPC, vslt_kind="grud", fusion="early"),
        "auxcpc_mbt": part(AUXCPC, vslt_kind="ttrans", fusion="mbt"),
        "auxcpc_mbt_ct": part(AUXCPC, vslt_kind="ttrans", fusion="mbt"),
        "auxcpc_mbt_direct": part(AUXCPC, vslt_kind="ttrans", fusion="mbt"),
        # 6_tri_vslt_img_txt
        "earlyfusion_img_txt_vslt": EARLYFUSION,
        "mbt_v2": TRI_MBT_VSLTCLS,
    }
    for name, ctor in entries.items():
        register(name, ctor)

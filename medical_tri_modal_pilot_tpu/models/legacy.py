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
from .heads import ClsHead
from .maxvit import MaxViT
from .mbt import MBTFusion
from .models import ModelOutput, model_dtype
from .modules import (CrossmodalTransformerEncoderLayer, MLPStem, encoder_layer, LayerNorm,
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
        x = LayerNorm(dtype=dt, name="final_ln")(enc[:, 0])
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
        x = LayerNorm(dtype=dt, name="final_ln")(enc[:, 0])
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
        x = LayerNorm(dtype=dt, name="final_ln")(feats)
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
        xcls = LayerNorm(dtype=dt, name="final_ln")(enc[:, 0])
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
        h = LayerNorm(dtype=dt, name="layer_norm_in")(x)
        h = h + positional_encoding(h.shape[1], cfg.transformer_dim, dt)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        for i in range(cfg.transformer_num_layers):
            h = encoder_layer(
                cfg.transformer_dim, cfg.transformer_num_head,
                cfg.transformer_dim * 4, cfg.dropout, dt,
                name=f"layers_{i}")(h, key_mask, deterministic)
        x = LayerNorm(dtype=dt, name="final_ln")(h[:, 0])
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
        x = LayerNorm(dtype=dt, name="final_ln")(
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
        lv = _head(cfg, LayerNorm(dtype=dt, name="v_ln")(v),
                   deterministic, name="fc_vslt")
        lo = _head(cfg, LayerNorm(dtype=dt, name="o_ln")(o),
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
            v = encoder_layer(
                cfg.transformer_dim, cfg.transformer_num_head,
                cfg.transformer_dim * 4, cfg.dropout, dt,
                name=f"self_v_{i}")(v, v_mask, deterministic)
            o = encoder_layer(
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
        x = LayerNorm(dtype=dt, name="final_ln")(nn.relu(x))
        return _head(cfg, x, deterministic), None, None


# ---------------------------------------------------------------------------
# 5_bi_vslt_txt auxcpc_* — contrastive auxiliary losses
# ---------------------------------------------------------------------------

def _cosine_rows(a, b, eps=1e-7):
    """Per-row cosine similarity (torch CosineSimilarity(dim=1) semantics:
    denominator clamped at eps, auxcpc_early.py:131)."""
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


T_SAMPLES = 24     # CPC split point (auxcpc_early.py:161)
CPC_STEPS = 12     # predicted future steps (ct_weight leading dim, :105)


class AUXCPC(nn.Module):
    """vslt+txt CPC family (5_bi_vslt_txt/auxcpc_*.py — 10 files spanning
    three fusion/targets wirings x two vslt encoders).

    The vslt stream is encoded into z ([B, L, D], transformer or GRU-D by
    ``vslt_kind``); when the window extends past t=24 steps (pretrain
    windows, auxcpc_early.py:172-180) the 12 steps after t=24 become
    auxiliary targets and the fusion sees only the past. ``fusion``:
    'early' = joint [cls, z, txt] encoder (auxcpc_early.py:183-189);
    'mbt' = bimodal bottleneck fusion, c_t = concat of both cls tokens +
    LayerNorm (auxcpc_mbt.py:83-97,181-182). ``wiring``:

      'predict' (early/early2/grudtxt/mbt): pred[t] = c_t @ ct_weight[t]
          ([12, ct_dim, D] init uniform +-sqrt(ct_dim), :105-106), optional
          'Wbrl' BatchNorm+act+Linear head (:109-113); loss vs the future
          *encoded* steps: 'cpc' = in-batch softmax over [12B, 12B] scores
          with invalid targets and same-sample non-positive pairs masked at
          -65504 (:121-127,199-205), 'cosine'/'l2' elementwise; all
          f_indices-weighted.
      'ct' (*_ct): c_t LayerNormed (auxcpc_early_ct.py:93-95); the future
          steps + text run through the SAME fusion to a mirror cls
          (:200-207); loss = -cos(flatten, flatten) (CosineSimilarity
          dim=0, :134) or mean-l2; a 'cpc' loss type has no branch in the
          _ct files and contributes 0.
      'direct' (*_direct/_dir): 'predict' with ct_weight [12, ct_dim, F]
          and the 12 future *raw* inputs as targets
          (auxcpc_early_direct.py:107,178-181). The reference's 'Wbrl'
          head is hardcoded to 256 features and would crash here; we size
          it to the target dim.

    ``post_ln`` adds the post-concat LayerNorm that distinguishes
    auxcpc_early2 (auxcpc_early2.py diff: LN only)."""
    cfg: Config
    vslt_kind: str = "ttrans"
    fusion: str = "early"
    wiring: str = "predict"
    post_ln: bool = False

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        D = cfg.transformer_dim
        x_raw, _m, _d = _unpack_carryforward(batch)
        # --- encode both streams
        if self.vslt_kind == "grud":
            x_mean = jnp.asarray(cfg.feature_means, dtype=dt)
            _, z = GRUDEncoder(D, dtype=dt, name="grud")(
                x_raw.astype(dt), _m.astype(dt), _d.astype(dt), x_mean,
                batch["input_length"])
        else:
            z = _VsltTokens(cfg, dt, name="vslt_tokens")(batch)
        t_tokens = _TxtTokens(cfg, dt, name="txt_tokens")(batch["txt"])
        B, Lv = z.shape[0], z.shape[1]
        t_valid = ~length_key_mask(
            jnp.clip(batch["txt_length"].astype(jnp.int32) + 2, 1,
                     t_tokens.shape[1]), t_tokens.shape[1])

        # --- CPC future split (static: Lv is a trace-time constant)
        has_future = Lv > T_SAMPLES
        if has_future:
            T = min(CPC_STEPS, Lv - T_SAMPLES)
            enc_samples = z[:, T_SAMPLES:T_SAMPLES + T]           # [B, T, D]
            raw_samples = x_raw[:, T_SAMPLES:T_SAMPLES + T]       # [B, T, F]
            f = batch["f_indices"][:, -CPC_STEPS:][:, :T].astype(jnp.float32)
            z_in = z[:, :T_SAMPLES]
        else:
            z_in = z
        v_valid = ~length_key_mask(batch["input_length"].astype(jnp.int32),
                                   z_in.shape[1])

        # --- fusion (module instances created once; 'ct' reuses them for
        # the mirror pass => shared weights, auxcpc_early_ct.py:200-205)
        if self.fusion == "mbt":
            mbt = MBTFusion(
                n_modality=2, bottlenecks_n=4,
                fusion_startidx=cfg.mbt_fusion_startidx,
                n_layers=cfg.transformer_num_layers,
                n_head=cfg.transformer_num_head, d_model=D, d_ff=D * 4,
                dropout=cfg.dropout, pe_maxlen=600, txt_idx=1,
                use_pe=(True, True), mask=(True, True), dtype=dt,
                name="c_t_model")
            ln_cat = LayerNorm(dtype=dt, name="layer_norms_after_concat")

            def fuse(v_toks, v_len, first: bool):
                outs = mbt([v_toks, t_tokens],
                           [v_len, batch["txt_length"].astype(jnp.int32) + 2],
                           jnp.zeros((B,), jnp.int32), deterministic)
                return jnp.concatenate([outs[0][:, 0], outs[1][:, 0]], -1)

            c_t = ln_cat(fuse(z_in, batch["input_length"].astype(jnp.int32),
                              True))
        else:
            cls = self.param("cls_tokens", nn.initializers.zeros, (1, 1, D))
            ln_in = LayerNorm(dtype=dt, name="layer_norm_in")
            layers = [encoder_layer(
                D, cfg.transformer_num_head, D * 4, cfg.dropout, dt,
                name=f"layers_{i}") for i in range(cfg.transformer_num_layers)]

            def fuse(v_toks, v_val, t_val):
                xx = jnp.concatenate(
                    [jnp.broadcast_to(cls, (B, 1, D)).astype(dt),
                     v_toks, t_tokens], axis=1)
                km = ~jnp.concatenate(
                    [jnp.ones((B, 1), dtype=bool), v_val, t_val], axis=1)
                h = ln_in(xx)
                h = h + positional_encoding(h.shape[1], D, dt)
                for lyr in layers:
                    h = lyr(h, km, deterministic)
                return h[:, 0]

            c_t = fuse(z_in, v_valid, t_valid)
            if self.post_ln or self.wiring == "ct":
                c_t = LayerNorm(
                    dtype=dt, name="layer_norms_after_concat")(c_t)

        logits = _head(cfg, c_t, deterministic)

        # --- auxiliary loss
        aux = jnp.zeros((), jnp.float32)
        aux_type = cfg.auxiliary_loss_type or ""
        if has_future:
            c32 = c_t.astype(jnp.float32)
            if self.wiring == "ct":
                if self.fusion == "mbt":
                    mirror = fuse(enc_samples,
                                  jnp.full((B,), T, jnp.int32), False)
                    mirror = LayerNorm(
                        dtype=dt,
                        name="layer_norms_after_concat_mirror")(mirror)
                else:
                    mirror = fuse(enc_samples,
                                  jnp.ones((B, T), dtype=bool), t_valid)
                    mirror = LayerNorm(
                        dtype=dt,
                        name="layer_norms_after_concat_mirror")(mirror)
                m32 = mirror.astype(jnp.float32)
                if "cosine" in aux_type:
                    # CosineSimilarity(dim=0) over the flattened batch —
                    # one scalar (auxcpc_early_ct.py:134,210)
                    aux = -_cosine_rows(c32.reshape(1, -1),
                                        m32.reshape(1, -1))[0]
                elif "l2" in aux_type:
                    aux = jnp.mean((c32 - m32) ** 2)
                # 'cpc' with ct wiring: no branch in the reference -> 0
            else:
                tgt = (raw_samples if self.wiring == "direct"
                       else enc_samples).astype(jnp.float32)      # [B, T, F]
                Fd = tgt.shape[-1]
                ct_dim = c_t.shape[-1]
                lim = float(ct_dim) ** 0.5
                ctw = self.param(
                    "ct_weight",
                    lambda k, s: jax.random.uniform(
                        k, s, jnp.float32, -lim, lim),
                    (T, ct_dim, Fd))
                pred = jnp.einsum("bd,tdf->btf", c32, ctw)        # [B, T, F]
                if "Wbrl" in aux_type:
                    pred = nn.BatchNorm(
                        use_running_average=deterministic, axis=-1,
                        momentum=0.9, epsilon=1e-5, name="brl_bn")(pred)
                    pred = nn.relu(pred) if cfg.activation == "relu" \
                        else nn.selu(pred)
                    pred = nn.Dense(Fd, name="brl_fc")(pred)
                pf = pred.reshape(-1, Fd)                         # [BT, F]
                tf_ = tgt.reshape(-1, Fd)
                fv = f.reshape(-1)                                # [BT]
                if "cpc" in aux_type:
                    total = pf @ tf_.T                            # [BT, BT]
                    total = jnp.where(fv[None, :] != 1, -65504.0, total)
                    idx = jnp.arange(B * T)
                    same = (idx[:, None] // T) == (idx[None, :] // T)
                    offdiag = same & (idx[:, None] != idx[None, :])
                    total = jnp.where(offdiag, -65504.0, total)
                    diag_p = jnp.diagonal(jax.nn.softmax(total, axis=1))
                    aux = jnp.sum(jnp.log(diag_p * fv + 1e-7) * fv) / (
                        -1.0 * jnp.maximum(jnp.sum(fv), 1.0))
                elif "cosine" in aux_type:
                    per = _cosine_rows(pf, tf_)
                    aux = -(jnp.sum(per * fv)
                            / jnp.maximum(jnp.sum(fv), 1.0))
                elif "l2" in aux_type:
                    per = jnp.mean((pf - tf_) ** 2, axis=1)
                    aux = jnp.sum(per * fv) / jnp.maximum(jnp.sum(fv), 1.0)
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
        # fusion x wiring per reference file (see AUXCPC docstring)
        "auxcpc_early": part(AUXCPC, vslt_kind="ttrans", fusion="early",
                             wiring="predict"),
        "auxcpc_early2": part(AUXCPC, vslt_kind="ttrans", fusion="early",
                              wiring="predict", post_ln=True),
        "auxcpc_early_ct": part(AUXCPC, vslt_kind="ttrans", fusion="early",
                                wiring="ct"),
        "auxcpc_early_direct": part(AUXCPC, vslt_kind="ttrans",
                                    fusion="early", wiring="direct",
                                    post_ln=True),
        "auxcpc_grudtxt": part(AUXCPC, vslt_kind="grud", fusion="early",
                               wiring="predict"),
        "auxcpc_grudtxt_ct": part(AUXCPC, vslt_kind="grud", fusion="early",
                                  wiring="ct"),
        "auxcpc_grudtxt_dir": part(AUXCPC, vslt_kind="grud", fusion="early",
                                   wiring="direct", post_ln=True),
        "auxcpc_mbt": part(AUXCPC, vslt_kind="ttrans", fusion="mbt",
                           wiring="predict"),
        "auxcpc_mbt_ct": part(AUXCPC, vslt_kind="ttrans", fusion="mbt",
                              wiring="ct"),
        "auxcpc_mbt_direct": part(AUXCPC, vslt_kind="ttrans", fusion="mbt",
                                  wiring="direct"),
        # 6_tri_vslt_img_txt
        "earlyfusion_img_txt_vslt": EARLYFUSION,
        "mbt_v2": TRI_MBT_VSLTCLS,
    }
    for name, ctor in entries.items():
        register(name, ctor)

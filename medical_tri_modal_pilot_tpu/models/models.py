"""The live model family (reference builder/models/8_missing_models/*).

Every model shares the same input contract (a dict of statically-shaped
arrays, see data/dataset.py) and returns ``(logits, rmse, aux)`` like the
reference's uniform 18-arg forward (tri_mbt_vsltcls.py:167).

A shared ``MBTBackbone`` factors the copy-pasted UMSE + image/text encoding
+ fusion blocks of the reference files; heads differ per model:

  tri_mbt_vsltcls      vslt-cls + demo -> fc (tri_mbt_vsltcls.py:248-255)
  tri_mbt_v1/v2/v3     per-modality cls -> fc -> missing-aware mean
                       (tri_mbt_v1.py:269-280)
  tri_mbt_vflexible*   learned masked-softmax cls weighting
                       (tri_mbt_vflexible.py:148,276-289)
  tri_mbt_vnosh*avgtr  3 non-shared heads (tri_mbt_vnoshnoavgtr.py:259-281)
  *_mt_v1              concat-fusion baseline (encoder.py:120-249)
  unimodal_transformer vslt-only encoder (unimodal_transformer.py:67-124)

The reference's biimg_mbt_vsltcls is dead code (debug exit(1) mid-forward,
biimg_mbt_vsltcls.py:268) and bitxt_mbt_vsltcls indexes a 2-element stack at
[2] (would raise); both are implemented here functionally as bimodal MBT
with candidates {mean, vslt-only}.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..constants import IMG_FEATURE_ID, TXT_FEATURE_ID
from .encoder import MTFusion, TransformerEncoder
from .heads import ClsHead, ClsHeadLN
from .mbt import MBTFusion
from .modules import MLPStem, LayerNorm
from .swin import PatchEmbed, SwinTransformer
from .umse import UMSE
from .vit import VisionTransformer

ModelOutput = Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]


def model_dtype(cfg: Config) -> jnp.dtype:
    return jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32


class ImageEncoder(nn.Module):
    """swin/vit/patch-embed stem -> [B, N, d_model] tokens
    (tri_mbt_vsltcls.py:83-118, :202-214). The swin path is frozen
    (torch.no_grad, :208-209) — stop_gradient here.

    ``freeze_override``: None = flagship rule (freeze swin iff pretrained);
    True = always freeze the swin trunk (tri_mbt_v1.py:228 wraps the call
    in no_grad unconditionally); False = always trainable (tri_mbt_v2.py:
    211). ``stem_override='patch'`` forces the MONAI patch-embed stem
    regardless of --img-model-type (tri_mbt_v3.py:86-96,187)."""
    cfg: Config
    dtype: jnp.dtype = jnp.float32
    freeze_override: Optional[bool] = None
    stem_override: Optional[str] = None
    allow_multiimages: bool = True

    def _packed_trunk(self, swin, img, present, deterministic):
        """Presence-packed frozen trunk (--img-pack). In missing-modality
        regimes most rows carry a zero image (reference loads images only
        for type codes 0/5, dataset_new.py:677-689), yet the reference runs
        the full swin over every row (tri_mbt_vsltcls.py:205-214). Numerically
        EXACT skip: swin is frozen+eval here (no RNG, no grad), so every
        missing row's features equal swin(0) — run the trunk over the
        present rows packed to a static capacity plus one shared zero row,
        and gather features back per row. Batches whose present count
        overflows the capacity take the full-batch branch of an in-graph
        lax.cond instead (both branches static shapes, one executes)."""
        cfg = self.cfg
        rows = img.shape[0]
        # frac < 0 = unresolved auto (2_train resolves it from the train
        # sampler via pipeline.auto_img_pack_frac before building the
        # model; direct construction — bench, tests — falls back to 0.5)
        frac = cfg.img_pack_frac if cfg.img_pack_frac > 0 else 0.5
        cap = max(1, min(rows - 1, int(-(-rows * frac // 1))))
        # multi-device mesh: round the packed row count (cap+1) up to a
        # multiple of the data-axis size so the shard_map'd swin kernels
        # keep their partitioned path (modules.set_pack_alignment; an
        # unaligned count degrades to all-gathered bare pallas_calls)
        from .modules import get_pack_alignment
        align = get_pack_alignment()
        if align > 1:
            packed = -((cap + 1) // -align) * align
            cap = max(min(packed, rows) - 1, 1)
        present = present.astype(bool).reshape(rows)
        n_present = jnp.sum(present.astype(jnp.int32))
        order = jnp.argsort(jnp.logical_not(present), stable=True)
        inv = jnp.argsort(order)

        def _full(mdl, x):
            return mdl(x, True)

        def _packed(mdl, x):
            packed = jnp.concatenate(
                [jnp.take(x, order[:cap], axis=0), jnp.zeros_like(x[:1])], 0)
            f = mdl(packed, True)
            src = jnp.where(present & (inv < cap), inv, cap)
            return jnp.take(f, src, axis=0)

        return nn.cond(n_present <= cap, _packed, _full, swin, img)

    @nn.compact
    def __call__(self, img, deterministic: bool = True, present=None):
        cfg = self.cfg
        if self.stem_override == "patch":
            return PatchEmbed(img_size=cfg.image_size, patch_size=16,
                              hidden=cfg.transformer_dim, dtype=self.dtype,
                              name="patch_embedding")(img)
        if cfg.img_model_type == "vit":
            feats = VisionTransformer(in_channels=1, image_size=cfg.image_size,
                                      dtype=self.dtype, name="img_encoder")(
                                          img, deterministic)
            return nn.Dense(cfg.transformer_dim, dtype=self.dtype,
                            name="linear")(feats)
        if cfg.img_model_type == "swin":
            if cfg.multiimages == 1 and self.allow_multiimages:
                img = img.reshape(-1, 1, cfg.image_size, cfg.image_size)
            freeze = (cfg.img_pretrain == "Yes" if self.freeze_override is None
                      else self.freeze_override)
            # a frozen trunk runs in eval mode (the reference constructor
            # calls img_encoder.eval(), tri_mbt_vsltcls.py:104), so
            # stochastic depth only fires on the trainable-trunk path
            swin = SwinTransformer(in_channels=1, dtype=self.dtype,
                                   name="img_encoder")
            pack = (freeze and present is not None
                    and (cfg.img_pack == 1
                         or (cfg.img_pack == -1
                             and "missing" in cfg.modality_inclusion)))
            if pack:
                feats = self._packed_trunk(swin, img, present, deterministic)
            else:
                feats = swin(img, deterministic or freeze)
            if freeze:
                feats = jax.lax.stop_gradient(feats)
            B = feats.shape[0]
            feats = feats.reshape(B, -1, feats.shape[-1])      # [B, 49, 768]
            return nn.Dense(cfg.transformer_dim, dtype=self.dtype,
                            name="linear")(feats)
        return PatchEmbed(img_size=cfg.image_size, patch_size=16,
                          hidden=cfg.transformer_dim, dtype=self.dtype,
                          name="patch_embedding")(img)


class MBTBackbone(nn.Module):
    """UMSE stems + modality encoders + MBT fusion. ``modalities`` selects
    which streams feed the fusion ('vslt_img_txt', 'vslt_img', 'vslt_txt')."""
    cfg: Config
    share_umse: bool = True
    # v1/v2/v3 wiring knobs (see ImageEncoder / TRI_MBT_V1 docstrings)
    img_freeze_override: Optional[bool] = None
    img_stem_override: Optional[str] = None
    allow_multiimages: bool = True
    allow_resbottle: bool = True
    # bi_vsltimg_mbt_v1.py:130 passes use_pe=[vslt_pe, True] — the single
    # image stream gets a positional encoding there (the trimodal files
    # use False); quirk preserved via this knob
    img_use_pe: bool = False

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], missing_num: jnp.ndarray,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = model_dtype(cfg)
        mods = cfg.input_types.split("_")
        multiimages = cfg.multiimages == 1 and self.allow_multiimages
        umse = UMSE(cfg.transformer_dim, cfg.vslt_type, cfg.berttype,
                    cfg.imgtxt_time, cfg.vslt_len, dtype=dt, name="umse")
        vslt_tokens, demo = umse.embed_vslt(batch["vslt"], batch["static"][:, 1],
                                            batch["static"][:, 0])
        enc_inputs = [vslt_tokens]
        varying = [batch["input_length"].astype(jnp.int32)]
        use_pe = [cfg.vslt_type == "carryforward"]
        mask = [True]

        img_tokens = None
        if "img" in mods:
            if not self.share_umse:
                img_umse = UMSE(cfg.transformer_dim, cfg.vslt_type, cfg.berttype,
                                cfg.imgtxt_time, cfg.vslt_len, dtype=dt,
                                name="umse_img")
            if multiimages:
                # per-slot presence: absent slots carry img_time == 10
                # (dataset_new.py:736, data/dataset.py:85-86)
                img_present = batch["img_time"].reshape(-1) != 10.0
            else:
                img_present = batch["missing"][:, 1] == 0.0
            img_tokens = ImageEncoder(
                cfg, dtype=dt, freeze_override=self.img_freeze_override,
                stem_override=self.img_stem_override,
                allow_multiimages=self.allow_multiimages, name="img_enc")(
                    batch["img"], deterministic, present=img_present)
            img_time = batch["img_time"]
            if cfg.imgtxt_time == 1:
                stems = umse if self.share_umse else img_umse
                img_tokens = stems.add_time_feature(
                    img_tokens, img_time.reshape(-1), IMG_FEATURE_ID, demo)
            if multiimages:
                B = batch["vslt"].shape[0]
                img_tokens = img_tokens.reshape(B, -1, cfg.transformer_dim)
                n_real = jnp.count_nonzero(
                    batch["img_time"].reshape(B, 3) - 10, axis=1)
                img_len = (n_real * 49).astype(jnp.int32)
                mask.append(True)
            else:
                img_len = jnp.full((img_tokens.shape[0],), img_tokens.shape[1],
                                   dtype=jnp.int32)
                mask.append(False)   # single-image stack runs unmasked
            enc_inputs.append(img_tokens)
            varying.append(img_len)
            use_pe.append(self.img_use_pe)

        if "txt" in mods:
            if not self.share_umse:
                txt_umse = UMSE(cfg.transformer_dim, cfg.vslt_type, cfg.berttype,
                                cfg.imgtxt_time, cfg.vslt_len, dtype=dt,
                                name="umse_txt")
                txt_tokens = txt_umse.embed_txt(batch["txt"])
            else:
                txt_tokens = umse.embed_txt(batch["txt"])
            if txt_tokens.ndim == 2:
                txt_tokens = txt_tokens[:, None, :]   # cls-token biobert path
            if cfg.imgtxt_time == 1:
                stems = umse if self.share_umse else txt_umse
                txt_tokens = stems.add_time_feature(
                    txt_tokens, batch["txt_time"], TXT_FEATURE_ID, demo)
            enc_inputs.append(txt_tokens)
            varying.append(batch["txt_length"].astype(jnp.int32) + 2)
            use_pe.append(True)
            mask.append(True)

        n_mod = len(enc_inputs)
        txt_idx = mods.index("txt") if "txt" in mods else -1
        fusion = MBTFusion(
            n_modality=n_mod,
            bottlenecks_n=cfg.mbt_bottlenecks_n,
            fusion_startidx=cfg.mbt_fusion_startidx,
            n_layers=cfg.transformer_num_layers,
            n_head=cfg.transformer_num_head,
            d_model=cfg.transformer_dim,
            d_ff=cfg.transformer_dim * 4,
            dropout=cfg.dropout,
            txt_idx=txt_idx,
            vsltonly=cfg.mbt_only_vslt,
            resbottle=cfg.residual_bottlenecks == 1 and self.allow_resbottle,
            use_pe=tuple(use_pe),
            mask=tuple(mask),
            dtype=dt,
            name="fusion_transformer")
        outputs = fusion(enc_inputs, varying, missing_num, deterministic)
        return outputs, demo


def _class_input(cfg: Config, cls_vec, demo, name_scope):
    h = LayerNorm(dtype=cls_vec.dtype, name=f"{name_scope}_ln")(cls_vec)
    if cfg.vslt_type != "QIE":
        h = jnp.concatenate([h, demo.astype(h.dtype)], axis=-1)
    return h


class TRI_MBT_VSLTCLS(nn.Module):
    """Flagship: classify from the vslt cls token + demographics
    (tri_mbt_vsltcls.py:248-255)."""
    cfg: Config
    share_umse: bool = True

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        outputs, demo = MBTBackbone(cfg, self.share_umse, name="backbone")(
            batch, missing_num, deterministic)
        x = _class_input(cfg, outputs[0][:, 0, :], demo, "after_concat")
        rmse = None
        if "rmse" in cfg.auxiliary_loss_type:
            rmse = nn.Dense(1, dtype=x.dtype, name="rmse_layer")(x)[..., 0]
        logits = ClsHead(cfg.transformer_dim, cfg.output_dim, cfg.activation,
                         dtype=x.dtype, name="fc_list")(x, deterministic)
        return logits[..., 0] if cfg.output_dim == 1 else logits, rmse, None


class TRI_MBT_VSLTCLS_NOSHAREUMSE(TRI_MBT_VSLTCLS):
    share_umse: bool = False


class TRI_MBT_V1(nn.Module):
    """Per-modality cls heads, missing-aware mean of logits
    (tri_mbt_v1.py:269-280). The three reference variants differ in wiring,
    not head math:

      variant 1 (tri_mbt_v1.py): LayerNorm fc head (:157), swin trunk frozen
        unconditionally (no_grad, :228), multiimages + residual-bottleneck
        support (:120-128), no rmse output (forward returns output2=None).
      variant 2 (tri_mbt_v2.py): BatchNorm1d fc head (:144), trainable img
        encoder (:211), fixed mask=[True,False,True] / no resbottle /
        no multiimages (:133), rmse mixing when configured (:240-247).
      variant 3 (tri_mbt_v3.py): variant 2 with the image stem forced to the
        MONAI patch embed regardless of --img-model-type (:86-96,187).
    """
    cfg: Config
    variant: int = 1

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        v = self.variant
        outputs, demo = MBTBackbone(
            cfg,
            img_freeze_override=True if v == 1 else False,
            img_stem_override="patch" if v == 3 else None,
            allow_multiimages=(v == 1),
            allow_resbottle=(v == 1),
            name="backbone")(batch, missing_num, deterministic)
        stack = jnp.stack([o[:, 0, :] for o in outputs])          # [M, B, D]
        stack = LayerNorm(dtype=stack.dtype, name="after_concat_ln")(stack)
        if cfg.vslt_type != "QIE":
            demo_rep = jnp.broadcast_to(demo[None], (stack.shape[0],) + demo.shape)
            stack = jnp.concatenate([stack, demo_rep.astype(stack.dtype)], axis=-1)
        head_cls = ClsHeadLN if v == 1 else ClsHead
        out_dim = 1 if v == 1 else cfg.output_dim  # v1 forces 1 (:26)
        logits = head_cls(cfg.transformer_dim, out_dim, cfg.activation,
                          dtype=stack.dtype, name="fc_list")(
                              stack, deterministic)               # [M, B, O]
        W = jnp.array([[1 / 3, 1 / 3, 1 / 3], [1 / 2, 1 / 2, 0],
                       [1 / 2, 0, 1 / 2], [1, 0, 0]], dtype=jnp.float32)
        onehot = jax.nn.one_hot(missing_num, 4, dtype=jnp.float32)
        mix = jnp.einsum("bk,km->bm", onehot, W,
                         precision=jax.lax.Precision.HIGHEST
                         ).astype(logits.dtype)                   # [B, M]
        out = jnp.einsum("bm,mbo->bo", mix, logits,
                         precision=jax.lax.Precision.HIGHEST)
        out = out[..., 0] if out_dim == 1 else out
        rmse = None
        if v != 1 and "rmse" in cfg.auxiliary_loss_type:
            # per-modality rmse heads mixed the same missing-aware way
            # (tri_mbt_v2.py:240-247); v1's rmse path is dead in the
            # reference (output2=None, tri_mbt_v1.py:282)
            r = nn.Dense(1, dtype=stack.dtype,
                         name="rmse_layer")(stack)[..., 0]        # [M, B]
            rmse = jnp.einsum("bm,mb->b", mix, r,
                              precision=jax.lax.Precision.HIGHEST)
        return out, rmse, None


class BI_MBT_V1(nn.Module):
    """bi_vslttxt_mbt_v1 / bi_vsltimg_mbt_v1: missing-selected mean of the
    two cls VECTORS (not logits) -> LayerNorm -> (+demo) -> one shared BN
    head (bi_vslttxt_mbt_v1.py:167-183, bi_vsltimg_mbt_v1.py). The dynamic
    ``all_cls_stack[missing, idx_order]`` select becomes a one-hot x
    constant (2,2) mix over {mean(vslt, other), vslt-only}.

    Wiring quirks per reference file: the swin trunk runs under
    unconditional no_grad (bi_vsltimg_mbt_v1.py forward), and the image
    stream gets use_pe=True / mask=False there (:128-131) while the text
    variant uses mask=True (bi_vslttxt_mbt_v1.py:94-95)."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        outputs, demo = MBTBackbone(
            cfg,
            img_freeze_override=True,
            allow_multiimages=False,
            allow_resbottle=False,
            img_use_pe=True,
            name="backbone")(batch, missing_num, deterministic)
        cls0 = outputs[0][:, 0, :]
        cls1 = outputs[1][:, 0, :]
        W = jnp.array([[0.5, 0.5], [1.0, 0.0]], dtype=jnp.float32)
        onehot = jax.nn.one_hot(missing_num, 2, dtype=jnp.float32)
        mix = jnp.einsum("bk,km->bm", onehot, W,
                         precision=jax.lax.Precision.HIGHEST
                         ).astype(cls0.dtype)                      # [B, 2]
        sel = mix[:, :1] * cls0 + mix[:, 1:] * cls1
        x = _class_input(cfg, sel, demo, "after_concat")
        rmse = None
        if "rmse" in cfg.auxiliary_loss_type:
            rmse = nn.Dense(1, dtype=x.dtype, name="rmse_layer")(x)[..., 0]
        logits = ClsHead(cfg.transformer_dim, cfg.output_dim, cfg.activation,
                         dtype=x.dtype, name="fc_list")(x, deterministic)
        return logits[..., 0] if cfg.output_dim == 1 else logits, rmse, None


class TRI_MBT_VFLEXIBLE(nn.Module):
    """Learned missing-aware cls weighting: a (3,1) parameter masked by the
    available-modality pattern, softmaxed over modalities, weighting
    per-modality logits (tri_mbt_vflexible.py:148,269-289).

    ``flex_temp`` is the only difference between the three reference
    variants — the masked weights are scaled by 10 in tri_mbt_vflexible2
    (vflexible2.py:279) and by 3.334 in tri_mbt_vflexible3
    (vflexible3.py:279) before the softmax (applied AFTER the -1e9 fill,
    as in the reference)."""
    cfg: Config
    flex_temp: float = 1.0

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        outputs, demo = MBTBackbone(cfg, name="backbone")(
            batch, missing_num, deterministic)
        stack = jnp.stack([o[:, 0, :] for o in outputs])          # [3, B, D]
        stack = LayerNorm(dtype=stack.dtype, name="after_concat_ln")(stack)
        if cfg.vslt_type != "QIE":
            demo_rep = jnp.broadcast_to(demo[None], (3,) + demo.shape)
            stack = jnp.concatenate([stack, demo_rep.astype(stack.dtype)], axis=-1)
        # LayerNorm head, not BatchNorm (tri_mbt_vflexible.py:175)
        logits = ClsHeadLN(cfg.transformer_dim, cfg.output_dim, cfg.activation,
                           dtype=stack.dtype, name="fc_list")(
                               stack, deterministic)[..., 0]      # [3, B]
        flexavg = self.param("flexibleavg", nn.initializers.zeros, (3, 1))
        # availability masks per missing case (tri_mbt_vflexible.py:150-165):
        # rows: tri, v+i, v+t, v; True = modality masked out of the softmax
        avail_mask = jnp.array([[False, False, False],
                                [False, False, True],
                                [False, True, False],
                                [False, True, True]])
        m = avail_mask[missing_num]                               # [B, 3]
        w = jnp.broadcast_to(flexavg, (3, logits.shape[1])).astype(jnp.float32)
        w = jnp.where(m.T, -1e9, w) * self.flex_temp
        cls_weight = jax.nn.softmax(w, axis=0).astype(logits.dtype)
        weighted = logits * cls_weight                            # [3, B]
        tri = jnp.sum(weighted, axis=0)
        vi = weighted[0] + weighted[1]
        vt = weighted[0] + weighted[2]
        v = weighted[0]
        cands = jnp.stack([tri, vi, vt, v])                       # [4, B]
        onehot = jax.nn.one_hot(missing_num, 4, dtype=cands.dtype)
        out = jnp.einsum("bk,kb->b", onehot, cands,
                         precision=jax.lax.Precision.HIGHEST)
        return out, None, None


class TRI_MBT_VNOSHNOAVGTR(nn.Module):
    """Three non-shared heads over per-modality cls tokens; the trainer
    masks/averages them (trainer.py:169-174,223-230). Returns [3, B]."""
    cfg: Config
    avg_in_model: bool = False

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        outputs, demo = MBTBackbone(cfg, name="backbone")(
            batch, missing_num, deterministic)
        stack = jnp.stack([o[:, 0, :] for o in outputs])
        stack = LayerNorm(dtype=stack.dtype, name="after_concat_ln")(stack)
        if cfg.vslt_type != "QIE":
            demo_rep = jnp.broadcast_to(demo[None], (3,) + demo.shape)
            stack = jnp.concatenate([stack, demo_rep.astype(stack.dtype)], axis=-1)
        rmse = None
        if "rmse" in cfg.auxiliary_loss_type:
            rmse = nn.Dense(1, dtype=stack.dtype, name="rmse_layer")(stack)[..., 0]
        logits = []
        for m in range(3):
            logits.append(ClsHead(cfg.transformer_dim, cfg.output_dim,
                                  cfg.activation, dtype=stack.dtype,
                                  name=f"fc_list_{m}")(stack[m], deterministic)[..., 0])
        out = jnp.stack(logits)                                   # [3, B]
        if self.avg_in_model:
            tri = jnp.mean(out, axis=0)
            vi = (out[0] + out[1]) / 2
            vt = (out[0] + out[2]) / 2
            cands = jnp.stack([tri, vi, vt, out[0]])
            onehot = jax.nn.one_hot(missing_num, 4, dtype=cands.dtype)
            return jnp.einsum("bk,kb->b", onehot, cands,
                              precision=jax.lax.Precision.HIGHEST), rmse, None
        return out, rmse, None


class TRI_MBT_VNOSHAVGTR(TRI_MBT_VNOSHNOAVGTR):
    avg_in_model: bool = True


class MT_FUSION_MODEL(nn.Module):
    """Concat-fusion baseline (tri_mt_v1 / biimg_mt_v1 / bitxt_mt_v1):
    modality stacks -> joint stack over concatenated tokens, classify from
    the final cls token."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        mods = cfg.input_types.split("_")
        umse = UMSE(cfg.transformer_dim, cfg.vslt_type, cfg.berttype,
                    cfg.imgtxt_time, cfg.vslt_len, dtype=dt, name="umse")
        vslt_tokens, demo = umse.embed_vslt(batch["vslt"], batch["static"][:, 1],
                                            batch["static"][:, 0])
        enc_inputs = [vslt_tokens]
        varying = [batch["input_length"].astype(jnp.int32)]
        mask = [True]
        if "img" in mods:
            img_tokens = ImageEncoder(cfg, dtype=dt, name="img_enc")(
                batch["img"], deterministic)
            enc_inputs.append(img_tokens)
            varying.append(jnp.full((img_tokens.shape[0],), img_tokens.shape[1],
                                    dtype=jnp.int32))
            mask.append(False)
        if "txt" in mods:
            txt_tokens = umse.embed_txt(batch["txt"])
            if txt_tokens.ndim == 2:
                txt_tokens = txt_tokens[:, None, :]
            enc_inputs.append(txt_tokens)
            varying.append(batch["txt_length"].astype(jnp.int32) + 1)
            mask.append(True)
        txt_idx = mods.index("txt") if "txt" in mods else -1
        joint = MTFusion(n_modality=len(enc_inputs),
                         fusion_startidx=cfg.mbt_fusion_startidx,
                         n_layers=cfg.transformer_num_layers,
                         n_head=cfg.transformer_num_head,
                         d_model=cfg.transformer_dim,
                         d_ff=cfg.transformer_dim * 4,
                         dropout=cfg.dropout, txt_idx=txt_idx,
                         mask=tuple(mask), dtype=dt,
                         name="fusion_transformer")(enc_inputs, varying,
                                                    deterministic)
        x = _class_input(cfg, joint[:, 0, :], demo, "after_concat")
        logits = ClsHead(cfg.transformer_dim, cfg.output_dim, cfg.activation,
                         dtype=x.dtype, name="fc_list")(x, deterministic)
        return (logits[..., 0] if cfg.output_dim == 1
                else logits), None, None


class UNIMODAL_TRANSFORMER(nn.Module):
    """vslt-only UMSE -> encoder(+cls) -> cls+demo head
    (unimodal_transformer.py:67-124)."""
    cfg: Config

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        cfg = self.cfg
        dt = model_dtype(cfg)
        umse = UMSE(cfg.transformer_dim, cfg.vslt_type, cfg.berttype,
                    cfg.imgtxt_time, cfg.vslt_len, dtype=dt, name="umse")
        tokens, demo = umse.embed_vslt(batch["vslt"], batch["static"][:, 1],
                                       batch["static"][:, 0])
        enc_out = TransformerEncoder(
            d_input=cfg.transformer_dim,
            n_layers=cfg.transformer_num_layers,
            n_head=cfg.transformer_num_head,
            d_model=cfg.transformer_dim,
            d_ff=cfg.transformer_dim * 4,
            dropout=cfg.dropout,
            pe_maxlen=2000,
            use_pe=(cfg.vslt_type == "carryforward"),
            classification=True,
            dtype=dt,
            name="transformer_encoder")(
                tokens, batch["input_length"].astype(jnp.int32) + 1,
                deterministic)
        x = _class_input(cfg, enc_out[:, 0, :], demo, "final")
        logits = ClsHead(cfg.transformer_dim, cfg.output_dim, cfg.activation,
                         dtype=x.dtype, name="fc_list")(x, deterministic)
        return (logits[..., 0] if cfg.output_dim == 1
                else logits), None, None


class _MultitokenBase(nn.Module):
    """Shared embedding path for the vmulti family (tri_mbt_vmulti.py:128+):
    UMSE + image/text encoders feeding a multitoken fusion with
    mask=[True,True,True] and full image varying length."""
    cfg: Config
    vslt_main: bool = False

    def _embed(self, batch, deterministic):
        from .mbt import MultitokenMBTFusion, MultitokenMBTVSLTMAINFusion
        cfg = self.cfg
        dt = model_dtype(cfg)
        umse = UMSE(cfg.transformer_dim, cfg.vslt_type, cfg.berttype,
                    cfg.imgtxt_time, cfg.vslt_len, dtype=dt, name="umse")
        vslt_tokens, demo = umse.embed_vslt(batch["vslt"], batch["static"][:, 1],
                                            batch["static"][:, 0])
        img_tokens = ImageEncoder(cfg, dtype=dt, name="img_enc")(
            batch["img"], deterministic)
        txt_tokens = umse.embed_txt(batch["txt"])
        if txt_tokens.ndim == 2:
            txt_tokens = txt_tokens[:, None, :]
        if cfg.imgtxt_time == 1:
            img_tokens = umse.add_time_feature(
                img_tokens, batch["img_time"].reshape(-1), IMG_FEATURE_ID, demo)
            txt_tokens = umse.add_time_feature(
                txt_tokens, batch["txt_time"], TXT_FEATURE_ID, demo)
        enc_inputs = [vslt_tokens, img_tokens, txt_tokens]
        varying = [batch["input_length"].astype(jnp.int32),
                   jnp.full((img_tokens.shape[0],), img_tokens.shape[1],
                            dtype=jnp.int32),
                   batch["txt_length"].astype(jnp.int32) + 2]
        fusion_cls = (MultitokenMBTVSLTMAINFusion if self.vslt_main
                      else MultitokenMBTFusion)
        fusion = fusion_cls(
            n_modality=3,
            bottlenecks_n=cfg.mbt_bottlenecks_n,
            fusion_startidx=cfg.mbt_fusion_startidx,
            n_layers=cfg.transformer_num_layers,
            n_head=cfg.transformer_num_head,
            d_model=cfg.transformer_dim,
            d_ff=cfg.transformer_dim * 4,
            dropout=cfg.dropout,
            use_pe=(cfg.vslt_type == "carryforward", False, True),
            mask=(True, True, True),
            dtype=dt,
            name="fusion_transformer")
        return fusion, enc_inputs, varying, demo

    def _four_heads(self, stacked, deterministic):
        """stacked: [4, B, D(+demo)] -> [4, B] via 4 non-shared heads."""
        from .heads import ClsHeadLN
        cfg = self.cfg
        outs = []
        for i in range(4):
            outs.append(ClsHeadLN(cfg.transformer_dim, cfg.output_dim,
                                  cfg.activation, dtype=stacked.dtype,
                                  name=f"fc_lists_{i}")(stacked[i],
                                                        deterministic)[..., 0])
        return jnp.stack(outs)


class TRI_MBT_VMULTI(_MultitokenBase):
    """Multitoken MBT, per-case cls heads (tri_mbt_vmulti.py:154-180):
    tri = mean of each modality's cls0; v+i = mean(v cls1, img cls1);
    v+t = mean(v cls2, txt cls1); v = v cls3. Returns [4, B]."""

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        fusion, enc_inputs, varying, demo = self._embed(batch, deterministic)
        outputs = fusion(enc_inputs, varying, missing_num, deterministic)
        tri = (outputs[0][:, 0] + outputs[1][:, 0] + outputs[2][:, 0]) / 3
        vi = (outputs[0][:, 1] + outputs[1][:, 1]) / 2
        vt = (outputs[0][:, 2] + outputs[2][:, 1]) / 2
        v = outputs[0][:, 3]
        final = jnp.stack([tri, vi, vt, v])                   # [4, B, D]
        final = LayerNorm(dtype=final.dtype, name="after_concat_ln")(final)
        demo_rep = jnp.broadcast_to(demo[None], (4,) + demo.shape)
        final = jnp.concatenate([final, demo_rep.astype(final.dtype)], axis=-1)
        return self._four_heads(final, deterministic), None, None


class TRI_MBT_VMULTI2(TRI_MBT_VMULTI):
    """Same head wiring over the VSLTMAIN fusion (tri_mbt_vmulti2.py:154-
    178); img/txt carry no cls there, so their [:, 0]/[:, 1] slots are
    content tokens — reference quirk preserved."""
    vslt_main: bool = True


class TRI_MBT_VMULTIVSLT(_MultitokenBase):
    """VSLTMAIN fusion; classify from the vslt stack's four cls tokens
    (tri_mbt_vmultivslt.py:181-187). Returns [4, B]."""
    vslt_main: bool = True

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True) -> ModelOutput:
        fusion, enc_inputs, varying, demo = self._embed(batch, deterministic)
        outputs = fusion(enc_inputs, varying, missing_num, deterministic)
        final = jnp.stack([outputs[0][:, i] for i in range(4)])
        final = LayerNorm(dtype=final.dtype, name="after_concat_ln")(final)
        demo_rep = jnp.broadcast_to(demo[None], (4,) + demo.shape)
        final = jnp.concatenate([final, demo_rep.astype(final.dtype)], axis=-1)
        return self._four_heads(final, deterministic), None, None

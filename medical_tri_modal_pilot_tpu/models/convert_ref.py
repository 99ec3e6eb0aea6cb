"""Reference (torch) model checkpoints -> flax variables.

The reference saves ``torch.save({'model': state_dict, ...})`` per
checkpoint (builder/utils/logger.py:166-177). This module maps those
state_dicts onto this framework's parameter trees so reference-trained
experiments can be evaluated (and resumed) here — the migration path for a
reference user, and the engine of the run-level golden-parity harness
(tools/golden_parity.py).

Covered models: unimodal_transformer, tri_mbt_vsltcls (tri/bi input types,
multiimages, swin/vit/patch stems), bi_vslttxt_mbt_v1 / bi_vsltimg_mbt_v1,
tri_mbt_v1. Layout rules: torch Linear [out,in] -> flax kernel [in,out];
conv-FFN w_1/w_2 [out,in,1] -> [in,out]; BatchNorm running stats ->
batch_stats; torchvision swin/vit via models/convert.py.

Every consumed key is tracked; unexpected leftovers raise (a silent partial
conversion would corrupt a parity run). Keys with no flax analog (sinusoidal
``pe`` buffers, ``activations.*`` ModuleDict, ``num_batches_tracked``) are
skipped explicitly.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..config import Config
from .convert import convert_swin_t, convert_vit_b_16

Array = np.ndarray


class _SD:
    """state_dict view that records consumed keys."""

    def __init__(self, sd: Dict[str, Array]):
        self.sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
        self.used = set()

    def __contains__(self, k):
        return k in self.sd

    def get(self, k: str) -> Array:
        self.used.add(k)
        return self.sd[k]

    def sub(self, prefix: str) -> Dict[str, Array]:
        out = {}
        for k in self.sd:
            if k.startswith(prefix):
                out[k[len(prefix):]] = self.sd[k]
                self.used.add(k)
        return out

    def leftovers(self):
        ignorable = ("activations.", "patch_embedding.position_embeddings",
                     # every reference fusion encoder constructs a
                     # layer_norms_after_concat it never applies
                     # (mbt_encoder.py:677 vs the model-file head LN)
                     "fusion_transformer.layer_norms_after_concat")
        out = []
        for k in self.sd:
            if k in self.used:
                continue
            if k.endswith("num_batches_tracked") or k.endswith(".pe"):
                continue
            if any(k.startswith(p) or p in k for p in ignorable):
                continue
            out.append(k)
        return out


def _lin(sd: _SD, key: str) -> Dict[str, Array]:
    out = {"kernel": sd.get(f"{key}.weight").T}
    if f"{key}.bias" in sd:
        out["bias"] = sd.get(f"{key}.bias")
    return out


def _ln(sd: _SD, key: str) -> Dict[str, Array]:
    return {"scale": sd.get(f"{key}.weight"), "bias": sd.get(f"{key}.bias")}


def _stem(sd: _SD, key: str) -> Dict[str, Array]:
    """torch Sequential(Linear, LayerNorm, ReLU) -> MLPStem tree."""
    return {"Dense_0": _lin(sd, f"{key}.0"),
            "LayerNorm_0": _ln(sd, f"{key}.1")}


def _custom_ln(sd: _SD, key: str) -> Dict[str, Array]:
    """reference module.LayerNorm stores gamma/beta (module.py:130-144)."""
    return {"gamma": sd.get(f"{key}.gamma"), "beta": sd.get(f"{key}.beta")}


def _encoder_layer(sd: _SD, base: str) -> Dict:
    lp = {
        "attention_prenorm": _custom_ln(sd, f"{base}.attention_prenorm"),
        "feed_forward_prenorm": _custom_ln(sd, f"{base}.feed_forward_prenorm"),
        "self_attention": {
            name: _lin(sd, f"{base}.self_attention.{name}.linear")
            for name in ("query_proj", "key_proj", "value_proj")
        },
        "feed_forward": {},
    }
    for w in ("w_1", "w_2"):
        kern = sd.get(f"{base}.feed_forward.{w}.weight")  # [out, in, 1]
        lp["feed_forward"][w] = {"kernel": kern[:, :, 0].T,
                                 "bias": sd.get(f"{base}.feed_forward.{w}.bias")}
    return lp


def _cls_head(sd: _SD, key: str) -> Tuple[Dict, Dict]:
    """fc_list Sequential(Linear, BatchNorm1d, act, Linear) -> (params,
    batch_stats)."""
    params = {"fc1": _lin(sd, f"{key}.0"),
              "bn": {"scale": sd.get(f"{key}.1.weight"),
                     "bias": sd.get(f"{key}.1.bias")},
              "fc2": _lin(sd, f"{key}.3")}
    stats = {"bn": {"mean": sd.get(f"{key}.1.running_mean"),
                    "var": sd.get(f"{key}.1.running_var")}}
    return params, stats


def _cls_head_ln(sd: _SD, key: str) -> Dict:
    """fc_list Sequential(Linear, LayerNorm, act, Linear) -> ClsHeadLN."""
    return {"fc1": _lin(sd, f"{key}.0"), "ln": _ln(sd, f"{key}.1"),
            "fc2": _lin(sd, f"{key}.3")}


def _umse(sd: _SD, cfg: Config) -> Dict:
    tree: Dict = {
        "ie_time": _stem(sd, "ie_time"),
        "ie_demo": _stem(sd, "ie_demo"),
    }
    if cfg.vslt_type == "carryforward":
        tree["vslt_enc"] = _stem(sd, "vslt_enc")
        if "ie_feat.weight" in sd:
            tree["ie_feat"] = {"embedding": sd.get("ie_feat.weight")}
    else:
        tree["ie_vslt"] = _stem(sd, "ie_vslt")
        tree["ie_feat"] = {"embedding": sd.get("ie_feat.weight")}
    if "txt_embedding.weight" in sd:
        if cfg.berttype == "bert":
            tree["txt_embedding"] = {"embedding": sd.get("txt_embedding.weight")}
        else:
            tree["txt_embedding"] = _lin(sd, "txt_embedding")
    return tree


def _fusion(sd: _SD, cfg: Config, n_modality: int,
            prefix: str = "fusion_transformer") -> Dict:
    tree: Dict = {"bottlenecks": sd.get(f"{prefix}.bottlenecks")}
    for m in range(n_modality):
        tree[f"cls_token_{m}"] = sd.get(f"{prefix}.cls_token_per_modality.{m}")
        tree[f"layer_norm_in_{m}"] = _ln(sd, f"{prefix}.layer_norms_in.{m}")
    last_mods = 1 if cfg.mbt_only_vslt else n_modality
    for layer in range(cfg.transformer_num_layers):
        mods = (last_mods if layer == cfg.transformer_num_layers - 1
                else n_modality)
        for m in range(mods):
            tree[f"layers_{layer}_{m}"] = _encoder_layer(
                sd, f"{prefix}.layer_stacks.{layer}.{m}")
    return tree


def _img_encoder(sd: _SD, cfg: Config) -> Dict:
    """img_enc subtree: swin/vit trunk + the 768->d projection."""
    out: Dict = {}
    if cfg.img_model_type == "swin":
        out["img_encoder"] = convert_swin_t(sd.sub("img_encoder."),
                                            in_channels=1)
        out["linear"] = _lin(sd, "linear")
    elif cfg.img_model_type == "vit":
        out["img_encoder"] = convert_vit_b_16(sd.sub("img_encoder."),
                                              in_channels=1)
        out["linear"] = _lin(sd, "linear")
    else:
        out["patch_embedding"] = {
            "proj": {"kernel": sd.get(
                "patch_embedding.patch_embeddings.weight").transpose(2, 3, 1, 0),
                "bias": sd.get("patch_embedding.patch_embeddings.bias")},
        }
    return out


def convert_reference_state_dict(cfg: Config, sd_raw: Dict[str, Array]
                                 ) -> Tuple[Dict, Dict]:
    """reference state_dict -> (params, batch_stats) partial trees matching
    this framework's model for ``cfg.model``. Raises on unmapped keys."""
    sd = _SD(sd_raw)
    model = cfg.model
    params: Dict = {}
    stats: Dict = {}

    if model == "unimodal_transformer":
        params["umse"] = _umse(sd, cfg)
        enc = {"cls_tokens": sd.get("transformer_encoder.cls_tokens"),
               "layer_norm_in": _ln(sd, "transformer_encoder.layer_norm_in")}
        for i in range(cfg.transformer_num_layers):
            enc[f"layers_{i}"] = _encoder_layer(
                sd, f"transformer_encoder.layer_stack.{i}")
        if "transformer_encoder.linear_in.weight" in sd:
            enc["linear_in"] = _lin(sd, "transformer_encoder.linear_in")
        params["transformer_encoder"] = enc
        params["final_ln"] = _ln(sd, "layer_norm_final")
        params["fc_list"], stats["fc_list"] = _cls_head(sd, "fc_list")
    elif model in ("tri_mbt_vsltcls", "bi_vslttxt_mbt_v1",
                   "bi_vsltimg_mbt_v1", "tri_mbt_v1"):
        n_mod = len(cfg.input_types.split("_"))
        backbone: Dict = {"umse": _umse(sd, cfg)}
        if "img" in cfg.input_types:
            backbone["img_enc"] = _img_encoder(sd, cfg)
        backbone["fusion_transformer"] = _fusion(sd, cfg, n_mod)
        params["backbone"] = backbone
        if model == "tri_mbt_v1":
            # shared LN-head over the stacked cls tokens
            # (tri_mbt_v1.py:153-157, 269-280)
            params["after_concat_ln"] = _ln(sd, "layer_norms_after_concat")
            params["fc_list"] = _cls_head_ln(sd, "fc_list")
        else:
            params["after_concat_ln"] = _ln(sd, "layer_norms_after_concat")
            params["fc_list"], stats["fc_list"] = _cls_head(sd, "fc_list")
        # the reference constructs rmse_layer unconditionally
        # (tri_mbt_vsltcls.py:152) but only applies it when the aux loss is
        # configured (:251-253) — convert it only when our model has it
        if "rmse_layer.weight" in sd:
            if "rmse" in cfg.auxiliary_loss_type:
                params["rmse_layer"] = _lin(sd, "rmse_layer")
            else:
                sd.get("rmse_layer.weight")
                sd.get("rmse_layer.bias")
    else:
        raise NotImplementedError(
            f"no reference-checkpoint conversion for model '{model}'")

    left = sd.leftovers()
    if left:
        raise ValueError(f"unconverted reference keys: {sorted(left)[:8]}"
                         f" (+{max(0, len(left) - 8)} more)")
    return params, stats


def _merge(template, update, path=""):
    """Recursively replace template leaves with update's, checking shape."""
    if not isinstance(update, dict):
        t = np.asarray(template)
        u = np.asarray(update)
        if t.shape != u.shape:
            raise ValueError(f"shape mismatch at {path}: model {t.shape} "
                             f"vs checkpoint {u.shape}")
        return u.astype(t.dtype) if hasattr(template, "dtype") else u
    out = dict(template)
    for k, v in update.items():
        if k not in out:
            raise ValueError(f"checkpoint subtree {path}/{k} not in model")
        out[k] = _merge(out[k], v, f"{path}/{k}")
    return out


def load_reference_checkpoint(cfg: Config, variables: Dict, path: str) -> Dict:
    """Load a reference .pth (torch zip format) and merge its weights into
    ``variables`` (an init()-produced dict with 'params'/'batch_stats')."""
    import torch

    # weights_only=False: reference checkpoints (logger.py save_ckpt) pickle
    # numpy scalars alongside the state dict, which torch>=2.6's safe loader
    # rejects; .pth conversion is an operator-initiated trusted import.
    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload["model"] if isinstance(payload, dict) and "model" in payload \
        else payload
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return merge_reference_state_dict(cfg, variables, sd)


def merge_reference_state_dict(cfg: Config, variables: Dict,
                               sd: Dict[str, Array]) -> Dict:
    params_up, stats_up = convert_reference_state_dict(cfg, sd)
    import flax.core
    var = flax.core.unfreeze(variables) if not isinstance(variables, dict) \
        else dict(variables)
    out = dict(var)
    out["params"] = _merge(var["params"], params_up, "params")
    if stats_up:
        out["batch_stats"] = _merge(var.get("batch_stats", {}), stats_up,
                                    "batch_stats")
    return out

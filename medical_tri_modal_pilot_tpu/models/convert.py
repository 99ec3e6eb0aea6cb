"""torchvision -> flax weight converters for the frozen image encoders.

The reference freezes a pretrained torchvision Swin-T (or ViT-B/16) as its
CXR encoder (tri_mbt_vsltcls.py:95-100, :208-209), so exact pretrained
weights drive output parity (SURVEY.md §7 hard part 2). These converters
map a torchvision ``state_dict`` (as saved by ``torch.save(model.
state_dict(), ...)`` — loadable here with the baked-in CPU torch, no
torchvision needed) onto the flax parameter trees of
``models/swin.py::SwinTransformer`` and ``models/vit.py::VisionTransformer``.

Layout rules applied:
  * torch Linear weight [out, in]    -> flax kernel [in, out]
  * torch Conv2d weight [O, I, kh, kw] -> flax [kh, kw, I, O]
  * 3-channel stems collapse to 1 channel by summing the RGB axis
    (exact for grayscale inputs replicated across channels)
  * torchvision PatchMerging concatenates [even/even, odd/even, even/odd,
    odd/odd] patches; our reshape produces [ee, eo, oe, oo] — the 4C input
    axis of reduction/norm is permuted to compensate.

Use ``tools/convert_torchvision.py`` to run the conversion offline and
save a checkpoint the normal restore path can consume.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def _linear(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _ln(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}


def _conv(sd: Dict, key: str, collapse_in: bool = False) -> Dict[str, np.ndarray]:
    w = _t(sd[f"{key}.weight"])                  # [O, I, kh, kw]
    if collapse_in and w.shape[1] == 3:
        w = w.sum(axis=1, keepdims=True)
    out = {"kernel": w.transpose(2, 3, 1, 0)}    # [kh, kw, I, O]
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


# torchvision swin_t: blocks at features[1,3,5,7], merges at features[2,4,6]
_SWIN_STAGE_FEATURE = (1, 3, 5, 7)
_SWIN_MERGE_FEATURE = (2, 4, 6)

# our PatchMerging group order vs torchvision's (see module docstring)
_MERGE_PERM = (0, 2, 1, 3)


def _merge_permute(vec: np.ndarray, C: int) -> np.ndarray:
    """Permute the leading 4C axis from torchvision group order to ours."""
    groups = vec.reshape(4, C, *vec.shape[1:])
    return groups[list(_MERGE_PERM)].reshape(vec.shape)


def convert_swin_t(sd: Dict, in_channels: int = 1,
                   depths=(2, 2, 6, 2)) -> Dict:
    """torchvision swin_t state_dict -> flax params for SwinTransformer."""
    p: Dict = {}
    p["patch_embed"] = _conv(sd, "features.0.0",
                             collapse_in=(in_channels == 1))
    p["patch_norm"] = _ln(sd, "features.0.2")
    dim = _t(sd["features.0.0.weight"]).shape[0]
    for si, depth in enumerate(depths):
        f = _SWIN_STAGE_FEATURE[si]
        for bi in range(depth):
            base = f"features.{f}.{bi}"
            block = {
                "norm1": _ln(sd, f"{base}.norm1"),
                "norm2": _ln(sd, f"{base}.norm2"),
                "attn": {
                    "qkv": _linear(sd, f"{base}.attn.qkv"),
                    "proj": _linear(sd, f"{base}.attn.proj"),
                    "relative_position_bias_table":
                        _t(sd[f"{base}.attn.relative_position_bias_table"]),
                },
                "mlp_fc1": _linear(sd, f"{base}.mlp.0"),
                "mlp_fc2": _linear(sd, f"{base}.mlp.3"),
            }
            p[f"stage{si}_block{bi}"] = block
        if si < len(depths) - 1:
            mf = _SWIN_MERGE_FEATURE[si]
            C = dim
            norm = _ln(sd, f"features.{mf}.norm")
            red = _linear(sd, f"features.{mf}.reduction")
            p[f"merge{si}"] = {
                "norm": {"scale": _merge_permute(norm["scale"], C),
                         "bias": _merge_permute(norm["bias"], C)},
                "reduction": {"kernel": _merge_permute(red["kernel"], C)},
            }
            dim *= 2
    p["norm"] = _ln(sd, "norm")
    return p


def convert_vit_b_16(sd: Dict, in_channels: int = 1,
                     num_layers: int = 12, num_heads: int = 12) -> Dict:
    """torchvision vit_b_16 state_dict -> flax params for
    VisionTransformer. The flax MultiHeadDotProductAttention stores
    per-head projections [D, H, Dh]; torch packs qkv in in_proj
    [3D, D]."""
    p: Dict = {}
    p["conv_proj"] = _conv(sd, "conv_proj", collapse_in=(in_channels == 1))
    p["class_token"] = _t(sd["class_token"])
    p["pos_embedding"] = _t(sd["encoder.pos_embedding"])
    D = p["class_token"].shape[-1]
    dh = D // num_heads
    for i in range(num_layers):
        base = f"encoder.layers.encoder_layer_{i}"
        in_w = _t(sd[f"{base}.self_attention.in_proj_weight"])   # [3D, D]
        in_b = _t(sd[f"{base}.self_attention.in_proj_bias"])     # [3D]
        qw, kw, vw = np.split(in_w, 3, axis=0)                   # [D, D] each
        qb, kb, vb = np.split(in_b, 3, axis=0)
        out_w = _t(sd[f"{base}.self_attention.out_proj.weight"])  # [D, D]
        out_b = _t(sd[f"{base}.self_attention.out_proj.bias"])

        def head(w, b):
            # torch w [D_out=D, D_in=D]; flax kernel [D_in, H, Dh]
            return {"kernel": w.T.reshape(D, num_heads, dh),
                    "bias": b.reshape(num_heads, dh)}

        p[f"encoder_layer_{i}"] = {
            "ln_1": _ln(sd, f"{base}.ln_1"),
            "ln_2": _ln(sd, f"{base}.ln_2"),
            "self_attention": {
                "query": head(qw, qb),
                "key": head(kw, kb),
                "value": head(vw, vb),
                "out": {"kernel": out_w.T.reshape(num_heads, dh, D),
                        "bias": out_b},
            },
            # torchvision >=0.13 MLPBlock is a Sequential (mlp.0 / mlp.3);
            # the legacy checkpoints used linear_1 / linear_2
            "mlp_fc1": _linear(sd, f"{base}.mlp.0"
                               if f"{base}.mlp.0.weight" in sd
                               else f"{base}.mlp.linear_1"),
            "mlp_fc2": _linear(sd, f"{base}.mlp.3"
                               if f"{base}.mlp.3.weight" in sd
                               else f"{base}.mlp.linear_2"),
        }
    p["ln"] = _ln(sd, "encoder.ln")
    return p

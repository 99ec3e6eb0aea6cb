"""Weight-converter parity: a faithful torch reimplementation of
torchvision's swin_t / vit_b_16 forward semantics (torchvision itself is
not installed) produces the same features as our flax encoders loaded via
models/convert.py from a torchvision-shaped state_dict.

This validates both the key/layout mapping and the flax implementations
(window shift/mask/merge order, exact-erf GELU, relative position bias).
"""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from medical_tri_modal_pilot_tpu.models.convert import (convert_swin_t,
                                                        convert_vit_b_16)
from medical_tri_modal_pilot_tpu.models.swin import SwinTransformer
from medical_tri_modal_pilot_tpu.models.vit import VisionTransformer

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch reference: torchvision swin_t semantics (small geometry for speed)
# ---------------------------------------------------------------------------

DEPTHS = (1, 1, 2)
HEADS = (2, 4, 8)
EMBED = 16
WIN = 4
PATCH = 4
IMG = 64   # -> 16x16 after patch embed; stages 16, 8, 4 (window 4)


def _swin_state_dict():
    """Random state dict with torchvision swin_t key names/shapes."""
    sd = {}
    g = lambda *s: torch.randn(*s) * 0.1
    sd["features.0.0.weight"] = g(EMBED, 3, PATCH, PATCH)
    sd["features.0.0.bias"] = g(EMBED)
    sd["features.0.2.weight"] = 1 + 0.1 * g(EMBED)
    sd["features.0.2.bias"] = g(EMBED)
    dim = EMBED
    feature_idx = (1, 3, 5)
    merge_idx = (2, 4)
    for si, depth in enumerate(DEPTHS):
        f = feature_idx[si]
        for bi in range(depth):
            b = f"features.{f}.{bi}"
            sd[f"{b}.norm1.weight"] = 1 + 0.1 * g(dim)
            sd[f"{b}.norm1.bias"] = g(dim)
            sd[f"{b}.attn.qkv.weight"] = g(3 * dim, dim)
            sd[f"{b}.attn.qkv.bias"] = g(3 * dim)
            sd[f"{b}.attn.proj.weight"] = g(dim, dim)
            sd[f"{b}.attn.proj.bias"] = g(dim)
            sd[f"{b}.attn.relative_position_bias_table"] = g(
                (2 * WIN - 1) ** 2, HEADS[si])
            sd[f"{b}.norm2.weight"] = 1 + 0.1 * g(dim)
            sd[f"{b}.norm2.bias"] = g(dim)
            sd[f"{b}.mlp.0.weight"] = g(4 * dim, dim)
            sd[f"{b}.mlp.0.bias"] = g(4 * dim)
            sd[f"{b}.mlp.3.weight"] = g(dim, 4 * dim)
            sd[f"{b}.mlp.3.bias"] = g(dim)
        if si < len(DEPTHS) - 1:
            m = f"features.{merge_idx[si]}"
            sd[f"{m}.norm.weight"] = 1 + 0.1 * g(4 * dim)
            sd[f"{m}.norm.bias"] = g(4 * dim)
            sd[f"{m}.reduction.weight"] = g(2 * dim, 4 * dim)
            dim *= 2
    sd["norm.weight"] = 1 + 0.1 * g(dim)
    sd["norm.bias"] = g(dim)
    return sd


def _rel_index(win):
    coords = torch.stack(torch.meshgrid(torch.arange(win), torch.arange(win),
                                        indexing="ij"))
    flat = coords.flatten(1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += win - 1
    rel[:, :, 1] += win - 1
    rel[:, :, 0] *= 2 * win - 1
    return rel.sum(-1)


def _shifted_window_attention(x, qkv_w, qkv_b, proj_w, proj_b, bias_table,
                              nh, shift):
    """torchvision.models.swin_transformer.shifted_window_attention."""
    B, H, W, C = x.shape
    win = WIN
    if shift > 0:
        x = torch.roll(x, (-shift, -shift), dims=(1, 2))
    nHW = (H // win) * (W // win)
    xw = x.view(B, H // win, win, W // win, win, C)
    xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(B * nHW, win * win, C)
    N = win * win
    qkv = F.linear(xw, qkv_w, qkv_b)
    qkv = qkv.reshape(xw.size(0), N, 3, nh, C // nh).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * (C // nh) ** -0.5) @ k.transpose(-2, -1)
    idx = _rel_index(win)
    bias = bias_table[idx.view(-1)].view(N, N, nh).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if shift > 0:
        img_mask = torch.zeros(H, W)
        cnt = 0
        for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            for ws in (slice(0, -win), slice(-win, -shift),
                       slice(-shift, None)):
                img_mask[hs, ws] = cnt
                cnt += 1
        mw = img_mask.view(H // win, win, W // win, win)
        mw = mw.permute(0, 2, 1, 3).reshape(nHW, N)
        amask = mw.unsqueeze(1) - mw.unsqueeze(2)
        amask = amask.masked_fill(amask != 0, -100.0)
        attn = attn.view(B, nHW, nh, N, N) + amask.unsqueeze(1)
        attn = attn.view(-1, nh, N, N)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(xw.size(0), N, C)
    out = F.linear(out, proj_w, proj_b)
    out = out.view(B, H // win, W // win, win, win, C)
    out = out.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    if shift > 0:
        out = torch.roll(out, (shift, shift), dims=(1, 2))
    return out


def _swin_forward(sd, x):
    """torchvision swin_t forward to the pre-pool map (NCHW in)."""
    x = F.conv2d(x, sd["features.0.0.weight"], sd["features.0.0.bias"],
                 stride=PATCH)
    x = x.permute(0, 2, 3, 1)                          # NHWC
    x = F.layer_norm(x, (EMBED,), sd["features.0.2.weight"],
                     sd["features.0.2.bias"])
    dim = EMBED
    feature_idx = (1, 3, 5)
    merge_idx = (2, 4)
    for si, depth in enumerate(DEPTHS):
        f = feature_idx[si]
        for bi in range(depth):
            b = f"features.{f}.{bi}"
            shift = 0 if bi % 2 == 0 else WIN // 2
            if WIN >= min(x.shape[1], x.shape[2]):
                shift = 0      # torchvision clamp
            h = F.layer_norm(x, (dim,), sd[f"{b}.norm1.weight"],
                             sd[f"{b}.norm1.bias"])
            h = _shifted_window_attention(
                h, sd[f"{b}.attn.qkv.weight"], sd[f"{b}.attn.qkv.bias"],
                sd[f"{b}.attn.proj.weight"], sd[f"{b}.attn.proj.bias"],
                sd[f"{b}.attn.relative_position_bias_table"],
                HEADS[si], shift)
            x = x + h
            h = F.layer_norm(x, (dim,), sd[f"{b}.norm2.weight"],
                             sd[f"{b}.norm2.bias"])
            h = F.linear(h, sd[f"{b}.mlp.0.weight"], sd[f"{b}.mlp.0.bias"])
            h = F.gelu(h)
            h = F.linear(h, sd[f"{b}.mlp.3.weight"], sd[f"{b}.mlp.3.bias"])
            x = x + h
        if si < len(DEPTHS) - 1:
            m = f"features.{merge_idx[si]}"
            x0 = x[:, 0::2, 0::2, :]
            x1 = x[:, 1::2, 0::2, :]
            x2 = x[:, 0::2, 1::2, :]
            x3 = x[:, 1::2, 1::2, :]
            x = torch.cat([x0, x1, x2, x3], dim=-1)
            x = F.layer_norm(x, (4 * dim,), sd[f"{m}.norm.weight"],
                             sd[f"{m}.norm.bias"])
            x = F.linear(x, sd[f"{m}.reduction.weight"])
            dim *= 2
    return F.layer_norm(x, (dim,), sd["norm.weight"], sd["norm.bias"])


def test_swin_converter_parity():
    sd = _swin_state_dict()
    img = torch.randn(2, 1, IMG, IMG)
    with torch.no_grad():
        ref = _swin_forward(sd, img.repeat(1, 3, 1, 1))
    params = convert_swin_t({k: v.numpy() for k, v in sd.items()},
                            in_channels=1, depths=DEPTHS)
    model = SwinTransformer(in_channels=1, embed_dim=EMBED, depths=DEPTHS,
                            num_heads=HEADS, window=WIN, patch_size=PATCH)
    ours = model.apply({"params": params}, jnp.asarray(img.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# vit_b_16 (small geometry)
# ---------------------------------------------------------------------------

VD, VH, VL, VMLP = 24, 4, 2, 48


def _vit_state_dict():
    sd = {}
    g = lambda *s: torch.randn(*s) * 0.1
    sd["conv_proj.weight"] = g(VD, 3, PATCH, PATCH)
    sd["conv_proj.bias"] = g(VD)
    sd["class_token"] = g(1, 1, VD)
    n_tok = (IMG // PATCH) ** 2 + 1
    sd["encoder.pos_embedding"] = g(1, n_tok, VD)
    for i in range(VL):
        b = f"encoder.layers.encoder_layer_{i}"
        sd[f"{b}.ln_1.weight"] = 1 + 0.1 * g(VD)
        sd[f"{b}.ln_1.bias"] = g(VD)
        sd[f"{b}.self_attention.in_proj_weight"] = g(3 * VD, VD)
        sd[f"{b}.self_attention.in_proj_bias"] = g(3 * VD)
        sd[f"{b}.self_attention.out_proj.weight"] = g(VD, VD)
        sd[f"{b}.self_attention.out_proj.bias"] = g(VD)
        sd[f"{b}.ln_2.weight"] = 1 + 0.1 * g(VD)
        sd[f"{b}.ln_2.bias"] = g(VD)
        sd[f"{b}.mlp.0.weight"] = g(VMLP, VD)
        sd[f"{b}.mlp.0.bias"] = g(VMLP)
        sd[f"{b}.mlp.3.weight"] = g(VD, VMLP)
        sd[f"{b}.mlp.3.bias"] = g(VD)
    sd["encoder.ln.weight"] = 1 + 0.1 * g(VD)
    sd["encoder.ln.bias"] = g(VD)
    return sd


def _vit_forward(sd, x):
    x = F.conv2d(x, sd["conv_proj.weight"], sd["conv_proj.bias"],
                 stride=PATCH)
    B, C, H, W = x.shape
    x = x.reshape(B, C, H * W).permute(0, 2, 1)
    cls = sd["class_token"].expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + sd["encoder.pos_embedding"]
    for i in range(VL):
        b = f"encoder.layers.encoder_layer_{i}"
        h = F.layer_norm(x, (VD,), sd[f"{b}.ln_1.weight"],
                         sd[f"{b}.ln_1.bias"])
        h, _ = F.multi_head_attention_forward(
            h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
            VD, VH,
            sd[f"{b}.self_attention.in_proj_weight"],
            sd[f"{b}.self_attention.in_proj_bias"],
            None, None, False, 0.0,
            sd[f"{b}.self_attention.out_proj.weight"],
            sd[f"{b}.self_attention.out_proj.bias"],
            need_weights=False)
        x = x + h.transpose(0, 1)
        h = F.layer_norm(x, (VD,), sd[f"{b}.ln_2.weight"],
                         sd[f"{b}.ln_2.bias"])
        h = F.linear(h, sd[f"{b}.mlp.0.weight"], sd[f"{b}.mlp.0.bias"])
        h = F.gelu(h)
        h = F.linear(h, sd[f"{b}.mlp.3.weight"], sd[f"{b}.mlp.3.bias"])
        x = x + h
    return F.layer_norm(x, (VD,), sd["encoder.ln.weight"],
                        sd["encoder.ln.bias"])


def test_vit_converter_parity():
    sd = _vit_state_dict()
    img = torch.randn(2, 1, IMG, IMG)
    with torch.no_grad():
        ref = _vit_forward(sd, img.repeat(1, 3, 1, 1))
    params = convert_vit_b_16({k: v.numpy() for k, v in sd.items()},
                              in_channels=1, num_layers=VL, num_heads=VH)
    model = VisionTransformer(in_channels=1, image_size=IMG,
                              patch_size=PATCH, num_layers=VL,
                              num_heads=VH, hidden_dim=VD, mlp_dim=VMLP)
    ours = model.apply({"params": params}, jnp.asarray(img.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_convert_tool_and_graft(tmp_path):
    """tools/convert_torchvision.py output loads through
    --img-pretrain-path into a model's img_encoder subtree."""
    import pickle
    import torch as _t

    sd = _swin_state_dict()
    pth = str(tmp_path / "swin_sd.pth")
    _t.save(sd, pth)
    out = str(tmp_path / "swin_flax.pkl")
    from tools.convert_torchvision import main as convert_main
    convert_main(["--arch", "swin_t", "--state-dict", pth, "--out", out,
                  "--in-channels", "1", "--depths"]
                 + [str(d) for d in DEPTHS])
    with open(out, "rb") as f:
        payload = pickle.load(f)
    assert payload["arch"] == "swin_t"

    # graft into a params tree holding an img_encoder of the same geometry
    from medical_tri_modal_pilot_tpu.train.trainer import (
        graft_pretrained_encoder)
    model = SwinTransformer(in_channels=1, embed_dim=EMBED, depths=DEPTHS,
                            num_heads=HEADS, window=WIN, patch_size=PATCH)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, IMG, IMG)))
    params = {"backbone": {"img_enc": {"img_encoder": init["params"]}}}
    grafted = graft_pretrained_encoder(params, out)
    got = grafted["backbone"]["img_enc"]["img_encoder"]
    np.testing.assert_allclose(
        np.asarray(got["patch_norm"]["scale"]),
        sd["features.0.2.weight"].numpy(), atol=1e-6)

    # shape mismatch is rejected
    bad = SwinTransformer(in_channels=1, embed_dim=EMBED * 2, depths=DEPTHS,
                          num_heads=HEADS, window=WIN, patch_size=PATCH)
    bad_init = bad.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, IMG, IMG)))
    with pytest.raises(ValueError):
        graft_pretrained_encoder(
            {"img_enc": {"img_encoder": bad_init["params"]}}, out)

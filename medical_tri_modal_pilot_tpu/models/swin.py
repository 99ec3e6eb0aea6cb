"""Swin-T image encoder (flax, NHWC, channels-last TPU layout).

Functional equivalent of the reference's modified torchvision copy
(src/swin_transformer.py): swin_t geometry (patch 4, window 7, depths
[2,2,6,2], heads [3,6,12,24], embed 96), with the forward truncated to
return the pre-pool feature map [B, 7, 7, 768]
(swin_transformer.py:611-618 — head/avgpool removed).

Differences from torchvision (deliberate): 1-channel stem by default — the
pipeline emits grayscale CXRs ([B,1,H,W], dataset_new.py comment at
tri_mbt_vsltcls.py:171) while torchvision's stem is 3-channel and the
reference papers over it with an internal checkpoint we don't have
(tri_mbt_vsltcls.py:95-100). Window-shift attention masks are computed
statically with numpy at trace time.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules import LayerNorm



def _rel_position_index(window: int) -> np.ndarray:
    """[(W*W), (W*W)] index into the (2W-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))            # [2, W, W]
    flat = coords.reshape(2, -1)                              # [2, W*W]
    rel = flat[:, :, None] - flat[:, None, :]                 # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                                        # [N, N]


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """bool [nW, N, N]; True = masked. Standard shifted-window mask."""
    img_mask = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    mw = img_mask.reshape(h // window, window, w // window, window)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window * window)
    return mw[:, :, None] != mw[:, None, :]


class _LinearParams(nn.Module):
    """Declares nn.Dense-shaped params (kernel/bias, same names and
    initializers) and returns them raw, so the window-attention impl can
    fuse the matmuls; the param tree stays converter-compatible."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LNParams(nn.Module):
    """nn.LayerNorm-shaped params (scale/bias), returned raw."""
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


# window-attention / mlp impl dispatch (ops.configure swaps in the Pallas
# fused kernels on TPU; see kernels/swin_attention.py, kernels/swin_mlp.py)
from ..kernels.swin_attention import xla_window_attention as _xla_wa
from ..kernels.swin_mlp import xla_swin_mlp as _xla_mlp

_WINDOW_ATTN_IMPL = _xla_wa
_SWIN_MLP_IMPL = _xla_mlp


def set_window_attention_impl(fn) -> None:
    global _WINDOW_ATTN_IMPL
    _WINDOW_ATTN_IMPL = fn


def get_window_attention_impl():
    return _WINDOW_ATTN_IMPL


def set_swin_mlp_impl(fn) -> None:
    global _SWIN_MLP_IMPL
    _SWIN_MLP_IMPL = fn


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        B, H, Wd, C = x.shape
        win, shift = self.window, self.shift
        # torchvision clamps the shift to 0 when the window covers the
        # whole map (swin_t last stage: 7x7 with window 7) — required for
        # pretrained-weight parity
        if win >= min(H, Wd):
            shift = 0
        nh = self.num_heads
        N = win * win

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))

        nH, nW = H // win, Wd // win
        xw = x.reshape(B, nH, win, nW, win, C).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(B * nH * nW, N, C)

        wqkv, bqkv = _LinearParams(3 * self.dim, name="qkv")(C)
        wproj, bproj = _LinearParams(self.dim, name="proj")(C)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * win - 1) ** 2, nh))
        rel_idx = _rel_position_index(win)
        bias = bias_table[rel_idx.reshape(-1)].reshape(N, N, nh)
        bias = bias.transpose(2, 0, 1)                        # [nh, N, N]
        smask = (jnp.asarray(_shift_attn_mask(H, Wd, win, shift))
                 if shift > 0 else None)

        out = _WINDOW_ATTN_IMPL(xw.astype(self.dtype), wqkv, bqkv, wproj,
                                bproj, bias, smask, nh)

        out = out.reshape(B, nH, nW, win, win, C).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, H, Wd, C)
        if shift > 0:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        return out


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    # torchvision trains swin_t with row-mode stochastic depth scaled per
    # block (swin_transformer.py:577,421); active only when the trunk
    # trains (the reference keeps the encoder in eval() when frozen)
    sd_prob: float = 0.0

    def _stochastic_depth(self, h):
        keep = 1.0 - self.sd_prob
        shape = (h.shape[0],) + (1,) * (h.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return h * mask.astype(h.dtype) / keep

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        sd_on = (not deterministic) and self.sd_prob > 0.0
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = WindowAttention(self.dim, self.num_heads, self.window, self.shift,
                            self.dtype, name="attn")(h)
        if sd_on:
            h = self._stochastic_depth(h)
        x = x + h
        # LN -> fc1 -> exact gelu (torch parity) -> fc2 -> residual, fused
        # in one VMEM pass on TPU (kernels/swin_mlp.py)
        s, b = _LNParams(self.dim, name="norm2")()
        w1, b1 = _LinearParams(int(self.dim * self.mlp_ratio),
                               name="mlp_fc1")(self.dim)
        w2, b2 = _LinearParams(self.dim, name="mlp_fc2")(
            int(self.dim * self.mlp_ratio))
        B, H, W, C = x.shape
        if sd_on:
            from ..kernels.swin_mlp import mlp_branch
            o = mlp_branch(x.reshape(-1, C).astype(self.dtype),
                           s, b, w1, b1, w2, b2).reshape(B, H, W, C)
            return x + self._stochastic_depth(o)
        y = _SWIN_MLP_IMPL(x.reshape(-1, C).astype(self.dtype),
                           s, b, w1, b1, w2, b2)
        return y.reshape(B, H, W, C)


class PatchMerging(nn.Module):
    dim: int  # input channel dim
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C] -> [B, H/2, W/2, 2C]
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, H // 2, W // 2, 4 * C)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """swin_t geometry; returns the pre-pool [B, H/32, W/32, 768] map."""
    in_channels: int = 1
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    dtype: jnp.dtype = jnp.float32
    # torchvision swin_t trains with stochastic_depth_prob=0.2 scaled
    # linearly over blocks (src/swin_transformer.py:577,835-841); only the
    # unfrozen-trunk training path activates it (deterministic=False)
    stochastic_depth_prob: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # accepts [B, C, H, W] (pipeline layout) or [B, H, W, C]
        if x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
            x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        x = LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        dim = self.embed_dim
        total_blocks = sum(self.depths)
        block_id = 0
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else self.window // 2
                sd = (self.stochastic_depth_prob * block_id
                      / max(total_blocks - 1, 1))
                x = SwinBlock(dim, self.num_heads[si], self.window, shift,
                              dtype=self.dtype, sd_prob=sd,
                              name=f"stage{si}_block{bi}")(
                                  x, deterministic)
                block_id += 1
            if si < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{si}")(x)
                dim *= 2
        return LayerNorm(dtype=self.dtype, name="norm")(x)


class PatchEmbed(nn.Module):
    """monai PatchEmbeddingBlock analog (tri_mbt_vsltcls.py:107-116):
    conv patch embedding + learnable positions -> [B, N, hidden]."""
    img_size: int = 224
    patch_size: int = 16
    hidden: int = 256
    in_channels: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
            x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(self.hidden, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="proj")(x.astype(self.dtype))
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, (self.img_size // self.patch_size) ** 2, self.hidden))
        return x + pos.astype(self.dtype)

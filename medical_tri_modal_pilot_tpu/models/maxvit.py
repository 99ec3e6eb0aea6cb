"""Compact MaxViT backbone — the ``--img-model-type maxvit`` option
(reference control/config.py:107 lists maxvit among the torchvision image
encoders; the live models fall back to a patch stem, so this backbone
serves the uni-image classifier family).

MaxViT block = MBConv (local conv mixing) + block attention (windowed)
+ grid attention (dilated global). Both attention forms reduce to plain
reshapes + batched MHA — ideal for the MXU: every window lands as a
[B*nW, 49, C] batched matmul with static shapes.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .modules import LayerNorm


def _window(x, size: int, grid: bool):
    """[B, H, W, C] -> [B*n, size*size, C]; grid=True partitions by stride
    (dilated grid attention), else contiguous windows (block attention)."""
    B, H, W, C = x.shape
    if grid:
        x = x.reshape(B, size, H // size, size, W // size, C)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
    else:
        x = x.reshape(B, H // size, size, W // size, size, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, size * size, C)


def _unwindow(x, size: int, grid: bool, H: int, W: int):
    C = x.shape[-1]
    if grid:
        x = x.reshape(-1, H // size, W // size, size, size, C)
        x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))
    else:
        x = x.reshape(-1, H // size, W // size, size, size, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, H, W, C)


class MBConv(nn.Module):
    features: int
    stride: int = 1
    expand: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        mid = self.features * self.expand
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="pre_bn")(x)
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="expand_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.gelu(y)
        y = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="dw_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        y = nn.gelu(y)
        # squeeze-excite
        s = jnp.mean(y, axis=(1, 2))
        s = nn.gelu(nn.Dense(mid // 16, dtype=self.dtype, name="se1")(s))
        s = nn.sigmoid(nn.Dense(mid, dtype=self.dtype, name="se2")(s))
        y = y * s[:, None, None, :]
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype, name="shortcut")(
                                   nn.avg_pool(x, (2, 2), strides=(1, 1),
                                               padding="SAME")
                                   if self.stride == 1 else x)
        return y + residual


class _WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    grid: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        shortcut = x
        y = LayerNorm(dtype=self.dtype, name="ln")(x)
        y = _window(y, self.window, self.grid)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn")(
                y, y, deterministic=deterministic)
        y = _unwindow(y, self.window, self.grid, H, W)
        x = shortcut + y
        y = LayerNorm(dtype=self.dtype, name="mlp_ln")(x)
        y = nn.Dense(4 * C, dtype=self.dtype, name="mlp1")(y)
        y = nn.gelu(y)
        y = nn.Dense(C, dtype=self.dtype, name="mlp2")(y)
        return x + y


class MaxViT(nn.Module):
    """Stem + 4 stages; returns the final feature map (NHWC) or pooled
    features. Default widths give a T-scale model on 224x224 inputs
    (window 7 at every stage: 56->28->14->7)."""
    widths: Sequence[int] = (64, 128, 256, 512)
    depths: Sequence[int] = (2, 2, 2, 2)
    heads: Tuple[int, ...] = (2, 4, 8, 16)
    window: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, pool: bool = True,
                 deterministic: bool = True):
        if x.ndim == 4 and x.shape[1] in (1, 3):       # NCHW -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="stem1")(x)
        x = nn.gelu(x)
        x = nn.Conv(64, (3, 3), dtype=self.dtype, name="stem2")(x)
        for stage, (width, depth, heads) in enumerate(
                zip(self.widths, self.depths, self.heads)):
            for i in range(depth):
                stride = 2 if i == 0 else 1
                x = MBConv(width, stride, dtype=self.dtype,
                           name=f"s{stage}_mbconv{i}")(x, train)
                x = _WindowAttention(width, heads, self.window, grid=False,
                                     dtype=self.dtype,
                                     name=f"s{stage}_block{i}")(
                                         x, deterministic)
                x = _WindowAttention(width, heads, self.window, grid=True,
                                     dtype=self.dtype,
                                     name=f"s{stage}_grid{i}")(
                                         x, deterministic)
        if not pool:
            return x
        return jnp.mean(x, axis=(1, 2))

"""ViT-B/16 encoder (flax) returning the full token sequence, matching the
reference's truncated torchvision copy (src/vision_transformer.py:290-307 —
cls-selection/heads removed, full sequence returned)."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype, name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="self_attention")(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)  # torch GELU parity
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    """vit_b_16 geometry: patch 16, 12 layers, 12 heads, dim 768."""
    in_channels: int = 1
    image_size: int = 224
    patch_size: int = 16
    num_layers: int = 12
    num_heads: int = 12
    hidden_dim: int = 768
    mlp_dim: int = 3072
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
            x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(self.hidden_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="conv_proj")(x.astype(self.dtype))
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        cls = self.param("class_token", nn.initializers.zeros,
                         (1, 1, self.hidden_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.hidden_dim)).astype(x.dtype), x],
            axis=1)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, x.shape[1], self.hidden_dim))
        x = x + pos.astype(x.dtype)
        for i in range(self.num_layers):
            x = ViTBlock(self.hidden_dim, self.num_heads, self.mlp_dim,
                         dtype=self.dtype, name=f"encoder_layer_{i}")(
                             x, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(x)

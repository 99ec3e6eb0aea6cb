"""Classifier heads (reference tri_mbt_vsltcls.py:147-158 and variants)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .modules import LayerNorm


class ClsHead(nn.Module):
    """Linear -> BatchNorm -> ReLU -> Linear (fc_list). BatchNorm uses batch
    stats in training, running stats in eval (torch BatchNorm1d semantics)."""
    d_model: int
    output_dim: int = 1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.d_model, dtype=self.dtype, name="fc1")(x)
        # torch BatchNorm1d over feature dim; supports [B, D] and [G, B, D]
        # (the reference applies fc_list to stacked [3/4, B, D] tensors —
        # BatchNorm1d then normalizes over dim 1, which matches reducing all
        # leading axes here)
        reduce_axes = tuple(range(h.ndim - 1))
        h = nn.BatchNorm(use_running_average=deterministic, axis=-1,
                         axis_name=None, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn",
                         use_bias=True, use_scale=True)(h)
        if self.activation == "relu":
            h = nn.relu(h)
        else:
            h = nn.selu(h)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="fc2")(h)


class ClsHeadLN(nn.Module):
    """Linear -> LayerNorm -> act -> Linear — the fc_lists variant used by
    the multitoken models (tri_mbt_vmulti.py:122-127 uses LayerNorm, the
    BatchNorm is commented out there)."""
    d_model: int
    output_dim: int = 1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.d_model, dtype=self.dtype, name="fc1")(x)
        h = LayerNorm(dtype=self.dtype, name="ln")(h)
        h = nn.relu(h) if self.activation == "relu" else nn.selu(h)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="fc2")(h)

"""2-D ResNet backbone for CXR classification/encoding.

TPU-native equivalent of the MONAI ResNet the reference instantiates for
its uni-image family (builder/models/2_uni_image/resnet.py:9-18:
block_inplanes [32,64,128,256], conv1 7x7/2, 1 input channel, depths
18/34/50). Written NHWC (XLA's preferred TPU conv layout) with
BatchNorm + ReLU; returns either pooled features or a logit head.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
_INPLANES = (32, 64, 128, 256)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, name="down_bn")(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    features: int        # width of the 3x3; output is 4x this
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """NHWC ResNet; input accepted as NCHW [B, 1, H, W] (the pipeline's
    layout) and transposed once at the stem."""
    num_layers: int = 18
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, pool: bool = True):
        if x.ndim == 4 and x.shape[1] in (1, 3):       # NCHW -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(self.dtype)
        depths: Sequence[int] = _LAYERS[self.num_layers]
        block = BasicBlock if self.num_layers < 50 else BottleneckBlock
        x = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, (depth, width) in enumerate(zip(depths, _INPLANES)):
            for i in range(depth):
                stride = 2 if (i == 0 and stage > 0) else 1
                x = block(width, stride, dtype=self.dtype,
                          name=f"layer{stage}_{i}")(x, train)
        if not pool:
            return x                                    # [B, h, w, C]
        return jnp.mean(x, axis=(1, 2))                 # [B, C]

    @property
    def feature_dim(self) -> int:
        return _INPLANES[-1] * (1 if self.num_layers < 50 else 4)

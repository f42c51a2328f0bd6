"""UNet++ (nested U-Net) segmentation model in Flax.

Rebuild of src/preprocessing/segmentation/model.py:7-99: ConvBlock =
2x(Conv3x3 + BN + ReLU); nested dense skip nodes x_{i,j}; bilinear x2
upsampling; 1x1 final conv. Default filters [64, 128, 256, 512, 1024].
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
        return x


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")


def _pool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class NestedUNet(nn.Module):
    filters: Sequence[int] = (64, 128, 256, 512, 1024)
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = list(self.filters)
        # Backbone column x_{i,0}
        x0_0 = ConvBlock(f[0])(x, train)
        x1_0 = ConvBlock(f[1])(_pool2(x0_0), train)
        x2_0 = ConvBlock(f[2])(_pool2(x1_0), train)
        x3_0 = ConvBlock(f[3])(_pool2(x2_0), train)
        x4_0 = ConvBlock(f[4])(_pool2(x3_0), train)

        # Nested dense skip nodes (model.py:26-83)
        x0_1 = ConvBlock(f[0])(jnp.concatenate([x0_0, _up2(x1_0)], -1), train)
        x1_1 = ConvBlock(f[1])(jnp.concatenate([x1_0, _up2(x2_0)], -1), train)
        x2_1 = ConvBlock(f[2])(jnp.concatenate([x2_0, _up2(x3_0)], -1), train)
        x3_1 = ConvBlock(f[3])(jnp.concatenate([x3_0, _up2(x4_0)], -1), train)

        x0_2 = ConvBlock(f[0])(jnp.concatenate([x0_0, x0_1, _up2(x1_1)], -1), train)
        x1_2 = ConvBlock(f[1])(jnp.concatenate([x1_0, x1_1, _up2(x2_1)], -1), train)
        x2_2 = ConvBlock(f[2])(jnp.concatenate([x2_0, x2_1, _up2(x3_1)], -1), train)

        x0_3 = ConvBlock(f[0])(jnp.concatenate([x0_0, x0_1, x0_2, _up2(x1_2)], -1), train)
        x1_3 = ConvBlock(f[1])(jnp.concatenate([x1_0, x1_1, x1_2, _up2(x2_2)], -1), train)

        x0_4 = ConvBlock(f[0])(jnp.concatenate(
            [x0_0, x0_1, x0_2, x0_3, _up2(x1_3)], -1), train)

        return nn.Conv(self.out_channels, (1, 1))(x0_4)

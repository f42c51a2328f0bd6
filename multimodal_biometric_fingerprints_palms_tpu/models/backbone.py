"""Grayscale CNN backbone (EfficientNetV2-class) in Flax.

TPU-native replacement for the reference's timm backbone wrapper
(classifier/models/backbone.py:5-107: timm ``tf_efficientnetv2_s.in21k``
with 1-channel stem surgery + linear projector). Pretrained timm weights
are not portable here, so the backbone trains from scratch — embeddings only
feed clustering, so minutiae-path metrics are unaffected (SURVEY.md §7).

Architecture: the real EfficientNetV2-S stage plan (FusedMBConv stages 1-3,
MBConv+SE stages 4-6), 1-channel input stem, mean-pool features, linear
projection to ``embedding_dim`` with optional L2 norm — mirroring the
reference wrapper's pooling and projector (backbone.py:76-106).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


# (block, expand, channels, layers, stride, use_se)
EFFNETV2_S: tuple = (
    ("fused", 1, 24, 2, 1, False),
    ("fused", 4, 48, 4, 2, False),
    ("fused", 4, 64, 4, 2, False),
    ("mb", 4, 128, 6, 2, True),
    ("mb", 6, 160, 9, 1, True),
    ("mb", 6, 256, 15, 2, True),
)

# Small variant for tests / fast smoke runs.
EFFNETV2_TINY: tuple = (
    ("fused", 1, 16, 1, 1, False),
    ("fused", 2, 32, 2, 2, False),
    ("mb", 2, 48, 2, 2, True),
    ("mb", 4, 64, 2, 2, True),
)

STAGE_PLANS = {"effnetv2_s": EFFNETV2_S, "effnetv2_tiny": EFFNETV2_TINY}


class SqueezeExcite(nn.Module):
    features: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        hidden = max(1, int(self.features * self.se_ratio))
        s = nn.Conv(hidden, (1, 1))(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1))(s)
        return x * nn.sigmoid(s)


class FusedMBConv(nn.Module):
    features: int
    expand: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp = x.shape[-1]
        hidden = inp * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (3, 3), strides=self.stride, use_bias=False)(y)
            y = nn.BatchNorm(use_running_average=not train)(y)
            y = nn.silu(y)
            y = nn.Conv(self.features, (1, 1), use_bias=False)(y)
            y = nn.BatchNorm(use_running_average=not train)(y)
        else:
            y = nn.Conv(self.features, (3, 3), strides=self.stride, use_bias=False)(y)
            y = nn.BatchNorm(use_running_average=not train)(y)
            y = nn.silu(y)
        if self.stride == 1 and inp == self.features:
            y = y + x
        return y


class MBConv(nn.Module):
    features: int
    expand: int
    stride: int = 1
    use_se: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp = x.shape[-1]
        hidden = inp * self.expand
        y = nn.Conv(hidden, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.silu(y)
        y = nn.Conv(hidden, (3, 3), strides=self.stride,
                    feature_group_count=hidden, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.silu(y)
        if self.use_se:
            y = SqueezeExcite(hidden)(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if self.stride == 1 and inp == self.features:
            y = y + x
        return y


class FingerprintBackbone(nn.Module):
    """1-channel CNN encoder -> pooled features -> linear embedding."""
    embedding_dim: int = 756
    stage_plan: Any = EFFNETV2_S
    stem_features: int = 24
    head_features: int = 1280
    l2_normalize: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: (B, H, W) or (B, H, W, 1) grayscale in [0,1]
        if x.ndim == 3:
            x = x[..., None]
        y = nn.Conv(self.stem_features, (3, 3), strides=2, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.silu(y)

        for block, expand, feats, layers, stride, use_se in self.stage_plan:
            for li in range(layers):
                s = stride if li == 0 else 1
                if block == "fused":
                    y = FusedMBConv(feats, expand, s)(y, train)
                else:
                    y = MBConv(feats, expand, s, use_se)(y, train)

        y = nn.Conv(self.head_features, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.silu(y)

        # Spatial mean pool (reference CNN path, backbone.py:97-100).
        y = jnp.mean(y, axis=(1, 2))
        emb = nn.Dense(self.embedding_dim)(y)
        if self.l2_normalize:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb

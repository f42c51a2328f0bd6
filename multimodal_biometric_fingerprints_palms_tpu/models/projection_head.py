"""SimCLR/BYOL projection head in Flax.

Rebuild of classifier/models/projection_head.py:6-56: weight-normalized
linear layers + BatchNorm + ReLU + dropout 0.1, residual iff input and
output dims match, L2-normalized output.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class WeightNormDense(nn.Module):
    """Dense layer with weight normalization (w = g * v / ||v||),
    matching torch.nn.utils.parametrizations.weight_norm semantics."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        v = self.param("v", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        g = self.param("g", nn.initializers.ones, (self.features,))
        w = v * (g / jnp.maximum(jnp.linalg.norm(v, axis=0), 1e-12))
        y = x @ w
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class ProjectionHead(nn.Module):
    hidden_dim: int = 512
    output_dim: int = 256
    num_layers: int = 2
    dropout: float = 0.1
    use_residual: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        input_dim = x.shape[-1]
        if self.num_layers < 1:
            raise ValueError("num_layers must be >= 1")
        y = x
        if self.num_layers == 1:
            y = nn.Dense(self.output_dim)(y)
        else:
            y = WeightNormDense(self.hidden_dim)(y)
            y = nn.BatchNorm(use_running_average=not train)(y)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            for _ in range(self.num_layers - 2):
                y = WeightNormDense(self.hidden_dim)(y)
                y = nn.BatchNorm(use_running_average=not train)(y)
                y = nn.relu(y)
                y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.Dense(self.output_dim)(y)
        if self.use_residual and input_dim == self.output_dim:
            y = y + x
        return y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)

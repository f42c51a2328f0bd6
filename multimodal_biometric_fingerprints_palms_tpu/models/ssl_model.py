"""SSL model: backbone -> projection head -> optional BYOL/SimSiam predictor.

Rebuild of classifier/models/ssl_model.py:6-56.
"""

from __future__ import annotations

from flax import linen as nn

from .backbone import FingerprintBackbone, STAGE_PLANS, EFFNETV2_S
from .projection_head import ProjectionHead


class Predictor(nn.Module):
    """BYOL/SimSiam predictor MLP (ssl_model.py:37-44)."""
    hidden_dim: int = 512
    output_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.Dense(self.hidden_dim)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        return nn.Dense(self.output_dim)(y)


class SSLModel(nn.Module):
    backbone_name: str = "effnetv2_s"
    embedding_dim: int = 756
    proj_hidden_dim: int = 512
    proj_output_dim: int = 256
    proj_num_layers: int = 2
    use_predictor: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True, return_embedding: bool = False):
        plan = STAGE_PLANS.get(self.backbone_name, EFFNETV2_S)
        embedding = FingerprintBackbone(
            embedding_dim=self.embedding_dim, stage_plan=plan,
            name="backbone")(x, train)
        projection = ProjectionHead(
            hidden_dim=self.proj_hidden_dim,
            output_dim=self.proj_output_dim,
            num_layers=self.proj_num_layers,
            name="projection_head")(embedding, train)
        if self.use_predictor:
            projection_pred = Predictor(
                hidden_dim=self.proj_hidden_dim,
                output_dim=self.proj_output_dim,
                name="predictor")(projection, train)
        else:
            projection_pred = projection
        if return_embedding:
            return projection_pred, embedding
        return projection_pred

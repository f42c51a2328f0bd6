"""Training losses.

- NT-Xent (SimCLR) — rebuild of classifier/utils/loss.py:5-55 with the same
  positive-pair masking; one fused (2B, 2B) similarity matmul on the MXU.
- Segmentation losses — rebuild of segmentation/train.py:51-86:
  FocalTversky(alpha, beta, gamma), dice loss/coeff, IoU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def nt_xent_loss(z_i: jnp.ndarray, z_j: jnp.ndarray,
                 temperature: float = 0.5) -> jnp.ndarray:
    """Normalized temperature-scaled cross-entropy over a two-view batch.

    z_i, z_j: (B, D) projections of the two views.
    """
    b = z_i.shape[0]
    z_i = z_i / jnp.maximum(jnp.linalg.norm(z_i, axis=-1, keepdims=True), 1e-12)
    z_j = z_j / jnp.maximum(jnp.linalg.norm(z_j, axis=-1, keepdims=True), 1e-12)
    reps = jnp.concatenate([z_i, z_j], axis=0)                   # (2B, D)
    sim = (reps @ reps.T) / temperature                           # (2B, 2B)

    n = 2 * b
    idx = jnp.arange(n)
    mask = jnp.ones((n, n), bool)
    mask = mask.at[idx, idx].set(False)                           # self
    mask = mask.at[idx, (idx + b) % n].set(False)                 # positive

    positives = jnp.exp(jnp.sum(z_i * z_j, axis=-1) / temperature)
    positives = jnp.concatenate([positives, positives], axis=0)   # (2B,)
    denom = jnp.sum(jnp.exp(sim) * mask, axis=1)
    return jnp.mean(-jnp.log(positives / jnp.maximum(denom, 1e-12)))


def focal_tversky_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       alpha: float = 0.7, beta: float = 0.3,
                       gamma: float = 0.75, eps: float = 1e-6) -> jnp.ndarray:
    """Focal Tversky loss on sigmoid probabilities (train.py:51-63)."""
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1)
    tp = jnp.sum(p * t)
    fp = jnp.sum(p * (1.0 - t))
    fn = jnp.sum((1.0 - p) * t)
    tversky = (tp + eps) / (tp + alpha * fn + beta * fp + eps)
    return (1.0 - tversky) ** gamma


def dice_coeff(logits: jnp.ndarray, targets: jnp.ndarray,
               eps: float = 1e-6) -> jnp.ndarray:
    p = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32).reshape(-1)
    t = targets.reshape(-1)
    inter = jnp.sum(p * t)
    return (2.0 * inter + eps) / (jnp.sum(p) + jnp.sum(t) + eps)


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              eps: float = 1e-6) -> jnp.ndarray:
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + eps) / (jnp.sum(p) + jnp.sum(t) + eps)


def iou_score(logits: jnp.ndarray, targets: jnp.ndarray,
              eps: float = 1e-6) -> jnp.ndarray:
    p = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32).reshape(-1)
    t = targets.reshape(-1)
    inter = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t) - inter
    return (inter + eps) / (union + eps)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, targets))

"""Tests for the Flax models, losses, schedules, and clustering."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_biometric_fingerprints_palms_tpu.models import (
    SSLModel, NestedUNet, nt_xent_loss, focal_tversky_loss, dice_coeff,
    iou_score,
)
from multimodal_biometric_fingerprints_palms_tpu.clustering import (
    kmeans, pca_reduce, agglomerative_fast, evaluate_clustering,
)


def test_ssl_model_forward_tiny():
    model = SSLModel(backbone_name="effnetv2_tiny", embedding_dim=64,
                     proj_hidden_dim=64, proj_output_dim=32)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    proj, emb = model.apply(variables, x, train=False, return_embedding=True)
    assert proj.shape == (2, 32)
    assert emb.shape == (2, 64)
    # backbone embedding is L2-normalized
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1),
                               1.0, atol=1e-5)


def test_nt_xent_identical_views_low_loss():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    loss_same = float(nt_xent_loss(z, z, temperature=0.5))
    loss_diff = float(nt_xent_loss(z, z2, temperature=0.5))
    assert loss_same < loss_diff


def test_nt_xent_matches_torch_reference():
    """Compare against the reference's torch NTXentLoss (loss.py:5-55)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    zi = rng.normal(size=(6, 8)).astype(np.float32)
    zj = rng.normal(size=(6, 8)).astype(np.float32)

    # reference computation
    ti = F.normalize(torch.tensor(zi), dim=1)
    tj = F.normalize(torch.tensor(zj), dim=1)
    reps = torch.cat([ti, tj], 0)
    sim = reps @ reps.T / 0.5
    n = 12
    mask = torch.ones((n, n), dtype=torch.bool)
    mask.fill_diagonal_(0)
    for i in range(6):
        mask[i, i + 6] = 0
        mask[i + 6, i] = 0
    pos = torch.exp(torch.sum(ti * tj, -1) / 0.5)
    pos = torch.cat([pos, pos], 0)
    ref = (-torch.log(pos / (torch.exp(sim) * mask).sum(1))).mean().item()

    ours = float(nt_xent_loss(jnp.asarray(zi), jnp.asarray(zj), 0.5))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_unetpp_forward_tiny():
    model = NestedUNet(filters=(8, 16, 32, 48, 64), out_channels=1)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 64, 1)


def test_seg_losses_sane():
    logits = jnp.asarray(np.full((4, 8, 8, 1), 5.0, np.float32))
    targets = jnp.ones((4, 8, 8, 1))
    assert float(focal_tversky_loss(logits, targets)) < 0.05
    assert float(dice_coeff(logits, targets)) > 0.99
    assert float(iou_score(logits, targets)) > 0.99
    bad = jnp.asarray(np.full((4, 8, 8, 1), -5.0, np.float32))
    assert float(focal_tversky_loss(bad, targets)) > 0.5


def _blobs(rng, n_per=50, centers=((0, 0), (10, 10), (-10, 10))):
    pts, labels = [], []
    for li, c in enumerate(centers):
        pts.append(rng.normal(size=(n_per, 2)).astype(np.float32) + np.asarray(c))
        labels.extend([li] * n_per)
    return np.concatenate(pts), np.asarray(labels)


def test_kmeans_recovers_blobs(rng):
    x, true = _blobs(rng)
    labels, centers, inertia = kmeans(jax.random.PRNGKey(0), jnp.asarray(x), 3)
    labels = np.asarray(labels)
    # perfect up to permutation: each true cluster maps to one label
    for t in range(3):
        vals = labels[true == t]
        assert (vals == vals[0]).mean() > 0.95
    assert float(inertia) < x.shape[0] * 6.0


def test_pca_reduce(rng):
    x = rng.normal(size=(200, 10)).astype(np.float32)
    x[:, 0] *= 10.0  # dominant direction
    red, comp, var = pca_reduce(jnp.asarray(x), 3)
    assert red.shape == (200, 3)
    assert float(var[0]) > float(var[1]) > float(var[2])
    # first component aligned with axis 0
    assert abs(float(comp[0, 0])) > 0.95


def test_agglomerative_fast_blobs(rng):
    # Direction-separated blobs (cosine average-linkage needs angular
    # separation; a blob at the origin is degenerate under cosine).
    x, true = _blobs(rng, n_per=40,
                     centers=((20, 2), (2, 20), (-20, -20)))
    labels = np.asarray(agglomerative_fast(jax.random.PRNGKey(0),
                                           jnp.asarray(x), 3, max_centers=24))
    for t in range(3):
        vals = labels[true == t]
        assert (vals == vals[0]).mean() > 0.9


def test_evaluate_clustering_report(rng):
    x, true = _blobs(rng)
    report = evaluate_clustering(x, true, 3)
    assert report["silhouette_cosine"] > 0.3
    assert report["davies_bouldin"] < 1.0
    assert report["calinski_harabasz"] > 100
    assert sum(report["cluster_sizes"]) == x.shape[0]

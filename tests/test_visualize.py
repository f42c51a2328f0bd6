"""Smoke tests for visualization utilities."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_visualize_orientation_overlay(synthetic_fingerprint):
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing.visualize import (
        visualize_orientation,
    )
    h, w = synthetic_fingerprint.shape
    orient = np.zeros((h, w), np.float32)
    rel = np.ones((h, w), np.float32)
    out = visualize_orientation(synthetic_fingerprint, orient, rel,
                                mask=np.ones((h, w), bool))
    assert out.shape == (h, w, 3)
    assert out.dtype == np.uint8
    # some red overlay pixels present
    assert (out[..., 0].astype(int) - out[..., 1].astype(int) > 50).any()


def test_visualize_embeddings_png(tmp_path, rng):
    from multimodal_biometric_fingerprints_palms_tpu.classifier.visualize import (
        visualize_embeddings,
    )
    x = rng.normal(size=(60, 16)).astype(np.float32)
    labels = np.repeat(np.arange(3), 20)
    out = visualize_embeddings(x, labels, tmp_path / "emb.png", method="pca")
    assert out.exists() and out.stat().st_size > 1000


def test_visualize_embeddings_umap(tmp_path, rng):
    """UMAP option (reference cluster_embeddings.py:189-193); falls back to
    a kNN-graph spectral embedding when umap-learn is absent."""
    from multimodal_biometric_fingerprints_palms_tpu.classifier.visualize import (
        visualize_embeddings, _umap_2d,
    )
    # three well-separated blobs must stay separated in 2-D
    centers = np.array([[0.0] * 16, [8.0] * 16, [-8.0] * 16], np.float32)
    x = (centers.repeat(20, axis=0)
         + rng.normal(size=(60, 16)).astype(np.float32) * 0.3)
    labels = np.repeat(np.arange(3), 20)
    pts = _umap_2d(x, seed=0)
    assert pts.shape == (60, 2)
    means = np.stack([pts[labels == c].mean(0) for c in range(3)])
    spread = np.stack([pts[labels == c].std(0).mean() for c in range(3)])
    d01 = np.linalg.norm(means[0] - means[1])
    d02 = np.linalg.norm(means[0] - means[2])
    assert d01 > 2 * spread.max() and d02 > 2 * spread.max()

    out = visualize_embeddings(x, labels, tmp_path / "emb_umap.png",
                               method="umap")
    assert out.exists() and out.stat().st_size > 1000

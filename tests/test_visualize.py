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

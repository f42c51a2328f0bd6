"""Tests for histogram ops: percentile stretch, Otsu, CLAHE."""

import numpy as np
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.ops import (
    percentile_stretch, otsu_threshold, otsu_threshold_patchwise, clahe,
)


def _otsu_numpy(x_u8):
    hist = np.bincount(x_u8.ravel(), minlength=256).astype(np.float64)
    p = hist / hist.sum()
    bins = np.arange(256)
    omega = np.cumsum(p)
    mu = np.cumsum(p * bins)
    mu_t = mu[-1]
    denom = omega * (1 - omega)
    with np.errstate(invalid="ignore", divide="ignore"):
        sigma_b = np.where(denom > 1e-8, (mu_t * omega - mu) ** 2 / denom, 0)
    return np.argmax(sigma_b)


def test_percentile_stretch_range(rng):
    x = rng.random((32, 32)).astype(np.float32) * 0.5 + 0.25
    out = np.asarray(percentile_stretch(jnp.asarray(x)))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out.max() > 0.95  # stretched to fill range


def test_otsu_bimodal(rng):
    # Two well-separated modes: Otsu must split between them.
    a = rng.normal(0.2, 0.03, 600)
    b = rng.normal(0.8, 0.03, 400)
    x = np.clip(np.concatenate([a, b]), 0, 1).astype(np.float32).reshape(40, 25)
    thr = float(otsu_threshold(jnp.asarray(x)))
    # Threshold must separate the modes (argmax lands at the start of the
    # empty gap between them, just above mode a).
    assert 0.25 < thr < 0.75
    ref = _otsu_numpy(np.clip(np.round(x * 255), 0, 255).astype(np.uint8)) / 255.0
    assert abs(thr - ref) < 1e-6


def test_otsu_batched(rng):
    x = rng.random((4, 32, 32)).astype(np.float32)
    thr = np.asarray(otsu_threshold(jnp.asarray(x)))
    assert thr.shape == (4,)
    for i in range(4):
        ref = _otsu_numpy(np.clip(np.round(x[i] * 255), 0, 255).astype(np.uint8))
        np.testing.assert_allclose(thr[i] * 255, ref, atol=0.5)


def test_otsu_patchwise_shape_and_values(rng):
    x = np.zeros((64, 64), np.float32)
    x[:32] = rng.random((32, 64)) * 0.3          # dark patches
    x[32:] = 0.7 + rng.random((32, 64)) * 0.3    # bright patches
    thr = np.asarray(otsu_threshold_patchwise(jnp.asarray(x), 32))
    assert thr.shape == (64, 64)
    # patch-constant
    assert np.allclose(thr[:32, :32], thr[0, 0])
    # dark patch threshold below bright patch threshold
    assert thr[0, 0] < thr[63, 0]


def test_clahe_improves_local_contrast(rng):
    # Low-contrast image: CLAHE should expand the value range.
    x = (0.45 + 0.1 * rng.random((64, 64))).astype(np.float32)
    out = np.asarray(clahe(jnp.asarray(x), clip_limit=2.5, grid=8))
    assert out.shape == x.shape
    assert out.std() > x.std() * 1.5
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_clahe_matches_opencv_closely(rng):
    cv2 = __import__("cv2")
    x = (rng.random((128, 128)) ** 2).astype(np.float32)
    u8 = np.clip(np.round(x * 255), 0, 255).astype(np.uint8)
    ref = cv2.createCLAHE(clipLimit=2.5, tileGridSize=(8, 8)).apply(u8)
    ours = np.asarray(clahe(jnp.asarray(u8.astype(np.float32) / 255.0),
                            clip_limit=2.5, grid=8)) * 255.0
    # Same algorithm family; allow small deviation from OpenCV's integer
    # excess-redistribution details.
    err = np.abs(ours - ref.astype(np.float64))
    assert np.median(err) <= 2.0
    assert np.mean(err) <= 4.0

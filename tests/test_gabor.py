"""Tests for orientation-steered Gabor enhancement."""

import numpy as np
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.ops.gabor import (
    gabor_enhance, estimate_ridge_frequency, gabor_kernel,
)
from multimodal_biometric_fingerprints_palms_tpu.ops.orientation import (
    compute_orientation_field,
)


def _ridges(angle_deg, period=9.0, h=128, w=128):
    theta = np.deg2rad(angle_deg)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    phase = (-np.sin(theta) * xx + np.cos(theta) * yy) / period * 2 * np.pi
    return (0.5 + 0.4 * np.cos(phase)).astype(np.float32)


def test_gabor_kernel_zero_mean():
    k = gabor_kernel(0.3, 1.0 / 9.0)
    assert abs(k.mean()) < 1e-6
    assert k.shape == (11, 11)


def test_estimate_ridge_frequency():
    img = jnp.asarray(_ridges(30, period=9.0))
    field = compute_orientation_field(img)
    f = float(estimate_ridge_frequency(img, field.orientation))
    assert abs(1.0 / f - 9.0) < 1.5   # recovered wavelength ~ 9 px


def test_gabor_enhances_matched_ridges(rng):
    clean = _ridges(45, period=9.0)
    noisy = np.clip(clean + rng.normal(0, 0.25, clean.shape), 0, 1).astype(np.float32)
    field = compute_orientation_field(jnp.asarray(noisy))
    out = np.asarray(gabor_enhance(jnp.asarray(noisy), field.orientation,
                                   freq=1.0 / 9.0))
    # response should correlate with the clean ridge structure better than
    # the noisy input does (center crop to avoid borders)
    c = np.corrcoef(out[20:-20, 20:-20].ravel(),
                    clean[20:-20, 20:-20].ravel())[0, 1]
    c_noisy = np.corrcoef(noisy[20:-20, 20:-20].ravel(),
                          clean[20:-20, 20:-20].ravel())[0, 1]
    assert c > c_noisy
    assert c > 0.9

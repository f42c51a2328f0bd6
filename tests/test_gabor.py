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


def test_gabor_blockwise_frequency(rng):
    """Per-block frequency estimation recovers a synthetic ridge period."""
    from multimodal_biometric_fingerprints_palms_tpu.ops.gabor import (
        estimate_ridge_frequency_blockwise,
    )
    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 0.5 + 0.5 * np.cos(2 * np.pi * xx / 9.0)   # wavelength 9 px
    fmap = np.asarray(estimate_ridge_frequency_blockwise(
        jnp.asarray(img[None]), block_size=32))
    assert fmap.shape == (1, 4, 4)
    np.testing.assert_allclose(fmap, 1.0 / 9.0, rtol=0.2)


def test_gabor_pipeline_stage_separates(rng):
    """Config-gated Gabor stage (preprocessing.gabor): the enhanced chain
    still extracts minutiae and separates a genuine from an impostor pair
    (EER-neutral-or-better evidence on the synthetic fixture)."""
    import jax
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_end_to_end_eer import _print
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing.enhance import (
        preprocess_fingerprint,
    )
    from multimodal_biometric_fingerprints_palms_tpu.features import (
        extract_minutiae, postprocess_minutiae,
    )
    from multimodal_biometric_fingerprints_palms_tpu.matching.ransac import (
        MatchParams, match_pairs_batch,
    )

    imgs = np.stack([_print(10, 0.0), _print(10, 0.12),
                     _print(77, 0.0)]).astype(np.float32) / 255.0
    res = jax.jit(lambda v: preprocess_fingerprint(v, gabor=True))(
        jnp.asarray(imgs))
    ms = postprocess_minutiae(extract_minutiae(res.skeleton), res.skeleton)
    assert (np.asarray(ms.count) >= 10).all()

    a = jax.tree.map(lambda x: x[jnp.array([0, 0])], ms)
    b = jax.tree.map(lambda x: x[jnp.array([1, 2])], ms)
    r = match_pairs_batch(a, b, MatchParams(ransac_iter=120, min_inliers=6))
    genuine, impostor = float(r.final_score[0]), float(r.final_score[1])
    assert genuine > 0.5
    assert impostor < 0.1

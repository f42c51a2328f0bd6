"""End-to-end enhancement chain tests on the synthetic fingerprint."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.preprocessing import (
    preprocess_fingerprint, normalize_image, binarize, segment_fingerprint,
)


def test_normalize_image_range(synthetic_fingerprint):
    out = np.asarray(normalize_image(jnp.asarray(synthetic_fingerprint)))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out.std() > 0.1


def test_segment_produces_mask(synthetic_fingerprint):
    seg, mask = segment_fingerprint(jnp.asarray(synthetic_fingerprint))
    m = np.asarray(mask)
    # elliptical print occupies a substantial central chunk
    assert 0.2 < m.mean() < 0.95
    assert m[160, 128]          # center inside
    # segmented image zeroed outside mask
    s = np.asarray(seg)
    assert np.allclose(s[~m], 0.0)


def test_binarize_finds_ridges(synthetic_fingerprint):
    b = np.asarray(binarize(jnp.asarray(synthetic_fingerprint)))
    frac = b.mean()
    assert 0.1 < frac < 0.8      # ridges, not empty/full


def test_full_pipeline_single(synthetic_fingerprint):
    res = preprocess_fingerprint(jnp.asarray(synthetic_fingerprint))
    h, w = synthetic_fingerprint.shape
    assert res.skeleton.shape == (h, w)
    sk = np.asarray(res.skeleton)
    assert sk.sum() > 500                      # found ridge structure
    assert np.asarray(res.mask).mean() > 0.2
    ori = np.asarray(res.orientation)
    assert (-np.pi / 2 - 1e-5 <= ori).all() and (ori < np.pi / 2 + 1e-5).all()


def test_full_pipeline_batched_matches_single(synthetic_fingerprint):
    x = jnp.asarray(synthetic_fingerprint)
    batch = jnp.stack([x, x])
    res_b = jax.jit(preprocess_fingerprint)(batch)
    res_s = preprocess_fingerprint(x)
    np.testing.assert_array_equal(np.asarray(res_b.skeleton[0]),
                                  np.asarray(res_b.skeleton[1]))
    # batched result equals single-image result
    assert (np.asarray(res_b.skeleton[0]) == np.asarray(res_s.skeleton)).mean() > 0.999

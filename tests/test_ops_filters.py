"""Golden tests for filter ops against scipy/numpy references."""

import numpy as np
import scipy.ndimage as ndi

import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.ops import (
    gaussian_blur, box_filter, sobel, conv2d_same,
)


def test_gaussian_blur_matches_scipy(rng):
    x = rng.random((64, 48)).astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(x), 2.0))
    ref = ndi.gaussian_filter(x, 2.0, mode="reflect")
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_gaussian_blur_batched(rng):
    x = rng.random((3, 32, 32)).astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(x), 1.5))
    for i in range(3):
        ref = ndi.gaussian_filter(x[i], 1.5, mode="reflect")
        np.testing.assert_allclose(ours[i], ref, atol=1e-4)


def test_box_filter_matches_scipy(rng):
    x = rng.random((40, 56)).astype(np.float32)
    ours = np.asarray(box_filter(jnp.asarray(x), 5))
    ref = ndi.uniform_filter(x, 5, mode="reflect")
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_sobel_matches_scipy(rng):
    x = rng.random((40, 40)).astype(np.float32)
    gx, gy = sobel(jnp.asarray(x))
    # scipy sobel axis=1 is horizontal derivative (matches our gx)
    ref_gx = ndi.sobel(x, axis=1, mode="reflect")
    ref_gy = ndi.sobel(x, axis=0, mode="reflect")
    np.testing.assert_allclose(np.asarray(gx), ref_gx, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy), ref_gy, atol=1e-3)


def test_conv2d_same_zero_border(rng):
    x = rng.random((16, 16)).astype(np.float32)
    k = rng.random((3, 3)).astype(np.float32)
    ours = np.asarray(conv2d_same(jnp.asarray(x), jnp.asarray(k), border="zero"))
    ref = ndi.correlate(x, k, mode="constant", cval=0.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)

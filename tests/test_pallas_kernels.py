"""Interpret-mode numerics tests for the Pallas kernels vs XLA references."""

import numpy as np
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_kernels import (
    sauvola_binarize_pallas, nlm_denoise_pallas,
)
from multimodal_biometric_fingerprints_palms_tpu.ops.filters import box_filter
from multimodal_biometric_fingerprints_palms_tpu.ops.denoise import nlm_denoise


def _sauvola_xla(x, win=25, k=0.25):
    mean = box_filter(x, win)
    sqmean = box_filter(x * x, win)
    std = jnp.sqrt(jnp.clip(sqmean - mean * mean, 0.0, None))
    std_n = std / (jnp.max(std, axis=(-2, -1), keepdims=True) + 1e-6)
    k_map = k * (1.0 - 0.5 * std_n)
    sauv = mean * (1.0 - k_map * (1.0 - std / (mean + 1e-6)))
    return (x < sauv).astype(jnp.float32)


def test_sauvola_pallas_matches_xla(rng):
    x = jnp.asarray(rng.random((2, 64, 128)).astype(np.float32))
    ours = np.asarray(sauvola_binarize_pallas(x, interpret=True))
    ref = np.asarray(_sauvola_xla(x))
    assert (ours == ref).mean() > 0.999


def test_nlm_pallas_matches_xla(rng):
    x = jnp.asarray(rng.random((1, 40, 64)).astype(np.float32))
    ours = np.asarray(nlm_denoise_pallas(x, interpret=True))
    ref = np.asarray(nlm_denoise(x, precision="f32"))
    np.testing.assert_allclose(ours, ref, atol=2e-3)

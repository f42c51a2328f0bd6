"""Golden parity vs skimage semantics (VERDICT r2 item 3).

Pins ops/skeleton.py, ops/morphology.py binary reconstruction and
ops/components.py clean-mask filtering to the exact semantics of the
skimage calls the reference makes (fingerprint_preprocess.py:73-81,
161-177), via the vendored oracles in tests/skimage_oracle.py (which share
skimage's real scipy.ndimage labeling backend — see that module's header).

Masks are "real-shaped": binarized synthetic fingerprints at the pipeline's
native 320x256, with speckle objects and punched holes so the size filters
and reconstruction actually have work to do.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_biometric_fingerprints_palms_tpu.ops.components import (
    remove_small_objects, remove_small_holes, clean_mask)
from multimodal_biometric_fingerprints_palms_tpu.ops.morphology import (
    binary_reconstruction_by_dilation, binary_erode, binary_opening)
from multimodal_biometric_fingerprints_palms_tpu.ops.skeleton import (
    skeletonize)

import skimage_oracle as sk


def _ridge_mask(synthetic_fingerprint, thresh=0.55, seed=0):
    """Binarized ridge pattern + speckle noise + punched holes: the shape
    class the binarize stage feeds these ops (many thin 8-connected ridges,
    small islands below min_size, small holes below area_threshold)."""
    g = np.random.default_rng(seed)
    mask = synthetic_fingerprint < thresh
    speckle = g.random(mask.shape) < 0.002
    mask = mask | ndi_dilate(speckle, 1 + (seed % 2))
    holes = g.random(mask.shape) < 0.001
    mask = mask & ~ndi_dilate(holes, 2)
    return mask


def ndi_dilate(m, it):
    import scipy.ndimage as ndi
    return ndi.binary_dilation(m, iterations=it)


@pytest.fixture(params=[0, 1, 2])
def mask(request, synthetic_fingerprint):
    return _ridge_mask(synthetic_fingerprint, seed=request.param)


def test_remove_small_objects_golden(mask):
    ours = np.asarray(remove_small_objects(jnp.asarray(mask), 80,
                                           connectivity=1))
    gold = sk.remove_small_objects(mask, 80, connectivity=1)
    assert np.array_equal(ours, gold)


def test_remove_small_objects_8conn_golden(mask):
    ours = np.asarray(remove_small_objects(jnp.asarray(mask), 64,
                                           connectivity=2))
    gold = sk.remove_small_objects(mask, 64, connectivity=2)
    assert np.array_equal(ours, gold)


def test_remove_small_holes_golden(mask):
    ours = np.asarray(remove_small_holes(jnp.asarray(mask), 150,
                                         connectivity=1))
    gold = sk.remove_small_holes(mask, 150, connectivity=1)
    assert np.array_equal(ours, gold)


def test_clean_mask_golden(mask):
    """The exact binarize-stage composition (enhance.py:164): skimage
    remove_small_objects(80) then remove_small_holes(150), connectivity 1."""
    ours = np.asarray(clean_mask(jnp.asarray(mask), 80, 150, connectivity=1))
    gold = sk.remove_small_holes(
        sk.remove_small_objects(mask, 80, connectivity=1), 150,
        connectivity=1)
    assert np.array_equal(ours, gold)


def test_reconstruction_golden(mask):
    """The binarize tail (enhance.py:166-168): marker = erode(opened),
    recon = reconstruction(marker, opened, 'dilation') — skimage default
    footprint is the full 3x3 square."""
    opened = np.asarray(binary_opening(jnp.asarray(mask), 3, "ellipse"))
    marker = np.asarray(binary_erode(jnp.asarray(opened), 3, "ellipse"))
    ours = np.asarray(binary_reconstruction_by_dilation(
        jnp.asarray(marker), jnp.asarray(opened)))
    gold = sk.reconstruction_dilation_binary(marker, opened)
    assert np.array_equal(ours, gold)


def test_skeletonize_golden(mask):
    """Pixel-exact Zhang-Suen parity (fingerprint_preprocess.py:171)."""
    clean = sk.remove_small_holes(
        sk.remove_small_objects(mask, 64, connectivity=1), 80,
        connectivity=1)
    ours = np.asarray(skeletonize(jnp.asarray(clean)))
    gold = sk.skeletonize_zhang(clean)
    assert np.array_equal(ours, gold)


def test_skeletonize_golden_batch(synthetic_fingerprint):
    """Batched (the pipeline thins batch-128 in lockstep) — every image in
    the batch must match its own sequential-oracle skeleton."""
    masks = np.stack([_ridge_mask(synthetic_fingerprint, seed=s)
                      for s in range(4)])
    ours = np.asarray(skeletonize(jnp.asarray(masks)))
    for i in range(4):
        assert np.array_equal(ours[i], sk.skeletonize_zhang(masks[i])), i

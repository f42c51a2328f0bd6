"""Tests for morphology, connected components, skeletonization."""

import numpy as np
import scipy.ndimage as ndi
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.ops import (
    erode, dilate, opening, closing, reconstruction_by_dilation,
    connected_components, remove_small_objects, remove_small_holes,
    largest_component, convex_hull_mask, skeletonize, neighbor_count,
)


def test_dilate_erode_match_scipy(rng):
    x = (rng.random((32, 32)) > 0.7).astype(np.float32)
    d = np.asarray(dilate(jnp.asarray(x), 3)) > 0.5
    e = np.asarray(erode(jnp.asarray(x), 3)) > 0.5
    ref_d = ndi.grey_dilation(x, size=(3, 3)) > 0.5
    ref_e = ndi.grey_erosion(x, size=(3, 3)) > 0.5
    assert (d == ref_d).mean() > 0.99
    assert (e[1:-1, 1:-1] == ref_e[1:-1, 1:-1]).all()


def test_reconstruction_by_dilation():
    # Marker under mask: reconstruction recovers the marked component only.
    mask = np.zeros((32, 32), np.float32)
    mask[4:12, 4:12] = 1.0
    mask[20:28, 20:28] = 1.0
    marker = np.zeros_like(mask)
    marker[6, 6] = 1.0
    out = np.asarray(reconstruction_by_dilation(jnp.asarray(marker), jnp.asarray(mask)))
    assert out[4:12, 4:12].sum() == 64.0
    assert out[20:28, 20:28].sum() == 0.0


def test_connected_components_counts(rng):
    x = np.zeros((48, 48), bool)
    x[2:6, 2:6] = True
    x[10:20, 10:20] = True
    x[30:31, 30:45] = True
    lab = np.asarray(connected_components(jnp.asarray(x)))
    fg_labels = np.unique(lab[x])
    assert len(fg_labels) == 3
    ref_lab, n = ndi.label(x, structure=np.ones((3, 3)))
    assert n == 3


def test_connected_components_vs_scipy_random(rng):
    x = rng.random((40, 40)) > 0.55
    lab = np.asarray(connected_components(jnp.asarray(x)))
    ref_lab, n = ndi.label(x, structure=np.ones((3, 3)))
    assert len(np.unique(lab[x])) == n
    # same partition: every our-label maps to exactly one scipy label
    for l in np.unique(lab[x]):
        assert len(np.unique(ref_lab[lab == l])) == 1


def test_remove_small_objects():
    x = np.zeros((32, 32), bool)
    x[2:4, 2:4] = True       # size 4
    x[10:20, 10:20] = True   # size 100
    out = np.asarray(remove_small_objects(jnp.asarray(x), 10))
    assert not out[2:4, 2:4].any()
    assert out[10:20, 10:20].all()


def test_remove_small_holes():
    x = np.ones((32, 32), bool)
    x[5:7, 5:7] = False      # hole size 4 -> filled
    x[15:25, 15:25] = False  # hole size 100 -> kept
    out = np.asarray(remove_small_holes(jnp.asarray(x), 10))
    assert out[5:7, 5:7].all()
    assert not out[15:25, 15:25].any()


def test_largest_component():
    x = np.zeros((32, 32), bool)
    x[2:4, 2:4] = True
    x[10:25, 10:25] = True
    out = np.asarray(largest_component(jnp.asarray(x)))
    assert out[10:25, 10:25].all()
    assert not out[2:4, 2:4].any()


def test_convex_hull_contains_and_convex():
    x = np.zeros((64, 64), bool)
    # L-shape: hull must fill the notch triangle
    x[10:50, 10:20] = True
    x[40:50, 10:50] = True
    hull = np.asarray(convex_hull_mask(jnp.asarray(x), n_directions=90))
    assert hull[x].all()                       # contains input
    assert hull[30, 30]                        # notch interior point filled
    assert hull.sum() > x.sum()


def test_skeletonize_thick_line():
    x = np.zeros((40, 40), bool)
    x[18:23, 5:35] = True  # 5-px-thick horizontal bar
    sk = np.asarray(skeletonize(jnp.asarray(x)))
    assert sk.sum() > 0
    assert sk.sum() < x.sum() * 0.35           # thinned
    cols = sk[:, 10:30].sum(axis=0)
    assert (cols <= 2).all() and cols.max() >= 1  # ~1 px wide


def test_neighbor_count():
    x = np.zeros((8, 8), np.float32)
    x[4, 3:6] = 1.0
    nc = np.asarray(neighbor_count(jnp.asarray(x)))
    assert nc[4, 4] == 2.0
    assert nc[4, 3] == 1.0


def test_binary_close_open_packed_matches_f32():
    from multimodal_biometric_fingerprints_palms_tpu.ops.morphology import (
        binary_close_open_packed, binary_closing, binary_opening,
    )
    rng = np.random.default_rng(7)
    base = rng.random((3, 48, 128))
    mask = jnp.asarray((base + np.roll(base, 2, -1) + np.roll(base, 2, -2)) > 1.6)
    got = np.asarray(binary_close_open_packed(mask, 15, shape="ellipse"))
    ref = np.asarray(binary_opening(binary_closing(mask, 15, "ellipse"),
                                    15, "ellipse"))
    np.testing.assert_array_equal(got, ref)


def test_convex_hull_interval_matches_scan():
    """The row-interval binary-search hull is bit-identical to the
    per-direction half-plane scan it replaced (same f32 predicate)."""
    from multimodal_biometric_fingerprints_palms_tpu.ops.components import (
        _convex_hull_mask_scan,
    )
    rng = np.random.default_rng(7)
    masks = []
    x = np.zeros((48, 80), bool)
    x[10:40, 10:18] = True
    x[30:40, 10:60] = True                       # L-shape
    masks.append(x)
    masks.append(rng.random((48, 80)) > 0.995)   # sparse points
    masks.append(rng.random((48, 80)) > 0.4)     # dense blob
    masks.append(np.zeros((48, 80), bool))       # empty
    m = np.zeros((48, 80), bool); m[24, 40] = True
    masks.append(m)                              # single pixel
    batch = jnp.asarray(np.stack(masks))
    for nd in (16, 90):
        a = np.asarray(convex_hull_mask(batch, n_directions=nd))
        b = np.asarray(_convex_hull_mask_scan(batch, n_directions=nd))
        np.testing.assert_array_equal(a, b)

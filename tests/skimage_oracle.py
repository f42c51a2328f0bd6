"""Vendored skimage-semantics oracles (VERDICT r2 item 3).

scikit-image is not installable in this environment, so these oracles pin
the exact semantics of the four skimage calls the reference makes
(fingerprint_preprocess.py:73-81 and :161-177) the strongest way available:

- ``remove_small_objects`` / ``remove_small_holes``: skimage's own
  implementation labels boolean input with ``scipy.ndimage.label`` using
  ``ndi.generate_binary_structure(ar.ndim, connectivity)`` and drops
  components with ``size < min_size`` (strictly less; holes are the same
  operation on the complement).  scipy.ndimage IS installed here, so this
  oracle shares skimage's actual labeling backend rather than being a
  second hand-rolled CC implementation.
- ``reconstruction(marker, mask, method='dilation')`` with the default
  footprint (the full 3x3 square for 2-D): for boolean inputs the
  fixpoint ``m <- dilate(m) & mask`` is exactly "keep the 8-connected
  components of mask that contain a marker pixel", computed here by
  labeling with the full 3x3 structure.
- ``skeletonize`` (2-D default, the Zhang-Suen method): an independent
  sequential NumPy port of the published two-subiteration algorithm
  [Zhang & Suen, CACM 1984] with the same neighbor ordering, border
  handling and parallel-removal-per-subpass discipline as skimage's
  ``_fast_skeletonize``.

The TPU ops under test (`ops/components.py`, `ops/morphology.py`,
`ops/skeleton.py`) are structurally unrelated programs (segment-keyed
min-scans, one-hot matmul lookups, lax.while stencils), so pixel equality
against these oracles is a meaningful cross-check of the semantics.
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi


def _structure(connectivity: int) -> np.ndarray:
    return ndi.generate_binary_structure(2, connectivity)


def remove_small_objects(ar: np.ndarray, min_size: int,
                         connectivity: int = 1) -> np.ndarray:
    """skimage.morphology.remove_small_objects on a 2-D boolean array."""
    ar = ar.astype(bool)
    label, n = ndi.label(ar, structure=_structure(connectivity))
    if n == 0:
        return ar.copy()
    sizes = np.bincount(label.ravel(), minlength=n + 1)
    keep = sizes >= min_size
    keep[0] = False
    return keep[label]


def remove_small_holes(ar: np.ndarray, area_threshold: int,
                       connectivity: int = 1) -> np.ndarray:
    """skimage.morphology.remove_small_holes: fill complement components
    with size < area_threshold (border-touching background included —
    skimage does not special-case the border)."""
    return ~remove_small_objects(~ar.astype(bool), area_threshold,
                                 connectivity)


def reconstruction_dilation_binary(marker: np.ndarray,
                                   mask: np.ndarray) -> np.ndarray:
    """skimage.morphology.reconstruction(marker, mask, method='dilation')
    specialized to boolean inputs and the default (full 3x3) footprint."""
    marker = marker.astype(bool) & mask.astype(bool)
    label, n = ndi.label(mask.astype(bool), structure=np.ones((3, 3), bool))
    if n == 0:
        return np.zeros_like(mask, dtype=bool)
    hit = np.zeros(n + 1, bool)
    hit[np.unique(label[marker])] = True
    hit[0] = False
    return hit[label]


def _zs_subpass(img: np.ndarray, first: bool) -> np.ndarray:
    """One parallel Zhang-Suen subiteration on a 0/1 array (zero border)."""
    p = np.pad(img, 1)
    # P2..P9 = N, NE, E, SE, S, SW, W, NW of each pixel
    p2 = p[:-2, 1:-1]; p3 = p[:-2, 2:]; p4 = p[1:-1, 2:]; p5 = p[2:, 2:]
    p6 = p[2:, 1:-1]; p7 = p[2:, :-2]; p8 = p[1:-1, :-2]; p9 = p[:-2, :-2]
    ring = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
    b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
    a = np.zeros_like(img, dtype=np.int32)
    for i in range(8):
        a += ((ring[i] == 0) & (ring[i + 1] == 1)).astype(np.int32)
    if first:
        c = (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
    else:
        c = (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
    remove = (img == 1) & (b >= 2) & (b <= 6) & (a == 1) & c
    out = img.copy()
    out[remove] = 0
    return out


def skeletonize_zhang(mask: np.ndarray, max_iters: int = 10000) -> np.ndarray:
    """skimage.morphology.skeletonize (2-D Zhang-Suen) on a boolean array."""
    img = mask.astype(np.uint8)
    for _ in range(max_iters):
        prev = img
        img = _zs_subpass(img, first=True)
        img = _zs_subpass(img, first=False)
        if np.array_equal(img, prev):
            break
    return img.astype(bool)

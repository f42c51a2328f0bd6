"""Morphology: erode/dilate/open/close + geodesic reconstruction.

TPU-native replacements for cv2.morphologyEx / cv2.erode and
skimage.morphology.reconstruction (fingerprint_preprocess.py:76-81, 107-109).

Grayscale erosion/dilation with a rectangular SE is a min/max
`lax.reduce_window`; elliptical and arbitrary SEs shift-and-reduce over the
SE's offsets (unrolled at trace time — SEs are small and static). Geodesic
reconstruction by dilation is a bounded `lax.while_loop` to fixpoint.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def ellipse_se(size: int) -> np.ndarray:
    """OpenCV-style elliptical structuring element
    (cv2.getStructuringElement(MORPH_ELLIPSE, (size, size)))."""
    r = size / 2.0
    inv_r = 1.0 / max(r - 0.5, 1e-6)
    se = np.zeros((size, size), dtype=bool)
    for i in range(size):
        dy = i - (size - 1) / 2.0
        dx_max = (r - 0.5) * np.sqrt(max(0.0, 1.0 - (dy * inv_r) ** 2))
        j0 = int(np.ceil((size - 1) / 2.0 - dx_max))
        j1 = int(np.floor((size - 1) / 2.0 + dx_max))
        se[i, j0:j1 + 1] = True
    return se


def _reduce_rect(x: jnp.ndarray, size: int, op) -> jnp.ndarray:
    init = -jnp.inf if op is lax.max else jnp.inf
    lead = x.shape[:-2]
    xn = x.reshape((-1,) + x.shape[-2:]).astype(jnp.float32)
    out = lax.reduce_window(
        xn, init, op,
        window_dimensions=(1, size, size),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    return out.reshape(lead + x.shape[-2:])


def _reduce_se(x: jnp.ndarray, se: np.ndarray, op) -> jnp.ndarray:
    """Shift-and-reduce morphology for an arbitrary boolean SE."""
    size_h, size_w = se.shape
    ch, cw = size_h // 2, size_w // 2
    is_max = op is jnp.maximum
    pad_val = -jnp.inf if is_max else jnp.inf
    padded = jnp.pad(
        x.astype(jnp.float32),
        [(0, 0)] * (x.ndim - 2) + [(ch, size_h - 1 - ch), (cw, size_w - 1 - cw)],
        constant_values=pad_val,
    )
    h, w = x.shape[-2:]
    out = None
    for dy in range(size_h):
        for dx in range(size_w):
            if not se[dy, dx]:
                continue
            sl = padded[..., dy:dy + h, dx:dx + w]
            out = sl if out is None else op(out, sl)
    return out


def binary_dilate(mask: jnp.ndarray, size: int = 3,
                  shape: str = "rect") -> jnp.ndarray:
    """Binary dilation as ONE convolution with the SE indicator: a pixel is
    set iff any SE-covered neighbor is set. Orders of magnitude cheaper to
    compile and run than unrolled shift-max chains for big SEs (the 15x15
    ellipse in segmentation) — the conv runs on the MXU."""
    from .filters import conv2d_same
    se = np.ones((size, size), np.float32) if shape == "rect" else (
        ellipse_se(size).astype(np.float32))
    hits = conv2d_same(mask.astype(jnp.float32), jnp.asarray(se), border="zero")
    return hits > 0.5


def binary_erode(mask: jnp.ndarray, size: int = 3,
                 shape: str = "rect") -> jnp.ndarray:
    """Binary erosion: all SE-covered neighbors set (conv hit-count equals
    the SE weight). Border behaves as background (zero padding), matching
    OpenCV's constant-0 border for erosion of 0/1 masks."""
    from .filters import conv2d_same
    se = np.ones((size, size), np.float32) if shape == "rect" else (
        ellipse_se(size).astype(np.float32))
    hits = conv2d_same(mask.astype(jnp.float32), jnp.asarray(se), border="zero")
    return hits > float(se.sum()) - 0.5


def binary_opening(mask: jnp.ndarray, size: int = 3,
                   shape: str = "rect") -> jnp.ndarray:
    return binary_dilate(binary_erode(mask, size, shape), size, shape)


def binary_closing(mask: jnp.ndarray, size: int = 3,
                   shape: str = "rect") -> jnp.ndarray:
    return binary_erode(binary_dilate(mask, size, shape), size, shape)


def binary_reconstruction_by_dilation(marker: jnp.ndarray, mask: jnp.ndarray,
                                      max_iters: int = 32,
                                      substeps: int = 8) -> jnp.ndarray:
    """Binary geodesic reconstruction: iterate marker <- dilate3x3(marker) &
    mask. ``substeps`` dilations per while-loop iteration amortize the
    convergence check."""
    from .filters import conv2d_same
    k = jnp.ones((3, 3), jnp.float32)
    marker = jnp.logical_and(marker.astype(bool), mask.astype(bool))
    # prevent producer recomputation inside the while loop
    marker, mask = lax.optimization_barrier((marker, mask.astype(bool)))

    def grow(m):
        for _ in range(substeps):
            m = jnp.logical_and(
                conv2d_same(m.astype(jnp.float32), k, border="zero") > 0.5,
                mask)
        return m

    def cond(state):
        m, prev, i = state
        return jnp.logical_and(i < max_iters, jnp.any(m != prev))

    def body(state):
        m, _, i = state
        return grow(m), m, i + 1

    first = grow(marker)
    out, _, _ = lax.while_loop(cond, body, (first, marker, jnp.int32(1)))
    return out


def dilate(x: jnp.ndarray, size: int = 3, shape: str = "rect") -> jnp.ndarray:
    if shape == "rect":
        return _reduce_rect(x, size, lax.max)
    return _reduce_se(x, ellipse_se(size), jnp.maximum)


def erode(x: jnp.ndarray, size: int = 3, shape: str = "rect") -> jnp.ndarray:
    if shape == "rect":
        return _reduce_rect(x, size, lax.min)
    return _reduce_se(x, ellipse_se(size), jnp.minimum)


def opening(x: jnp.ndarray, size: int = 3, shape: str = "rect") -> jnp.ndarray:
    return dilate(erode(x, size, shape), size, shape)


def closing(x: jnp.ndarray, size: int = 3, shape: str = "rect") -> jnp.ndarray:
    return erode(dilate(x, size, shape), size, shape)


def reconstruction_by_dilation(marker: jnp.ndarray, mask: jnp.ndarray,
                               max_iters: int = 256) -> jnp.ndarray:
    """Grayscale geodesic reconstruction by dilation
    (skimage.morphology.reconstruction, fingerprint_preprocess.py:76-81).

    Iterates marker <- min(dilate3x3(marker), mask) to fixpoint inside a
    bounded `lax.while_loop`. Requires marker <= mask.
    """
    marker = jnp.minimum(marker.astype(jnp.float32), mask.astype(jnp.float32))
    marker, mask = lax.optimization_barrier((marker, mask))

    def cond(state):
        m, prev, i = state
        return jnp.logical_and(i < max_iters, jnp.any(m != prev))

    def body(state):
        m, _, i = state
        new = jnp.minimum(_reduce_rect(m, 3, lax.max), mask)
        return new, m, i + 1

    first = jnp.minimum(_reduce_rect(marker, 3, lax.max), mask)
    out, _, _ = lax.while_loop(cond, body, (first, marker, jnp.int32(1)))
    return out

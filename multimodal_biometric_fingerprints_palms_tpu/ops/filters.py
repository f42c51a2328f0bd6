"""Separable / small-stencil filters.

TPU-native equivalents of the reference's cv2.GaussianBlur / boxFilter /
Sobel / scipy.ndimage.gaussian_filter usage (SURVEY.md §2.9). All functions
take (..., H, W) float32 arrays and operate on the trailing two dims.

Separable 1-D passes are *banded matmuls*: a constant (N, N) matrix with the
border semantics folded into the band edges, contracted on the MXU at
HIGHEST precision (bf16x3, f32-accurate). Single-channel spatial convs via
`lax.conv_general_dilated` lower pathologically on TPU (a 19-tap gaussian
pass measured ~10 ms on (128, 320, 256) where the matmul form runs in well
under 1 ms — the MXU is idle in this pipeline anyway); tiny kernels (<= 5
taps) stay as fused shift-adds on the VPU.

Border handling is reflect ("symmetric") to track OpenCV's BORDER_REFLECT_101
/ scipy's "reflect" closely; exactness at borders is covered by tolerance in
the golden tests rather than bit-parity.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _border_index(j: int, n: int, border: str) -> int | None:
    """Map an out-of-range tap index into [0, n) under the border rule;
    None = tap contributes nothing ("zero" border)."""
    while j < 0 or j >= n:
        if border == "zero":
            return None
        if border == "edge":
            return min(max(j, 0), n - 1)
        if border == "reflect":      # numpy "symmetric": -1 -> 0, n -> n-1
            j = -1 - j if j < 0 else 2 * n - 1 - j
        elif border == "mirror":     # numpy "reflect" / REFLECT_101
            j = -j if j < 0 else 2 * n - 2 - j
        else:  # pragma: no cover
            raise ValueError(border)
    return j


@functools.lru_cache(maxsize=256)
def _band_matrix(n: int, taps: tuple, border: str) -> np.ndarray:
    """(n, n) M with (M @ x)[i] = sum_t taps[t] * x[border(i + t - c)],
    c = len(taps) // 2 — one 1-D correlation pass as a matmul."""
    c = len(taps) // 2
    m = np.zeros((n, n), np.float32)
    for i in range(n):
        for t, wgt in enumerate(taps):
            j = _border_index(i + t - c, n, border)
            if j is not None:
                m[i, j] += wgt
    return m


def _conv1d_axis(x: jnp.ndarray, taps: np.ndarray, axis: int,
                 border: str) -> jnp.ndarray:
    """1-D correlation along `axis` (-1 or -2) of (..., H, W)."""
    taps = np.asarray(taps, np.float32)
    k = taps.shape[0]
    n = x.shape[axis]
    if k > 5:
        m = jnp.asarray(_band_matrix(n, tuple(taps.tolist()), border))
        if axis in (-1, x.ndim - 1):
            return jnp.einsum("...j,ij->...i", x, m,
                              precision=lax.Precision.HIGHEST)
        return jnp.einsum("ij,...jw->...iw", m, x,
                          precision=lax.Precision.HIGHEST)
    # tiny kernel: pad + shift-add (fuses into surrounding elementwise)
    c = k // 2
    ax = axis if axis >= 0 else x.ndim + axis
    pad_spec = [(0, 0)] * x.ndim
    pad_spec[ax] = (c, k - 1 - c)
    if border == "zero":
        padded = jnp.pad(x, pad_spec)
    else:
        mode = {"reflect": "symmetric", "mirror": "reflect",
                "edge": "edge"}[border]
        padded = jnp.pad(x, pad_spec, mode=mode)
    out = None
    for t in range(k):
        wgt = float(taps[t])
        if wgt == 0.0:
            continue
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(t, t + n)
        piece = wgt * padded[tuple(sl)]
        out = piece if out is None else out + piece
    return out if out is not None else jnp.zeros_like(x)


def conv2d_same(x: jnp.ndarray, kernel: jnp.ndarray,
                border: str = "reflect") -> jnp.ndarray:
    """2-D correlation with SAME-size output on the trailing dims.

    kernel: (kh, kw). border: "reflect" (default), "edge", "mirror" or
    "zero".

    1-D kernels lower to `lax.conv_general_dilated`, which XLA handles well.
    General 2-D kernels use shift-and-accumulate over the (static) kernel
    taps instead: single-channel 2-D convs lower pathologically on TPU
    (a 3x3 Sobel via lax.conv measured ~40 ms on (32, 320, 256) where the
    fused shift-add runs in well under 1 ms).
    """
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    pad_spec_2d = [(0, 0)] * (x.ndim - 2) + [(ph, kh - 1 - ph), (pw, kw - 1 - pw)]
    x = x.astype(jnp.float32)

    if 1 in (kh, kw):
        taps = np.asarray(kernel, dtype=np.float32).reshape(-1)
        axis = -1 if kh == 1 else -2
        return _conv1d_axis(x, taps, axis, border)

    if border == "zero":
        padded = jnp.pad(x, pad_spec_2d)
    else:
        mode = {"reflect": "symmetric", "mirror": "reflect",
                "edge": "edge"}[border]
        padded = jnp.pad(x, pad_spec_2d, mode=mode)
    h, w = x.shape[-2:]
    try:
        kern = np.asarray(kernel, dtype=np.float32)
    except Exception:  # traced kernel: keep weights symbolic
        kern = None
    out = jnp.zeros_like(x)
    if kern is None:
        for dy in range(kh):
            for dx in range(kw):
                out = out + kernel[dy, dx] * padded[..., dy:dy + h, dx:dx + w]
        return out
    for dy in range(kh):
        for dx in range(kw):
            wgt = float(kern[dy, dx])
            if wgt == 0.0:
                continue
            out = out + wgt * padded[..., dy:dy + h, dx:dx + w]
    return out


def _separable(x: jnp.ndarray, k1d, border: str) -> jnp.ndarray:
    taps = np.asarray(k1d, np.float32).reshape(-1)
    x = _conv1d_axis(x, taps, -2, border)
    return _conv1d_axis(x, taps, -1, border)


def gaussian_kernel1d(sigma: float, radius: int | None = None,
                      truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage-compatible 1-D Gaussian (truncate=4.0 default).
    Returned as host numpy so separable passes can bake it into constant
    banded matrices."""
    if radius is None:
        radius = int(truncate * float(sigma) + 0.5)
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / float(sigma)) ** 2)
    return (k / np.sum(k)).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, sigma: float, radius: int | None = None,
                  truncate: float = 4.0, border: str = "reflect") -> jnp.ndarray:
    """Separable Gaussian blur (replaces cv2.GaussianBlur /
    scipy.ndimage.gaussian_filter, e.g. fingerprint_preprocess.py:38,157)."""
    if sigma <= 0:
        return x
    k = gaussian_kernel1d(sigma, radius=radius, truncate=truncate)
    return _separable(x, k, border)


def box_filter(x: jnp.ndarray, size: int, border: str = "reflect") -> jnp.ndarray:
    """Mean filter (replaces cv2.boxFilter/blur,
    fingerprint_preprocess.py:51-52, post_processing.py:89)."""
    k = np.full((size,), 1.0 / size, dtype=np.float32)
    return _separable(x, k, border)


def blur_mean(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Alias matching cv2.blur semantics."""
    return box_filter(x, size)


_SOBEL_X = np.array([[-1.0, 0.0, 1.0],
                     [-2.0, 0.0, 2.0],
                     [-1.0, 0.0, 1.0]], dtype=np.float32)


def sobel(x: jnp.ndarray, border: str = "reflect") -> tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel gradients (gx, gy) — replaces cv2.Sobel
    (src/preprocessing/orientation.py:33-34)."""
    gx = conv2d_same(x, _SOBEL_X, border=border)
    gy = conv2d_same(x, _SOBEL_X.T, border=border)
    return gx, gy


def gaussian_blur_cv(x: jnp.ndarray, ksize: int, sigma: float,
                     border: str = "reflect") -> jnp.ndarray:
    """OpenCV-style Gaussian with explicit odd kernel size
    (cv2.GaussianBlur(img, (k, k), sigma))."""
    radius = ksize // 2
    if sigma <= 0:  # OpenCV derives sigma from ksize when sigma == 0
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    k = gaussian_kernel1d(sigma, radius=radius)
    return _separable(x, k, border)

"""Separable / small-stencil filters.

TPU-native equivalents of the reference's cv2.GaussianBlur / boxFilter /
Sobel / scipy.ndimage.gaussian_filter usage (SURVEY.md §2.9). All functions
take (..., H, W) float32 arrays and operate on the trailing two dims via a
single batched `lax.conv_general_dilated` — XLA maps these onto the MXU and
fuses surrounding elementwise work.

Border handling is reflect ("symmetric") to track OpenCV's BORDER_REFLECT_101
/ scipy's "reflect" closely; exactness at borders is covered by tolerance in
the golden tests rather than bit-parity.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _to_nchw(x: jnp.ndarray) -> tuple[jnp.ndarray, tuple]:
    """Flatten leading dims into batch: (..., H, W) -> (B, 1, H, W)."""
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    return x.reshape((-1, 1, h, w)), lead


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
        xn, lead = _to_nchw(x)
        pad_spec = ((0, 0), (0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw))
        if border == "zero":
            padded = jnp.pad(xn, pad_spec)
        else:
            mode = {"reflect": "symmetric", "mirror": "reflect",
                    "edge": "edge"}[border]
            padded = jnp.pad(xn, pad_spec, mode=mode)
        k = kernel.astype(jnp.float32).reshape(1, 1, kh, kw)
        out = lax.conv_general_dilated(
            padded, k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST,
        )
        return out.reshape(lead + x.shape[-2:])

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


def _separable(x: jnp.ndarray, k1d: jnp.ndarray, border: str) -> jnp.ndarray:
    x = conv2d_same(x, k1d.reshape(-1, 1), border=border)
    return conv2d_same(x, k1d.reshape(1, -1), border=border)


def gaussian_kernel1d(sigma: float, radius: int | None = None,
                      truncate: float = 4.0) -> jnp.ndarray:
    """scipy.ndimage-compatible 1-D Gaussian (truncate=4.0 default)."""
    if radius is None:
        radius = int(truncate * float(sigma) + 0.5)
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / float(sigma)) ** 2)
    return k / jnp.sum(k)


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
    k = jnp.full((size,), 1.0 / size, dtype=jnp.float32)
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

"""Orientation-steered Gabor ridge enhancement.

The reference has no Gabor bank (its enhancement is CLAHE+NLM+Sauvola,
SURVEY.md §2.3 note), but BASELINE.json names Gabor enhancement as the
north-star extension point. This is the classic Hong-Wan-Jain scheme made
TPU-shaped: build a bank of D oriented Gabor kernels, convolve the image
with the whole bank (fused shift-add stencils), and select per pixel by the
quantized local orientation — a dense gather-free `where` reduction.

Ridge frequency is either fixed (PolyU ~1/9 px at 1200 dpi) or estimated
globally from the orientation-normal intensity spectrum.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .filters import conv2d_same


def gabor_kernel(theta: float, freq: float, sigma_x: float = 4.0,
                 sigma_y: float = 4.0, size: int = 11) -> np.ndarray:
    """Even-symmetric Gabor kernel tuned to ridges at orientation theta."""
    half = size // 2
    ys, xs = np.mgrid[-half:half + 1, -half:half + 1].astype(np.float32)
    # rotate coordinates so x' runs across the ridges
    xr = xs * np.cos(theta + np.pi / 2) + ys * np.sin(theta + np.pi / 2)
    yr = -xs * np.sin(theta + np.pi / 2) + ys * np.cos(theta + np.pi / 2)
    env = np.exp(-0.5 * ((xr / sigma_x) ** 2 + (yr / sigma_y) ** 2))
    wave = np.cos(2.0 * np.pi * freq * xr)
    k = env * wave
    return (k - k.mean()).astype(np.float32)


def gabor_enhance(img: jnp.ndarray, orientation: jnp.ndarray,
                  mask: jnp.ndarray | None = None,
                  freq: float = 1.0 / 9.0,
                  n_orientations: int = 16,
                  size: int = 11) -> jnp.ndarray:
    """Enhance (..., H, W) ridges using the per-pixel orientation field
    (angles in [-pi/2, pi/2)). Returns the filtered image, zeroed outside
    ``mask`` when given."""
    thetas = np.pi * (np.arange(n_orientations) / n_orientations) - np.pi / 2

    responses = []
    for th in thetas:
        k = gabor_kernel(float(th), freq, size=size)
        responses.append(conv2d_same(img, jnp.asarray(k)))
    stack = jnp.stack(responses, axis=0)         # (D, ..., H, W)

    # Select the bank element matching the local orientation.
    bin_width = np.pi / n_orientations
    idx = jnp.round((orientation + np.pi / 2) / bin_width).astype(jnp.int32)
    idx = jnp.mod(idx, n_orientations)
    out = jnp.zeros_like(img)
    for d in range(n_orientations):
        out = jnp.where(idx == d, stack[d], out)

    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out


def estimate_ridge_frequency(img: jnp.ndarray, orientation: jnp.ndarray,
                             mask: jnp.ndarray | None = None,
                             min_wavelength: float = 4.0,
                             max_wavelength: float = 16.0) -> jnp.ndarray:
    """Global ridge frequency per image via the magnitude spectrum of the
    (masked) image: the dominant radial frequency within the plausible
    ridge-wavelength band. Returns (...,) cycles/pixel."""
    x = img.astype(jnp.float32)
    if mask is not None:
        x = jnp.where(mask, x, 0.0)
    x = x - jnp.mean(x, axis=(-2, -1), keepdims=True)
    spec = jnp.abs(jnp.fft.rfft2(x))
    h, w = x.shape[-2:]
    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.rfftfreq(w)[None, :]
    fr = jnp.sqrt(fy * fy + fx * fx)
    band = (fr >= 1.0 / max_wavelength) & (fr <= 1.0 / min_wavelength)
    spec = jnp.where(band, spec, 0.0)
    lead = x.shape[:-2]
    flat = spec.reshape(lead + (-1,))
    peak = jnp.argmax(flat, axis=-1)
    fr_flat = jnp.broadcast_to(fr, spec.shape[-2:]).reshape(-1)
    return fr_flat[peak]

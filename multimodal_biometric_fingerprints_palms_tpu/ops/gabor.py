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


def estimate_ridge_frequency_blockwise(img: jnp.ndarray,
                                       mask: jnp.ndarray | None = None,
                                       block_size: int = 32,
                                       min_wavelength: float = 4.0,
                                       max_wavelength: float = 16.0
                                       ) -> jnp.ndarray:
    """Per-block ridge frequency map (..., H/B, W/B) in cycles/pixel.

    Each B x B block's dominant radial frequency within the plausible
    ridge-wavelength band, from the block's 2-D magnitude spectrum (the
    TPU-shaped substitute for Hong-Wan-Jain x-signatures, which need
    per-block rotated sampling). Low-energy blocks (background) fall back
    to the image's energy-weighted mean frequency.
    """
    b = block_size
    h, w = img.shape[-2:]
    assert h % b == 0 and w % b == 0, (h, w, b)
    lead = img.shape[:-2]
    x = img.astype(jnp.float32)
    if mask is not None:
        x = jnp.where(mask, x, 0.0)
    blocks = x.reshape(lead + (h // b, b, w // b, b))
    blocks = jnp.swapaxes(blocks, -3, -2)              # (..., Hb, Wb, b, b)
    blocks = blocks - jnp.mean(blocks, axis=(-2, -1), keepdims=True)

    spec = jnp.abs(jnp.fft.rfft2(blocks))              # (..., Hb, Wb, b, b/2+1)
    fy = np.fft.fftfreq(b)[:, None]
    fx = np.fft.rfftfreq(b)[None, :]
    fr = np.sqrt(fy * fy + fx * fx).astype(np.float32)
    band = (fr >= 1.0 / max_wavelength) & (fr <= 1.0 / min_wavelength)
    spec = jnp.where(jnp.asarray(band), spec, 0.0)

    flat = spec.reshape(lead + spec.shape[-4:-2] + (-1,))
    peak_val = jnp.max(flat, axis=-1)
    peak_idx = jnp.argmax(flat, axis=-1)
    freq = jnp.asarray(fr.reshape(-1))[peak_idx]       # (..., Hb, Wb)

    # Fallback for low-energy blocks: energy-weighted mean of the rest.
    wgt = peak_val.reshape(lead + (-1,))
    f_flat = freq.reshape(lead + (-1,))
    mean_f = (jnp.sum(wgt * f_flat, axis=-1)
              / jnp.maximum(jnp.sum(wgt, axis=-1), 1e-6))
    thresh = 0.1 * jnp.max(peak_val, axis=(-2, -1), keepdims=True)
    return jnp.where(peak_val > thresh, freq,
                     mean_f.reshape(lead + (1, 1)))


def gabor_enhance_blockfreq(img: jnp.ndarray, orientation: jnp.ndarray,
                            freq_map: jnp.ndarray,
                            mask: jnp.ndarray | None = None,
                            n_orientations: int = 12,
                            n_frequencies: int = 4,
                            min_freq: float = 1.0 / 16.0,
                            max_freq: float = 1.0 / 4.0,
                            size: int = 11) -> jnp.ndarray:
    """Gabor enhancement with a per-block frequency map: the bank spans
    n_orientations x n_frequencies kernels; each pixel selects by its
    quantized orientation and its block's quantized frequency (gather-free
    `where` reductions over the bank)."""
    h, w = img.shape[-2:]
    hb, wb = freq_map.shape[-2:]
    # nearest-neighbor upsample of the block map to pixels
    fpix = jnp.repeat(jnp.repeat(freq_map, h // hb, axis=-2),
                      w // wb, axis=-1)

    fbins = np.geomspace(min_freq, max_freq, n_frequencies).astype(np.float32)
    fidx = jnp.argmin(
        jnp.abs(fpix[..., None] - jnp.asarray(fbins)), axis=-1)

    thetas = np.pi * (np.arange(n_orientations) / n_orientations) - np.pi / 2
    bin_width = np.pi / n_orientations
    oidx = jnp.mod(jnp.round((orientation + np.pi / 2) / bin_width
                             ).astype(jnp.int32), n_orientations)

    out = jnp.zeros_like(img)
    for fi, fq in enumerate(fbins):
        for d, th in enumerate(thetas):
            k = gabor_kernel(float(th), float(fq), size=size)
            resp = conv2d_same(img, jnp.asarray(k))
            out = jnp.where((oidx == d) & (fidx == fi), resp, out)
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

"""Denoising: non-local means and bilateral filtering.

Replaces cv2.fastNlMeansDenoising(h=10, template=7, search=21)
(fingerprint_preprocess.py:36). NLM is expressed as a `lax.scan` over the
441 search-window offsets — each step is one shifted subtraction, one
separable box filter (patch SSD), and a weighted accumulation, all of which
XLA fuses; the scan keeps the compiled program small. The bilateral filter
(the reference's configured-but-unused alternative,
config_fingerprint.yml:23-26) unrolls its small 5x5 window.

Images are float32 in [0,1]; OpenCV's h/sigma_color (0..255 scale) are
rescaled by 1/255 internally.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .filters import box_filter


def nlm_denoise(x: jnp.ndarray, h: float = 10.0, template_window: int = 7,
                search_window: int = 21) -> jnp.ndarray:
    """Non-local means over (..., H, W) in [0,1]."""
    hn = (h / 255.0) * 1.0
    r = search_window // 2
    hh, ww = x.shape[-2:]
    pad = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)], mode="reflect")

    offs = np.stack(np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                                indexing="ij"), axis=-1).reshape(-1, 2)
    offs = jnp.asarray(offs, dtype=jnp.int32)

    lead_idx = (0,) * (x.ndim - 2)

    def shift(dy, dx):
        start = lead_idx + (r + dy, r + dx)
        return lax.dynamic_slice(pad, start, x.shape)

    def step(carry, off):
        acc, wacc = carry
        dy, dx = off[0], off[1]
        shifted = shift(dy, dx)
        d2 = box_filter((x - shifted) ** 2, template_window)
        wgt = jnp.exp(-d2 / (hn * hn))
        return (acc + wgt * shifted, wacc + wgt), None

    (acc, wacc), _ = lax.scan(step, (jnp.zeros_like(x), jnp.zeros_like(x)), offs)
    return acc / jnp.maximum(wacc, 1e-8)


def bilateral_filter(x: jnp.ndarray, d: int = 5, sigma_color: float = 50.0,
                     sigma_space: float = 7.0) -> jnp.ndarray:
    """Bilateral filter (cv2.bilateralFilter semantics) over (..., H, W)."""
    sc = sigma_color / 255.0
    r = d // 2
    hh, ww = x.shape[-2:]
    pad = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)], mode="reflect")

    acc = jnp.zeros_like(x)
    wacc = jnp.zeros_like(x)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = pad[..., r + dy:r + dy + hh, r + dx:r + dx + ww]
            ws = np.exp(-(dy * dy + dx * dx) / (2.0 * sigma_space ** 2))
            wc = jnp.exp(-((x - shifted) ** 2) / (2.0 * sc ** 2))
            w = ws * wc
            acc = acc + w * shifted
            wacc = wacc + w
    return acc / jnp.maximum(wacc, 1e-8)

"""Ridge orientation field estimation.

TPU-native rebuild of src/preprocessing/orientation.py:9-85 — the gradient
structure-tensor method. The reference's per-16x16-block reliability-weighted
circular mean is a double Python loop (orientation.py:52-72, a flagged hot
spot); here it is a reshape-reduce over (H/bs, bs, W/bs, bs), fully batched.

Returns (block_orientation, pixel_orientation, pixel_reliability), angles in
[-pi/2, pi/2) as in the reference (:81-83).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .filters import gaussian_blur, sobel


class OrientationField(NamedTuple):
    block_orientation: jnp.ndarray   # (..., H/bs, W/bs)
    block_valid: jnp.ndarray         # (..., H/bs, W/bs) bool
    orientation: jnp.ndarray         # (..., H, W)
    reliability: jnp.ndarray         # (..., H, W) in [0,1]


def _block_reduce_sum(x: jnp.ndarray, bs: int) -> jnp.ndarray:
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    x = x.reshape(lead + (h // bs, bs, w // bs, bs))
    return jnp.sum(x, axis=(-3, -1))


def compute_orientation_field(
    img: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    block_size: int = 16,
    tensor_sigma: float = 3.0,
    pre_sigma: float = 1.0,
    coverage_gate: float = 0.3,
    reliability_clip: tuple[float, float] = (2.0, 98.0),
    block_smooth_sigma: float = 1.0,
    auto_invert: bool = True,
) -> OrientationField:
    """Structure-tensor orientation field over (..., H, W) in [0,1].

    H and W must be divisible by ``block_size``.
    """
    x = img.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(x, dtype=bool)
    m = mask.astype(jnp.float32)

    if auto_invert:
        # Ridges should be dark; invert when the masked mean is bright
        # (reference polarity auto-invert, orientation.py:26-28).
        mean = jnp.sum(x * m, axis=(-2, -1), keepdims=True) / jnp.maximum(
            jnp.sum(m, axis=(-2, -1), keepdims=True), 1.0)
        x = jnp.where(mean > 0.5, 1.0 - x, x)

    xs = gaussian_blur(x, pre_sigma)
    gx, gy = sobel(xs)
    gxx = gaussian_blur(gx * gx, tensor_sigma)
    gyy = gaussian_blur(gy * gy, tensor_sigma)
    gxy = gaussian_blur(gx * gy, tensor_sigma)

    # Reliability: anisotropy magnitude, percentile-clipped to [0,1]
    # (orientation.py:40-42).
    coh = jnp.sqrt((gxx - gyy) ** 2 + 4.0 * gxy * gxy)
    lo = jnp.percentile(coh, reliability_clip[0], axis=(-2, -1), keepdims=True)
    hi = jnp.percentile(coh, reliability_clip[1], axis=(-2, -1), keepdims=True)
    rel = jnp.clip((coh - lo) / jnp.maximum(hi - lo, 1e-8), 0.0, 1.0) * m

    # Doubled-angle representation; theta = 1/2 atan2(2Gxy, Gxx-Gyy) + pi/2
    # (orientation.py:44-45).
    sin2 = 2.0 * gxy
    cos2 = gxx - gyy

    # Reliability-weighted circular mean per block (vectorized :52-72).
    bs = block_size
    wsin = _block_reduce_sum(rel * sin2, bs)
    wcos = _block_reduce_sum(rel * cos2, bs)
    coverage = _block_reduce_sum(m, bs) / float(bs * bs)
    block_valid = coverage >= coverage_gate

    # Smooth the block field in the (sin, cos) domain (:75-79).
    if block_smooth_sigma > 0:
        wsin_s = gaussian_blur(wsin, block_smooth_sigma)
        wcos_s = gaussian_blur(wcos, block_smooth_sigma)
    else:
        wsin_s, wcos_s = wsin, wcos

    block_theta = 0.5 * jnp.arctan2(wsin_s, wcos_s) + jnp.pi / 2.0
    block_theta = jnp.mod(block_theta + jnp.pi / 2.0, jnp.pi) - jnp.pi / 2.0

    # Bilinear upsample to pixels in the doubled-angle domain (:81-83).
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    up_sin = jax.image.resize(jnp.sin(2.0 * block_theta), lead + (h, w), "bilinear")
    up_cos = jax.image.resize(jnp.cos(2.0 * block_theta), lead + (h, w), "bilinear")
    orient = 0.5 * jnp.arctan2(up_sin, up_cos)
    orient = jnp.mod(orient + jnp.pi / 2.0, jnp.pi) - jnp.pi / 2.0

    return OrientationField(block_theta, block_valid, orient, rel)

"""Ridge orientation field estimation.

TPU-native rebuild of src/preprocessing/orientation.py:9-85 — the gradient
structure-tensor method. The reference's per-16x16-block reliability-weighted
circular mean is a double Python loop (orientation.py:52-72, a flagged hot
spot); here it is a reshape-reduce over (H/bs, bs, W/bs, bs), fully batched.

Semantics tracked from the reference:
- polarity auto-invert when above-median pixels are brighter than
  below-median ones (orientation.py:26-28)
- pre-smooth sigma = max(0.5, smooth_sigma / 2) (:30)
- reliability = |anisotropy| percentile-clipped at [2, 98] (:40-42)
- per-pixel theta = 1/2 atan2(2Gxy, Gxx - Gyy) + pi/2 (:44-45)
- blocks failing the 0.3 mask-coverage gate stay 0 (:57-61)
- block field smoothed in the (sin 2t, cos 2t) domain (:75-79)
- pixel maps = bilinear upsample of the block fields; the returned
  reliability is the upsampled block-mean reliability (:81-82), and the
  orientation is wrapped to [-pi/2, pi/2) (:83)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .filters import gaussian_blur, sobel


class OrientationField(NamedTuple):
    block_orientation: jnp.ndarray   # (..., H/bs, W/bs)
    block_valid: jnp.ndarray         # (..., H/bs, W/bs) bool
    orientation: jnp.ndarray         # (..., H, W), [-pi/2, pi/2)
    reliability: jnp.ndarray         # (..., H, W) in [0,1] (block-mean, upsampled)
    pixel_reliability: jnp.ndarray   # (..., H, W) raw per-pixel reliability


def _block_reduce_sum(x: jnp.ndarray, bs: int) -> jnp.ndarray:
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    x = x.reshape(lead + (h // bs, bs, w // bs, bs))
    return jnp.sum(x, axis=(-3, -1))


def compute_orientation_field(
    img: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    block_size: int = 16,
    smooth_sigma: float = 3.0,
    smooth_orientation_sigma: float = 3.0,
    coverage_gate: float = 0.3,
    reliability_clip: tuple[float, float] = (2.0, 98.0),
    invert_if_needed: bool = True,
) -> OrientationField:
    """Structure-tensor orientation field over (..., H, W) in [0,1].

    H and W must be divisible by ``block_size``.
    """
    f = img.astype(jnp.float32)

    if invert_if_needed:
        from .histogram import quantiles_u8
        # inputs sit on the u8 grid (8-bit files / CLAHE LUT outputs), so the
        # median comes exactly from a 256-bin histogram — no per-image sort
        med = quantiles_u8(f, jnp.asarray([50.0]))[..., 0][..., None, None]
        above = jnp.sum(jnp.where(f > med, f, 0.0), axis=(-2, -1), keepdims=True)
        n_above = jnp.sum(jnp.where(f > med, 1.0, 0.0), axis=(-2, -1), keepdims=True)
        below = jnp.sum(jnp.where(f <= med, f, 0.0), axis=(-2, -1), keepdims=True)
        n_below = jnp.sum(jnp.where(f <= med, 1.0, 0.0), axis=(-2, -1), keepdims=True)
        invert = (above / jnp.maximum(n_above, 1.0)) > (below / jnp.maximum(n_below, 1.0))
        f = jnp.where(invert, 1.0 - f, f)

    f_s = gaussian_blur(f, max(0.5, smooth_sigma / 2.0))
    gx, gy = sobel(f_s, border="mirror")  # cv2.Sobel uses BORDER_REFLECT_101
    # structure-tensor smoothing in bf16 (angles/reliability are ratio
    # quantities; the ~0.4% bf16 noise is far below the block-aggregation
    # smoothing that follows)
    gxb = gx.astype(jnp.bfloat16)
    gyb = gy.astype(jnp.bfloat16)
    gxx = gaussian_blur(gxb * gxb, smooth_sigma).astype(jnp.float32)
    gyy = gaussian_blur(gyb * gyb, smooth_sigma).astype(jnp.float32)
    gxy = gaussian_blur(gxb * gyb, smooth_sigma).astype(jnp.float32)

    r = jnp.sqrt((gxx - gyy) ** 2 + 4.0 * gxy * gxy)
    from .histogram import quantiles_approx
    # histogram quantiles (error <= range/2048) instead of per-image sorts
    q = quantiles_approx(r, jnp.asarray(list(reliability_clip)), bins=2048)
    lo = q[..., 0][..., None, None]
    hi = q[..., 1][..., None, None]
    rel = jnp.clip((r - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)

    # The reference evaluates theta = 1/2 atan2(2Gxy, Gxx-Gyy) + pi/2 per
    # pixel and then sin/cos of the doubled angle (orientation.py:44-45,
    # 52-72). Those transcendentals are unnecessary: 2theta differs from
    # atan2(2Gxy, Gxx-Gyy) by pi, so sin(2theta) = -2Gxy/r and
    # cos(2theta) = -(Gxx-Gyy)/r with r the anisotropy magnitude already
    # computed for reliability. The 1e-12 on the cos numerator reproduces
    # the reference's atan2 x-argument epsilon (flat pixels -> cos = -1).
    bs = block_size
    r_safe = jnp.maximum(r, 1e-12)
    sin2t = -2.0 * gxy / r_safe
    cos2t = -((gxx - gyy) + 1e-12) / r_safe
    w = rel + 1e-6
    s_sum = _block_reduce_sum(w * sin2t, bs)
    c_sum = _block_reduce_sum(w * cos2t, bs)
    rel_mean = _block_reduce_sum(rel, bs) / float(bs * bs)

    if mask is not None:
        coverage = _block_reduce_sum(mask.astype(jnp.float32), bs) / float(bs * bs)
        block_valid = coverage >= coverage_gate
    else:
        block_valid = jnp.ones(s_sum.shape, dtype=bool)

    block_theta = jnp.where(block_valid, 0.5 * jnp.arctan2(s_sum, c_sum), 0.0)
    rel_blocks = jnp.where(block_valid, rel_mean, 0.0)

    # Directional smoothing of the block field (:75-79).
    if smooth_orientation_sigma > 0:
        sin2 = gaussian_blur(jnp.sin(2.0 * block_theta), smooth_orientation_sigma)
        cos2 = gaussian_blur(jnp.cos(2.0 * block_theta), smooth_orientation_sigma)
        block_theta = 0.5 * jnp.arctan2(sin2, cos2)

    # Bilinear upsample of the block fields (:81-82); angles are resized
    # directly, as in the reference. Matmul-form upsampling (MXU) instead
    # of the gather-based jax.image.resize.
    from .geometry import upsample_bilinear_matmul
    h, w_ = f.shape[-2:]
    orient = upsample_bilinear_matmul(block_theta, (h, w_))
    orient = jnp.mod(orient + jnp.pi / 2.0, jnp.pi) - jnp.pi / 2.0
    rel_img = upsample_bilinear_matmul(rel_blocks, (h, w_))

    return OrientationField(block_theta, block_valid, orient, rel_img, rel)

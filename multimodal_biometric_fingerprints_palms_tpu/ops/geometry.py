"""Geometry helpers: point transforms, angle wrapping, resize/warp.

Replaces the reference's utils (src/matching/utils.py:14-24: rotate_points /
angle_diff) and cv2.resize / warpAffine usage with jit-able equivalents.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotate_points(points: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., N, 2) xy points by theta (radians)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    return jnp.einsum("...ij,...nj->...ni", rot, points)


def angle_diff(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Wrapped angular difference in [-pi, pi] (src/matching/utils.py:20-24)."""
    d = a - b
    return jnp.mod(d + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def orientation_diff(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Difference of undirected ridge orientations, wrapped to [-pi/2, pi/2]."""
    d = a - b
    return jnp.mod(d + jnp.pi / 2.0, jnp.pi) - jnp.pi / 2.0


def resize_bilinear(img: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of trailing two dims (replaces cv2.resize)."""
    lead = img.shape[:-2]
    return jax.image.resize(img, lead + tuple(shape), "bilinear")


def upsample_bilinear_matmul(x: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Bilinear upsampling of the trailing two dims as two small matmuls:
    out = A_h @ x @ A_w^T, with the interpolation matrices built by resizing
    identity matrices through jax.image.resize — bit-identical results, but
    MXU matmuls instead of the gather-based resize (which measured ~58 ms on
    TPU for a block-field upsample vs <1 ms for the matmul form)."""
    h_in, w_in = x.shape[-2:]
    h_out, w_out = shape
    a_h = jax.image.resize(jnp.eye(h_in, dtype=jnp.float32),
                           (h_out, h_in), "bilinear")
    a_w = jax.image.resize(jnp.eye(w_in, dtype=jnp.float32),
                           (w_out, w_in), "bilinear")
    y = jnp.einsum("oh,...hw->...ow", a_h, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,...hw->...hp", a_w, y,
                      precision=jax.lax.Precision.HIGHEST)


def affine_warp(img: jnp.ndarray, matrix: jnp.ndarray,
                fill: float = 0.0) -> jnp.ndarray:
    """Inverse-warp a 2-D image with a 2x3 affine matrix (cv2.warpAffine
    semantics: ``matrix`` maps src -> dst; we sample with its inverse).

    img: (H, W); matrix: (2, 3). Bilinear sampling, constant fill outside.
    """
    h, w = img.shape[-2:]
    a = matrix[:, :2]
    t = matrix[:, 2]
    ainv = jnp.linalg.inv(a)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    dst = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (HW, 2) as (x, y)
    src = (dst - t) @ ainv.T
    sx, sy = src[:, 0], src[:, 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def sample(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc]
        return jnp.where(inb, vals, fill)

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return out.reshape(h, w)

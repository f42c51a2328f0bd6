"""Skeletonization (morphological thinning) on TPU.

Replaces skimage.morphology.skeletonize (fingerprint_preprocess.py:171) with
Zhang-Suen two-subiteration thinning expressed as masked 3x3 stencil passes
inside a bounded `lax.while_loop` — the whole loop compiles to one XLA
program, and batches thin in lockstep (SURVEY.md §7 "hard parts" #1).

Skeletons differ from skimage by occasional single-pixel choices (different
tie-breaking), which downstream minutiae tests treat distributionally.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .filters import conv2d_same

_NEIGHBOR_KERNEL = jnp.array([[1.0, 1.0, 1.0],
                              [1.0, 0.0, 1.0],
                              [1.0, 1.0, 1.0]], dtype=jnp.float32)


def _ring(x: jnp.ndarray) -> list[jnp.ndarray]:
    """8-neighborhood ring [P2..P9] (N, NE, E, SE, S, SW, W, NW) with
    zero border."""
    pad = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)])
    h, w = x.shape[-2:]

    def sh(dy, dx):
        return pad[..., 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    return [sh(-1, 0), sh(-1, 1), sh(0, 1), sh(1, 1),
            sh(1, 0), sh(1, -1), sh(0, -1), sh(-1, -1)]


def neighbor_count(skel: jnp.ndarray) -> jnp.ndarray:
    """Count of 8-neighbors (replaces the scipy 3x3 convolve at
    extract_features.py:43-44, fingerprint_preprocess.py:175)."""
    return conv2d_same(skel.astype(jnp.float32), _NEIGHBOR_KERNEL, border="zero")


def _zhang_suen_subpass(img: jnp.ndarray, first: bool) -> jnp.ndarray:
    p = _ring(img)
    p2, p3, p4, p5, p6, p7, p8, p9 = p
    b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
    ring = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
    a = jnp.zeros_like(img, dtype=jnp.int32)
    for i in range(8):
        a = a + jnp.logical_and(ring[i] == 0, ring[i + 1] == 1).astype(jnp.int32)
    if first:
        c1 = p2 * p4 * p6 == 0
        c2 = p4 * p6 * p8 == 0
    else:
        c1 = p2 * p4 * p8 == 0
        c2 = p2 * p6 * p8 == 0
    remove = (
        (img == 1)
        & (b >= 2) & (b <= 6)
        & (a == 1)
        & c1 & c2
    )
    return jnp.where(remove, jnp.int32(0), img)


def skeletonize(mask: jnp.ndarray, max_iters: int = 128) -> jnp.ndarray:
    """Zhang-Suen thinning to a 1-px-wide skeleton. mask: boolean (..., H, W).
    On TPU the whole relaxation runs bit-packed in a VMEM-resident Pallas
    kernel, 32 images per int32 plane (ops/pallas_bitpack.py)."""
    import jax as _jax
    if _jax.default_backend() == "tpu":
        from .pallas_bitpack import zs_thin_bitpacked
        return zs_thin_bitpacked(mask, max_iters)
    img0 = lax.optimization_barrier(mask.astype(jnp.int32))

    def cond(state):
        img, prev, i = state
        return jnp.logical_and(i < max_iters, jnp.any(img != prev))

    def body(state):
        img, _, i = state
        new = _zhang_suen_subpass(img, first=True)
        new = _zhang_suen_subpass(new, first=False)
        return new, img, i + 1

    first = _zhang_suen_subpass(img0, first=True)
    first = _zhang_suen_subpass(first, first=False)
    img, _, _ = lax.while_loop(cond, body, (first, img0, jnp.int32(1)))
    return img.astype(bool)


def prune_isolated(skel: jnp.ndarray) -> jnp.ndarray:
    """Drop skeleton pixels with no 8-neighbors
    (reference tip pruning, fingerprint_preprocess.py:174-176)."""
    nc = neighbor_count(skel)
    return jnp.logical_and(skel.astype(bool), nc >= 1.0)


def prune_endpoints(skel: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Iteratively remove endpoints (neighbor count == 1) to shorten spurs."""
    s = skel.astype(bool)
    for _ in range(iterations):
        nc = neighbor_count(s)
        s = jnp.logical_and(s, nc != 1.0)
    return s

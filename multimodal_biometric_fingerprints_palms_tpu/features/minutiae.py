"""Crossing-number minutiae extraction.

TPU-native rebuild of src/features/extract_features.py:38-69. The
reference's per-skeleton-pixel Python loop becomes a dense stencil: the
crossing number CN = 1/2 * sum |P[i] - P[i+1]| over the 8-neighbor ring is
computed for every pixel at once from eight shifted views, then the (at
most K) candidate pixels are compacted into fixed-size arrays in row-major
order with a cumulative-sum scatter — static shapes end to end.

Minutiae sets are padded to K=64 with a validity mask (the reference caps
at 60, post_processing.py:135), making every downstream matching op a
(K, K)-shaped dense computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MinutiaeSet(NamedTuple):
    """Fixed-K minutiae, mirroring the reference's (N, 7) matrix layout
    (match_features.py:52-64): columns xy, type, orientation, quality,
    coherence, angular_stability, plus a validity mask."""
    xy: jnp.ndarray                  # (..., K, 2) float32 (x, y)
    minutia_type: jnp.ndarray        # (..., K) int32: 0=ending, 1=bifurcation
    orientation: jnp.ndarray         # (..., K) float32
    quality: jnp.ndarray             # (..., K) float32
    coherence: jnp.ndarray           # (..., K) float32
    angular_stability: jnp.ndarray   # (..., K) float32
    valid: jnp.ndarray               # (..., K) bool

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def as_matrix(self) -> jnp.ndarray:
        """(..., K, 7) matrix in the reference column order."""
        return jnp.concatenate([
            self.xy,
            self.minutia_type[..., None].astype(jnp.float32),
            self.orientation[..., None],
            self.quality[..., None],
            self.coherence[..., None],
            self.angular_stability[..., None],
        ], axis=-1)


def from_matrix(mat: jnp.ndarray, valid: jnp.ndarray) -> MinutiaeSet:
    """Build a MinutiaeSet from the reference (…, K, 7) matrix layout."""
    return MinutiaeSet(
        xy=mat[..., :2].astype(jnp.float32),
        minutia_type=mat[..., 2].astype(jnp.int32),
        orientation=mat[..., 3].astype(jnp.float32),
        quality=mat[..., 4].astype(jnp.float32),
        coherence=mat[..., 5].astype(jnp.float32),
        angular_stability=mat[..., 6].astype(jnp.float32),
        valid=valid.astype(bool),
    )


def crossing_number(skel: jnp.ndarray) -> jnp.ndarray:
    """CN map over (..., H, W) boolean skeletons (extract_features.py:53-58)."""
    sk = skel.astype(jnp.int32)
    pad = jnp.pad(sk, [(0, 0)] * (sk.ndim - 2) + [(1, 1), (1, 1)])
    h, w = sk.shape[-2:]

    def sh(dy, dx):
        return pad[..., 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    # Reference ring order: E, NE, N, NW, W, SW, S, SE (:53-57).
    ring = [sh(0, 1), sh(-1, 1), sh(-1, 0), sh(-1, -1),
            sh(0, -1), sh(1, -1), sh(1, 0), sh(1, 1)]
    cn = jnp.zeros_like(sk)
    for i in range(8):
        cn = cn + jnp.abs(ring[i] - ring[(i + 1) % 8])
    return cn // 2


def extract_minutiae(skel: jnp.ndarray, k: int = 64) -> MinutiaeSet:
    """Extract up to ``k`` minutiae per image from (..., H, W) skeletons.

    Candidates: skeleton pixels with CN == 1 (ending) or CN == 3
    (bifurcation); border pixels excluded (extract_features.py:50). Taken in
    row-major order (the reference's np.where iteration order). Quality
    fields are zero-initialized; `postprocess_minutiae` fills them.
    """
    sk = skel.astype(bool)
    h, w = sk.shape[-2:]
    lead = sk.shape[:-2]

    cn = crossing_number(sk)
    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    interior = (ys >= 1) & (ys <= h - 2) & (xs >= 1) & (xs <= w - 2)
    cand = sk & interior & ((cn == 1) | (cn == 3))
    is_bif = (cn == 3).astype(jnp.int32)

    b = 1
    for d in lead:
        b *= d
    flat = cand.reshape(b, h * w)
    hw = h * w

    # First-k candidates in row-major order WITHOUT a sort or scatter:
    # ranks = cumsum of the candidate mask (monotone), so the pixel of rank
    # r is located by a binary search for r+1 — one cheap scan plus K=64
    # tiny searches/gathers (a full top_k over 81920 keys measured ~190 ms
    # on TPU; this runs in ~1 ms).
    ranks = jnp.cumsum(flat.astype(jnp.int32), axis=-1)       # (b, hw)
    # index of rank r = #positions with cumsum < r. Since ranks is
    # nondecreasing, that count equals the inclusive cumsum of the
    # histogram of min(ranks, k) below r — one (b, hw, k+1) one-hot bf16
    # contraction on the MXU instead of a (b, hw, k) broadcast compare
    # (which materialized ~200 ms of traffic at batch 128).
    clipped = jnp.minimum(ranks, k)
    oh = jax.nn.one_hot(clipped, k + 1, dtype=jnp.bfloat16)
    ones = jnp.ones((hw,), jnp.bfloat16)
    hist = jnp.einsum("bpv,p->bv", oh, ones,
                      preferred_element_type=jnp.float32)    # (b, k+1)
    top_idx = jnp.cumsum(hist[:, :k].astype(jnp.int32), axis=-1)
    top_idx = jnp.minimum(top_idx, hw - 1).astype(jnp.int32)  # (b, k)
    out_y = (top_idx // w).astype(jnp.int32)
    out_x = (top_idx % w).astype(jnp.int32)
    out_t = jnp.take_along_axis(is_bif.reshape(b, hw), top_idx, axis=-1)

    count = jnp.sum(flat.astype(jnp.int32), axis=-1)[:, None]
    valid = jnp.arange(k, dtype=jnp.int32)[None, :] < jnp.minimum(count, k)
    out_x = jnp.where(valid, out_x, 0)
    out_y = jnp.where(valid, out_y, 0)
    out_t = jnp.where(valid, out_t, 0)

    zeros = jnp.zeros((b, k), jnp.float32)
    ms = MinutiaeSet(
        xy=jnp.stack([out_x, out_y], axis=-1).astype(jnp.float32),
        minutia_type=out_t.astype(jnp.int32),
        orientation=zeros,
        quality=zeros,
        coherence=zeros,
        angular_stability=zeros,
        valid=valid,
    )
    if lead:
        ms = jax.tree.map(lambda a: a.reshape(lead + a.shape[1:]), ms)
    else:
        ms = jax.tree.map(lambda a: a.reshape(a.shape[1:]), ms)
    return ms

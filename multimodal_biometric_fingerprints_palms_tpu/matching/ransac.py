"""RANSAC rigid-transform minutiae matching.

TPU-native rebuild of src/matching/match.py. The reference runs each RANSAC
hypothesis as a thread (match.py:156-167), each building a KDTree and
querying it (match.py:46-48); here the H hypotheses are one `vmap` — each
hypothesis is a (K, K) masked distance computation (K=64), so a whole
hypothesis batch is a few fused matmul-shaped ops on the MXU — and pairs
batch with an outer `vmap` (`match_pairs_batch`).

Semantics tracked from the reference:
- descriptor weight clip(type_bonus * (0.5q + 0.3coh + 0.2angs), 0.05, 2.0),
  bifurcation bonus 1.25 (match.py:10-21)
- early rejects: <8 minutiae either side, spatial-std mismatch >35 (:81-88)
- weight-proportional sampling of the hypothesis pair, same-type gate
  (:93-100); per-hypothesis RNG via `fold_in` (reference: default_rng(42+i))
- inlier gates distance/type/orientation; per-inlier score
  exp(-d^2/2sd^2) * exp(-dth^2/2so^2) * wA * wB with sigma = 0.7*threshold
  (:53-70); hypothesis score (sum/min(sum wA, sum wB))^0.75 (:119-125)
- deterministic early-stop: the first hypothesis reaching
  stop_inlier_ratio * min(nA, nB) inliers wins, else best score (the
  reference's as_completed race, :158-167, made deterministic)
- closed-form 2x2 Kabsch refinement (replaces the SVD, :174-191),
  re-match, exponent 0.5, spread-consistency reject |dA-dB|>18 (:200-215)
- mutual-nearest cross-check (:252-256); final score exponent 0.25 (:264)
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..features.minutiae import MinutiaeSet

_BIG = 1e9


class MatchParams(NamedTuple):
    dist_thresh: float = 10.0
    orient_thresh: float = math.radians(12.0)
    use_type: bool = True
    ransac_iter: int = 300
    min_inliers: int = 8
    stop_inlier_ratio: float = 0.25
    cross_check: bool = True
    seed: int = 42


class MatchResult(NamedTuple):
    final_score: jnp.ndarray   # scalar in [0,1]
    inlier_ratio: jnp.ndarray
    n_inliers: jnp.ndarray
    theta: jnp.ndarray
    t: jnp.ndarray             # (2,)


def compute_descriptor_weights(ms: MinutiaeSet) -> jnp.ndarray:
    """(…, K) weights; invalid slots get 0 (match.py:10-21)."""
    type_bonus = jnp.where(ms.minutia_type == 1, 1.25, 1.0)
    base = 0.5 * ms.quality + 0.3 * ms.coherence + 0.2 * ms.angular_stability
    w = jnp.clip(type_bonus * base, 0.05, 2.0)
    return jnp.where(ms.valid, w, 0.0)


def _apply_rigid(pts, theta, t):
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = pts[..., 0], pts[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1) + t


def _angle_diff(a, b):
    d = a - b
    return jnp.mod(d + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def _sqdist(pa: jnp.ndarray, pb: jnp.ndarray) -> jnp.ndarray:
    """(K, K) squared distances in matmul form: |a|^2 + |b|^2 - 2 a.b^T —
    the contraction runs on the MXU (the KDTree replacement, match.py:46-48)."""
    aa = jnp.sum(pa * pa, axis=-1, keepdims=True)
    bb = jnp.sum(pb * pb, axis=-1)
    ab = jnp.dot(pa, pb.T, preferred_element_type=jnp.float32)
    return jnp.maximum(aa - 2.0 * ab + bb[None, :], 0.0)


def _match_with_transform(a: MinutiaeSet, b: MinutiaeSet, wa, wb, theta, t,
                          p: MatchParams):
    """Dense rebuild of match.py:32-73. Returns (scores, inlier_mask, idx_b)
    per A slot."""
    ta = _apply_rigid(a.xy, theta, t)                       # (K, 2)
    d2 = _sqdist(ta, b.xy)
    d2 = jnp.where(b.valid[None, :], d2, _BIG)              # mask invalid B
    idx_b = jnp.argmin(d2, axis=-1)                         # NN in B per A
    d = jnp.sqrt(jnp.take_along_axis(d2, idx_b[:, None], axis=-1)[:, 0])

    ang_err = jnp.abs(_angle_diff(a.orientation + theta, b.orientation[idx_b]))
    type_ok = jnp.logical_or(not p.use_type,
                             a.minutia_type == b.minutia_type[idx_b])
    inlier = (a.valid & (d <= p.dist_thresh) & type_ok
              & (ang_err <= p.orient_thresh))

    sigma_d = p.dist_thresh * 0.7
    sigma_o = p.orient_thresh * 0.7
    spatial = jnp.exp(-(d ** 2) / (2.0 * sigma_d ** 2))
    orient_f = jnp.exp(-(ang_err ** 2) / (2.0 * sigma_o ** 2))
    scores = jnp.where(inlier, spatial * orient_f * wa * wb[idx_b], 0.0)
    return scores, inlier, idx_b


def _hypothesis(key, a: MinutiaeSet, b: MinutiaeSet, wa, wb, possible,
                p: MatchParams):
    """One RANSAC hypothesis (match.py:75-127) under a fold_in key."""
    ka, kb = jax.random.split(key)

    # Weight-proportional sample in A (:93).
    logits_a = jnp.where(a.valid, jnp.log(jnp.maximum(wa, 1e-12)), -jnp.inf)
    ia = jax.random.categorical(ka, logits_a)

    # Same-type candidates in B (:96-100).
    cand = b.valid & (b.minutia_type == a.minutia_type[ia])
    has_cand = jnp.any(cand)
    logits_b = jnp.where(cand, jnp.log(jnp.maximum(wb, 1e-12)), -jnp.inf)
    ib = jax.random.categorical(kb, jnp.where(has_cand, logits_b,
                                              jnp.zeros_like(logits_b)))

    theta = _angle_diff(b.orientation[ib], a.orientation[ia])
    t = b.xy[ib] - _apply_rigid(a.xy[ia], theta, jnp.zeros(2))

    scores, inlier, _ = _match_with_transform(a, b, wa, wb, theta, t, p)
    n = jnp.sum(inlier.astype(jnp.int32))
    raw = jnp.sum(scores) / (possible + 1e-6)
    score = jnp.clip(raw ** 0.75, 0.0, 1.0)
    score = jnp.where((n >= p.min_inliers) & has_cand, score, 0.0)
    n = jnp.where(has_cand, n, 0)
    return score, n, theta, t


def _masked_mean(x, m, axis=None):
    num = jnp.sum(jnp.where(m, x, 0.0), axis=axis)
    den = jnp.maximum(jnp.sum(m.astype(x.dtype), axis=axis), 1.0)
    return num / den


def match_minutiae_pair(a: MinutiaeSet, b: MinutiaeSet,
                        p: MatchParams = MatchParams()) -> MatchResult:
    """1:1 match of two fixed-K minutiae sets (match.py:219-275). jit-able;
    vmap over pairs via `match_pairs_batch`."""
    wa = compute_descriptor_weights(a)
    wb = compute_descriptor_weights(b)
    na = jnp.sum(a.valid.astype(jnp.int32))
    nb = jnp.sum(b.valid.astype(jnp.int32))
    possible = jnp.minimum(jnp.sum(wa), jnp.sum(wb))

    # Early rejects (match.py:81-88), computed once for all hypotheses.
    std_a = jnp.sqrt(_masked_mean(
        (a.xy - _masked_mean(a.xy, a.valid[:, None], axis=0)) ** 2,
        a.valid[:, None], axis=0))
    std_b = jnp.sqrt(_masked_mean(
        (b.xy - _masked_mean(b.xy, b.valid[:, None], axis=0)) ** 2,
        b.valid[:, None], axis=0))
    reject = ((na < 8) | (nb < 8)
              | (jnp.linalg.norm(std_a - std_b) > 35.0))

    key = jax.random.PRNGKey(p.seed)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(p.ransac_iter))
    # Hypotheses evaluate vmapped in fixed-size chunks (lax.map over chunks)
    # so the (chunk, K, K) distance tensors stay bounded even when an outer
    # vmap batches many pairs.
    chunk = min(50, p.ransac_iter)
    n_chunks = -(-p.ransac_iter // chunk)
    pad = n_chunks * chunk - p.ransac_iter
    keys = jnp.concatenate([keys, keys[:1].repeat(pad, 0)]) if pad else keys
    keys = keys.reshape(n_chunks, chunk, *keys.shape[1:])
    h_score, h_n, h_theta, h_t = lax.map(
        lambda kc: jax.vmap(
            lambda k: _hypothesis(k, a, b, wa, wb, possible, p))(kc),
        keys)
    h_score, h_n, h_theta, h_t = (
        x.reshape((n_chunks * chunk,) + x.shape[2:])[:p.ransac_iter]
        for x in (h_score, h_n, h_theta, h_t))
    return _finish_match(a, b, wa, wb, possible, na, nb, reject,
                         h_score, h_n, h_theta, h_t, p)


def _finish_match(a: MinutiaeSet, b: MinutiaeSet, wa, wb, possible, na, nb,
                  reject, h_score, h_n, h_theta, h_t,
                  p: MatchParams) -> MatchResult:
    """Selection + Kabsch refine + cross-check + final score, shared by the
    XLA and Pallas hypothesis-scoring paths (match.py:158-275)."""
    h_score = jnp.where(reject, 0.0, h_score)
    h_n = jnp.where(reject, jnp.zeros_like(h_n), h_n)

    # Deterministic early-stop-or-best selection (:158-167).
    stop_count = p.stop_inlier_ratio * jnp.minimum(na, nb).astype(jnp.float32)
    reached = h_n.astype(jnp.float32) >= stop_count
    any_reached = jnp.any(reached & (h_score > 0.0))
    first_reached = jnp.argmax(reached & (h_score > 0.0))
    best_h = jnp.where(any_reached, first_reached, jnp.argmax(h_score))
    best_score = h_score[best_h]
    theta0, t0 = h_theta[best_h], h_t[best_h]

    # Kabsch refinement on the best hypothesis's inliers (:174-191), in
    # closed form for the 2x2 case: theta* = atan2(H01 - H10, H00 + H11).
    scores0, inl0, idxb0 = _match_with_transform(a, b, wa, wb, theta0, t0, p)
    m = inl0[:, None].astype(jnp.float32)
    pa = a.xy
    pb = b.xy[idxb0]
    ca = _masked_mean(pa, inl0[:, None], axis=0)
    cb = _masked_mean(pb, inl0[:, None], axis=0)
    A = (pa - ca) * m
    B = (pb - cb) * m
    h00 = jnp.sum(A[:, 0] * B[:, 0])
    h01 = jnp.sum(A[:, 0] * B[:, 1])
    h10 = jnp.sum(A[:, 1] * B[:, 0])
    h11 = jnp.sum(A[:, 1] * B[:, 1])
    theta_r = jnp.arctan2(h01 - h10, h00 + h11)
    t_r = cb - _apply_rigid(ca, theta_r, jnp.zeros(2))

    # Re-match with the refined transform (:194-205).
    scores_r, inl_r, idxb_r = _match_with_transform(a, b, wa, wb, theta_r, t_r, p)
    n_r = jnp.sum(inl_r.astype(jnp.int32))

    # Spread-consistency reject (:207-215).
    pa_in = a.xy
    pb_in = b.xy[idxb_r]
    da = _masked_mean(jnp.linalg.norm(
        pa_in - _masked_mean(pa_in, inl_r[:, None], axis=0), axis=-1), inl_r)
    db = _masked_mean(jnp.linalg.norm(
        pb_in - _masked_mean(pb_in, inl_r[:, None], axis=0), axis=-1), inl_r)
    spread_bad = (n_r >= 8) & (jnp.abs(da - db) > 18.0)

    ok = (best_score > 0.0) & ~spread_bad
    theta_f = jnp.where(best_score > 0.0, theta_r, 0.0)
    t_f = jnp.where(best_score > 0.0, t_r, jnp.zeros(2))

    # Mutual-nearest cross-check (:252-256): for each B, nearest transformed A.
    if p.cross_check:
        ta = _apply_rigid(a.xy, theta_f, t_f)
        d2_ba = jnp.sum((b.xy[:, None, :] - ta[None, :, :]) ** 2, axis=-1)
        d2_ba = jnp.where(a.valid[None, :], d2_ba, _BIG)
        idx_b_to_a = jnp.argmin(d2_ba, axis=-1)               # (K,) best A per B
        mutual = idx_b_to_a[idxb_r] == jnp.arange(a.valid.shape[0])
        inl_f = inl_r & mutual
    else:
        inl_f = inl_r
    inl_f = inl_f & ok
    scores_f = jnp.where(inl_f, scores_r, 0.0)

    n_f = jnp.sum(inl_f.astype(jnp.int32))
    final_score = jnp.clip(
        (jnp.sum(scores_f) / (possible + 1e-6)) ** 0.25, 0.0, 1.0)
    inlier_ratio = n_f.astype(jnp.float32) / jnp.maximum(
        1.0, jnp.minimum(na, nb).astype(jnp.float32))

    return MatchResult(
        final_score=final_score,
        inlier_ratio=inlier_ratio,
        n_inliers=n_f,
        theta=theta_f,
        t=t_f,
    )


@partial(jax.jit, static_argnums=(2,))
def match_pairs_batch(a: MinutiaeSet, b: MinutiaeSet,
                      p: MatchParams = MatchParams()) -> MatchResult:
    """Batched 1:1 matching: a, b are (P, K)-leading MinutiaeSets."""
    return jax.vmap(lambda x, y: match_minutiae_pair(x, y, p))(a, b)

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
    # When > ransac_iter, uniforms are drawn at this length and the first
    # ransac_iter rows used — so a cascade screen's hypotheses are a true
    # prefix of the full pass's (same seed, same sequence).
    full_iters: int = 0


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
    ab = jnp.dot(pa, pb.T, preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)
    return jnp.maximum(aa - 2.0 * ab + bb[None, :], 0.0)


# Quantized nearest-neighbor tie-break, shared by the XLA and Pallas
# matchers: encode = round(d2 * NN_Q) * K + j. The j term makes the encoded
# min UNIQUE, so the selection indicator is a single equality against the
# row min — no first-argmin scan (in the grouped Pallas kernel that scan
# was a second log2(K) roll butterfly, ~40% of kernel time). Exact in f32:
# (2^18 - 1) * 64 + 63 < 2^24. Distances quantize to a 1/NN_Q px^2 grid
# (score perturbation ~1e-5); saturated entries (d2 >= SAT/NN_Q = 1024 px^2)
# are beyond every gate, so their arbitrary tie order is unobservable.
_NN_Q = 256.0
_NN_SAT = float(2 ** 18 - 1)


def _nn_encode(d2: jnp.ndarray) -> jnp.ndarray:
    """(…, K) -> (…, K) unique-min encoding round(d2*Q)*K + j."""
    k = d2.shape[-1]
    d2q = jnp.minimum(jnp.round(d2 * _NN_Q), _NN_SAT)
    col = lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    return d2q * float(k) + col.astype(jnp.float32)


def _nn_onehot(d2: jnp.ndarray) -> jnp.ndarray:
    """(K, K) one-hot of each row's quantized-first argmin (see _nn_encode;
    the Pallas kernels produce the identical selection)."""
    enc = _nn_encode(d2)
    return (enc == jnp.min(enc, axis=-1, keepdims=True)).astype(jnp.float32)


def _nn_select(d2: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(F, d2_at): one-hot NN indicator and the selected (quantized)
    squared distance, decoded arithmetically from the encoded min."""
    k = d2.shape[-1]
    enc = _nn_encode(d2)
    encmin = jnp.min(enc, axis=-1, keepdims=True)
    f = (enc == encmin).astype(jnp.float32)
    d2_at = jnp.floor(encmin[..., 0] / float(k)) / _NN_Q
    return f, d2_at


def _match_with_transform(a: MinutiaeSet, b: MinutiaeSet, wa, wb, theta, t,
                          p: MatchParams):
    """Dense rebuild of match.py:32-73. Returns (scores, inlier_mask, F)
    per A slot, where F is the (K, K) one-hot nearest-neighbor indicator
    (row i selects i's NN in B). All NN-attribute lookups are one-hot MXU
    contractions — row gathers are pathologically slow on TPU."""
    ta = _apply_rigid(a.xy, theta, t)                       # (K, 2)
    d2 = _sqdist(ta, b.xy)
    d2 = jnp.where(b.valid[None, :], d2, _BIG)              # mask invalid B
    F, d2_at = _nn_select(d2)
    d = jnp.sqrt(d2_at)

    hi = lax.Precision.HIGHEST
    b_feat = jnp.stack([b.orientation, b.minutia_type.astype(jnp.float32),
                        wb], axis=-1)                       # (K, 3)
    b_at = jnp.dot(F, b_feat, preferred_element_type=jnp.float32,
                   precision=hi)
    ang_err = jnp.abs(_angle_diff(a.orientation + theta, b_at[:, 0]))
    type_ok = jnp.logical_or(
        not p.use_type,
        jnp.abs(a.minutia_type.astype(jnp.float32) - b_at[:, 1]) < 0.5)
    inlier = (a.valid & (d <= p.dist_thresh) & type_ok
              & (ang_err <= p.orient_thresh))

    sigma_d = p.dist_thresh * 0.7
    sigma_o = p.orient_thresh * 0.7
    spatial = jnp.exp(-(d ** 2) / (2.0 * sigma_d ** 2))
    orient_f = jnp.exp(-(ang_err ** 2) / (2.0 * sigma_o ** 2))
    scores = jnp.where(inlier, spatial * orient_f * wa * b_at[:, 2], 0.0)
    return scores, inlier, F


def hypothesis_uniforms(p: MatchParams) -> jnp.ndarray:
    """(H, 2) uniforms driving hypothesis sampling. The reference reuses the
    same seed series 42+i for every pair (match.py:146-150), so the uniforms
    are pair-independent and are generated ONCE — per-hypothesis
    `split`+`categorical` threefry chains were the matcher's single biggest
    cost (58 of 68 ms per 512-pair batch on a v5e chip).

    When ``p.full_iters > p.ransac_iter`` (the cascade's screen pass), the
    sequence is drawn at the full length and sliced, so the screen's
    hypotheses are exactly the first ``ransac_iter`` of the full pass's —
    a pair the screen promotes was judged on a subset of the hypotheses
    the full pass will see."""
    key = jax.random.PRNGKey(p.seed)
    n = max(p.full_iters, p.ransac_iter)
    return jax.random.uniform(key, (n, 2), jnp.float32)[:p.ransac_iter]


def _first_hit(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """One-hot indicator of the first index where cdf exceeds u (inverse-CDF
    sampling without gathers; (…, K) cdf, (…, 1) u).

    When u is close enough to 1 that u*total rounds up to total in f32,
    `cdf > u` can be all-false; the `cdf >= total` term forces a hit at the
    last positive-weight index (the first slot where the cdf reaches its
    total) without changing the normal case, where the first `cdf > u` hit
    is always at or before that slot."""
    sel = (cdf > u) | (cdf >= cdf[..., -1:])
    prev = jnp.concatenate(
        [jnp.zeros(sel.shape[:-1] + (1,), bool), sel[..., :-1]], axis=-1)
    return (sel & ~prev).astype(jnp.float32)


def sample_hypotheses(a: MinutiaeSet, b: MinutiaeSet, wa, wb,
                      p: MatchParams, u: jnp.ndarray | None = None):
    """Weight-proportional rigid-hypothesis sampling (match.py:93-107) for
    all H hypotheses of one pair at once, in inverse-CDF one-hot-matmul form:
    pick a in A ∝ w, pick b among same-type B candidates ∝ w, hypothesis =
    (theta, t) aligning them. Returns theta (H,), t (H, 2), has_cand (H,)."""
    if u is None:
        u = hypothesis_uniforms(p)
    h = u.shape[0]
    k = a.valid.shape[0]
    # Inclusive prefix sums as lower-triangular MXU matmuls (cumsum lowers
    # to an associative scan with relayouts on TPU; the matmul is free).
    tri = jnp.tril(jnp.ones((k, k), jnp.float32)).T            # (K, K)

    hi = lax.Precision.HIGHEST  # exact one-hot/prefix contractions on TPU
    wa_v = jnp.where(a.valid, wa, 0.0)
    ca = jnp.dot(wa_v, tri, precision=hi)
    fa = _first_hit(ca[None, :], u[:, 0:1] * ca[-1])          # (H, K) one-hot
    # all per-index extractions in one (K, 4) contraction
    a_feat = jnp.stack([a.minutia_type.astype(jnp.float32), a.orientation,
                        a.xy[:, 0], a.xy[:, 1]], axis=-1)      # (K, 4)
    a_sel = jnp.dot(fa, a_feat, preferred_element_type=jnp.float32,
                    precision=hi)
    atype_s, aori_s = a_sel[:, 0], a_sel[:, 1]
    axy_s = a_sel[:, 2:4]                                      # (H, 2)

    wb_v = jnp.where(b.valid, wb, 0.0)
    btype = b.minutia_type.astype(jnp.float32)
    cand_w = jnp.where(jnp.abs(btype[None, :] - atype_s[:, None]) < 0.5,
                       wb_v[None, :], 0.0)                     # (H, K)
    cb = jnp.dot(cand_w, tri, preferred_element_type=jnp.float32,
                 precision=hi)
    total_b = cb[:, -1:]
    has_cand = total_b[:, 0] > 0.0
    fb = _first_hit(cb, u[:, 1:2] * total_b)
    b_feat = jnp.stack([b.orientation, b.xy[:, 0], b.xy[:, 1]], axis=-1)
    b_sel = jnp.dot(fb, b_feat, preferred_element_type=jnp.float32,
                    precision=hi)
    bori_s = b_sel[:, 0]
    bxy_s = b_sel[:, 1:3]

    theta = _angle_diff(bori_s, aori_s)
    t = bxy_s - _apply_rigid(axy_s, theta, jnp.zeros(2))
    return theta, t, has_cand.astype(jnp.float32)


def _hypothesis(theta, t, has_cand, a: MinutiaeSet, b: MinutiaeSet, wa, wb,
                possible, p: MatchParams):
    """Score one sampled RANSAC hypothesis (match.py:109-127)."""
    scores, inlier, _ = _match_with_transform(a, b, wa, wb, theta, t, p)
    n = jnp.sum(inlier.astype(jnp.int32))
    raw = jnp.sum(scores) / (possible + 1e-6)
    score = jnp.clip(raw ** 0.75, 0.0, 1.0)
    ok = has_cand > 0.5
    score = jnp.where((n >= p.min_inliers) & ok, score, 0.0)
    n = jnp.where(ok, n, 0)
    return score, n, theta, t


def _masked_mean(x, m, axis=None):
    num = jnp.sum(jnp.where(m, x, 0.0), axis=axis)
    den = jnp.maximum(jnp.sum(m.astype(x.dtype), axis=axis), 1.0)
    return num / den


def anchor_promote(a: MinutiaeSet, b: MinutiaeSet, p: MatchParams,
                   n_anchors: int = 8) -> jnp.ndarray:
    """Deterministic recall-only anchors for the cascade screen.

    The sampled screen (32 of the full pass's hypotheses) can miss a
    genuine pair whose templates have few minutiae: the chance that no
    sampled (a, b) lands near a true correspondence grows as counts
    shrink, and a missed genuine silently becomes score 0 (an FRR error
    the full protocol would not make). Descriptor quality of the same
    physical minutia is stable across impressions, so pairing the t-th
    highest-weight minutia of A with the t-th of B is very likely a true
    correspondence for at least one t. This scores those ``n_anchors``
    transforms with the screen's inlier gate and returns a promote bit.

    OR-ing anchors into the screen only ever promotes MORE pairs — final
    scores still come from the full pass, so FAR/score distributions are
    unchanged; only screen recall improves. The reference early rejects
    (match.py:81-88) still gate the result."""
    wa = compute_descriptor_weights(a)
    wb = compute_descriptor_weights(b)
    na = jnp.sum(a.valid.astype(jnp.int32))
    nb = jnp.sum(b.valid.astype(jnp.int32))
    std_a = jnp.sqrt(_masked_mean(
        (a.xy - _masked_mean(a.xy, a.valid[:, None], axis=0)) ** 2,
        a.valid[:, None], axis=0))
    std_b = jnp.sqrt(_masked_mean(
        (b.xy - _masked_mean(b.xy, b.valid[:, None], axis=0)) ** 2,
        b.valid[:, None], axis=0))
    reject = ((na < 8) | (nb < 8)
              | (jnp.linalg.norm(std_a - std_b) > 35.0))

    k = a.valid.shape[0]
    hi = lax.Precision.HIGHEST
    iota = jnp.arange(k)

    def top_feats(ms, w):
        _, idx = lax.top_k(jnp.where(ms.valid, w, -1.0), n_anchors)
        oh = (idx[:, None] == iota[None, :]).astype(jnp.float32)  # (T, K)
        feat = jnp.stack([ms.orientation, ms.xy[:, 0], ms.xy[:, 1],
                          ms.valid.astype(jnp.float32)], axis=-1)
        return jnp.dot(oh, feat, preferred_element_type=jnp.float32,
                       precision=hi)                              # (T, 4)

    fa = top_feats(a, wa)
    fb = top_feats(b, wb)
    theta = _angle_diff(fb[:, 0], fa[:, 0])                       # (T,)
    t = fb[:, 1:3] - jax.vmap(
        lambda th, xy: _apply_rigid(xy[None, :], th, jnp.zeros(2))[0]
    )(theta, fa[:, 1:3])
    anchor_ok = (fa[:, 3] > 0.5) & (fb[:, 3] > 0.5)

    def count(th, tt):
        _, inlier, _ = _match_with_transform(a, b, wa, wb, th, tt, p)
        return jnp.sum(inlier.astype(jnp.int32))

    counts = jax.vmap(count)(theta, t)
    return jnp.any(anchor_ok & (counts >= p.min_inliers)) & ~reject


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

    theta_h, t_h, cand_h = sample_hypotheses(a, b, wa, wb, p)
    # Hypotheses evaluate vmapped in fixed-size chunks (lax.map over chunks)
    # so the (chunk, K, K) distance tensors stay bounded even when an outer
    # vmap batches many pairs.
    chunk = min(50, p.ransac_iter)
    n_chunks = -(-p.ransac_iter // chunk)
    pad = n_chunks * chunk - p.ransac_iter

    def _chunked(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[:1], pad, 0)])
        return x.reshape(n_chunks, chunk, *x.shape[1:])

    h_score, h_n, h_theta, h_t = lax.map(
        lambda hc: jax.vmap(
            lambda th, t, cd: _hypothesis(th, t, cd, a, b, wa, wb,
                                          possible, p))(*hc),
        (_chunked(theta_h), _chunked(t_h), _chunked(cand_h)))
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

    hi = lax.Precision.HIGHEST

    # Deterministic early-stop-or-best selection (:158-167), extracted with
    # a one-hot contraction instead of dynamic indexing.
    stop_count = p.stop_inlier_ratio * jnp.minimum(na, nb).astype(jnp.float32)
    reached = h_n.astype(jnp.float32) >= stop_count
    any_reached = jnp.any(reached & (h_score > 0.0))
    first_reached = jnp.argmax(reached & (h_score > 0.0))
    best_h = jnp.where(any_reached, first_reached, jnp.argmax(h_score))
    bh = (jnp.arange(h_score.shape[0]) == best_h).astype(jnp.float32)
    h_feat = jnp.stack([h_score, h_theta, h_t[:, 0], h_t[:, 1]], axis=-1)
    h_at = jnp.dot(bh, h_feat, preferred_element_type=jnp.float32,
                   precision=hi)
    best_score = h_at[0]
    theta0, t0 = h_at[1], h_at[2:4]

    # Kabsch refinement on the best hypothesis's inliers (:174-191), in
    # closed form for the 2x2 case: theta* = atan2(H01 - H10, H00 + H11).
    scores0, inl0, f0 = _match_with_transform(a, b, wa, wb, theta0, t0, p)
    m = inl0[:, None].astype(jnp.float32)
    pa = a.xy
    pb = jnp.dot(f0, b.xy, preferred_element_type=jnp.float32, precision=hi)
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
    scores_r, inl_r, f_r = _match_with_transform(a, b, wa, wb, theta_r, t_r, p)
    n_r = jnp.sum(inl_r.astype(jnp.int32))

    # Spread-consistency reject (:207-215).
    pa_in = a.xy
    pb_in = jnp.dot(f_r, b.xy, preferred_element_type=jnp.float32,
                    precision=hi)
    da = _masked_mean(jnp.linalg.norm(
        pa_in - _masked_mean(pa_in, inl_r[:, None], axis=0), axis=-1), inl_r)
    db = _masked_mean(jnp.linalg.norm(
        pb_in - _masked_mean(pb_in, inl_r[:, None], axis=0), axis=-1), inl_r)
    spread_bad = (n_r >= 8) & (jnp.abs(da - db) > 18.0)

    ok = (best_score > 0.0) & ~spread_bad
    theta_f = jnp.where(best_score > 0.0, theta_r, 0.0)
    t_f = jnp.where(best_score > 0.0, t_r, jnp.zeros(2))

    # Mutual-nearest cross-check (:252-256): for each B, nearest transformed
    # A. mutual[i] = F_ba[NN_B(i), i] = diag(F_ab @ F_ba)[i] — gather-free.
    if p.cross_check:
        ta = _apply_rigid(a.xy, theta_f, t_f)
        d2_ba = _sqdist(b.xy, ta)
        d2_ba = jnp.where(a.valid[None, :], d2_ba, _BIG)
        f_ba = _nn_onehot(d2_ba)                              # (K, K) B -> A
        mutual = jnp.sum(f_r * f_ba.T, axis=-1) > 0.5
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


def screen_promote_batch(a: MinutiaeSet, b: MinutiaeSet, p: MatchParams,
                         use_pallas: bool,
                         anchors: bool = True) -> jnp.ndarray:
    """Cascade-screen promote bits for a (P,)-batch of pairs: the sampled
    prefix screen (finish-free Pallas kernel on TPU, full matcher on CPU)
    OR-ed with the deterministic `anchor_promote` recall anchors. The one
    screen implementation every cascade call site (matching runner,
    pair-list gallery screen, blocked gallery screen) must share, so their
    promotion sets stay identical. ``anchors=False`` is the ablation
    switch for benchmarking the sampled screen alone."""
    if use_pallas:
        from .pallas_match import screen_pairs_batch_pallas
        base = screen_pairs_batch_pallas(a, b, p)
    else:
        r = match_pairs_batch(a, b, p)
        base = (r.final_score > 0.0) | (r.n_inliers > 0)
    if not anchors:
        return base
    extra = jax.vmap(lambda x, y: anchor_promote(x, y, p))(a, b)
    return base | extra

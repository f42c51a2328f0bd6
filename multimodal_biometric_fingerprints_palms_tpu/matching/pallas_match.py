"""Pallas RANSAC hypothesis-scoring kernels (reference: src/matching/match.py).

Default path: the GROUPED kernel (`_grouped_kernel`) — G=64 hypotheses per
grid step in one 2-D (K, K*G) layout, butterfly roll-min reductions over
the interleaved gallery axis, and one-hot MXU extraction of the nearest
neighbor's attributes so all gate/score math runs on (K, G) tiles. 41k
1:1 pairs/s at 300 hypotheses on one v5e chip (the round-1
one-hypothesis-per-`fori`-step kernel, kept below as `_match_kernel` for
independent validation, did 2,649; the XLA matcher ~950).

Exact parity with the XLA path: hypothesis sampling
(`ransac.sample_hypotheses`, vectorized inverse-CDF over pair-independent
uniforms) is shared by both, and the kernel reproduces
`_match_with_transform` with first-argmin tie-breaks matching `jnp.argmin`.
Selection, Kabsch refine and cross-check stay in XLA (`_finish_match`, once
per pair); `screen_pairs_batch_pallas` skips them for the cascade's screen
phase.

See docs/PERF.md for the Mosaic layout rules this file navigates.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..features.minutiae import MinutiaeSet
from .ransac import (MatchParams, compute_descriptor_weights, _angle_diff,
                     _apply_rigid, sample_hypotheses, hypothesis_uniforms,
                     _NN_Q, _NN_SAT)

_BIG = 1e9


def _match_kernel(ax_ref, ay_ref, aori_ref, atype_ref, wa_ref,
                  bx_ref, by_ref, bori_ref, btype_ref, wb_ref,
                  bvalid_ref, avalid_ref,
                  theta_ref, tx_ref, ty_ref, cand_ref, possible_ref,
                  score_ref, count_ref,
                  *, h_iters: int, k: int,
                  dist_thresh: float, orient_thresh: float, use_type: bool,
                  min_inliers: int):
    ax = ax_ref[0, 0]
    ay = ay_ref[0, 0]
    aori = aori_ref[0, 0]
    atype = atype_ref[0, 0]
    wa = wa_ref[0, 0]
    bx = bx_ref[0, 0]
    by = by_ref[0, 0]
    bori = bori_ref[0, 0]
    btype = btype_ref[0, 0]
    wb = wb_ref[0, 0]
    bvalid = bvalid_ref[0, 0]   # f32 0/1 (bool minor-dim broadcasts are
    avalid = avalid_ref[0, 0]   # unsupported in Mosaic)
    possible = possible_ref[0, 0, 0]

    sigma_d2 = 2.0 * (dist_thresh * 0.7) ** 2
    sigma_o2 = 2.0 * (orient_thresh * 0.7) ** 2
    if use_type:
        type_pair_ok = (jnp.abs(atype[:, None] - btype[None, :]) < 0.5
                        ).astype(jnp.float32)
    else:
        type_pair_ok = jnp.ones((k, k), jnp.float32)
    wab = wa[:, None] * wb[None, :]
    valid_pair = avalid[:, None] * bvalid[None, :]
    valid_col = bvalid[None, :] > 0.5
    col_idx = lax.broadcasted_iota(jnp.int32, (k, k), 1)

    # One hypothesis per loop iteration. (A grouped 3-D variant
    # SIGABRTed the remote Mosaic compiler; grouping is a round-2 item.)
    def body(hh, _):
        th = theta_ref[0, 0, hh]
        tx = tx_ref[0, 0, hh]
        ty = ty_ref[0, 0, hh]
        has_cand = cand_ref[0, 0, hh] > 0.5
        c = jnp.cos(th)
        s = jnp.sin(th)
        tax = c * ax - s * ay + tx
        tay = s * ax + c * ay + ty
        dx = tax[:, None] - bx[None, :]
        dy = tay[:, None] - by[None, :]
        d2 = dx * dx + dy * dy
        d2 = jnp.where(valid_col, d2, _BIG)

        # quantized-unique NN selection (ransac._nn_encode semantics)
        d2q = jnp.minimum(jnp.round(d2 * _NN_Q), _NN_SAT)
        enc = d2q * float(k) + col_idx.astype(jnp.float32)
        encmin = jnp.min(enc, axis=1, keepdims=True)
        first = (enc == encmin).astype(jnp.float32)
        d2dec = d2q / _NN_Q

        dang = aori[:, None] + th - bori[None, :]
        dang = jnp.abs(jnp.mod(dang + math.pi, 2.0 * math.pi) - math.pi)
        inlier = (first
                  * (d2dec <= dist_thresh * dist_thresh).astype(jnp.float32)
                  * type_pair_ok
                  * (dang <= orient_thresh).astype(jnp.float32)
                  * valid_pair)

        sc = (jnp.exp(-d2dec / sigma_d2) * jnp.exp(-(dang * dang) / sigma_o2)
              * wab * inlier)
        n = jnp.sum(inlier)
        raw = jnp.sum(sc) / (possible + 1e-6)
        score = jnp.minimum(jnp.exp(0.75 * jnp.log(jnp.maximum(raw, 1e-30))), 1.0)
        ok = jnp.logical_and(n >= min_inliers, has_cand)
        score_ref[0, 0, hh] = jnp.where(ok, score, 0.0)
        count_ref[0, 0, hh] = jnp.where(has_cand, n, 0.0)
        return _

    lax.fori_loop(0, h_iters, body, None)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _grouped_kernel(axT_ref, ayT_ref, aoriT_ref, atypeT_ref, waT_ref,
                    bxE_ref, byE_ref, boriE_ref, btypeE_ref, wbE_ref,
                    sel_ref,
                    theta_ref, tx_ref, ty_ref, cand_ref,
                    possible_ref,
                    score_ref, count_ref,
                    *, k: int, g: int,
                    dist_thresh: float, orient_thresh: float, use_type: bool,
                    min_inliers: int):
    """G hypotheses per grid step in one 2-D (K, K*G) layout.

    Column c = j*G + g interleaves the K gallery minutiae (j, major) with the
    G hypotheses (g, minor). A-side per-pair vectors arrive pre-broadcast as
    (K, G) tiles and are tiled K times along lanes (`pltpu.repeat`, tile
    semantics); B-side vectors arrive pre-interleaved as (1, K*G). The
    group-min over j (stride G) is a log2(K) circular butterfly of
    roll+min steps; the nearest-neighbor attributes (orientation, type,
    weight of B's argmin) are then extracted with one-hot MXU contractions
    against a constant (K*G, G) group selector, so all gate/score math runs
    on small (K, G) tiles. Validity is baked into the coordinates outside
    (invalid slots are displaced ~2e6 px apart, failing the distance gate),
    which removes the validity masks entirely. No 3-D arrays, no gathers,
    everything 8/128-aligned (the 3-D grouped variant SIGABRTed Mosaic in
    round 1; this is the blocked rewrite).
    """
    kg = k * g
    th = theta_ref[0, 0, 0]                    # (G,)
    c = jnp.cos(th)[None, :]
    s = jnp.sin(th)[None, :]
    ax = axT_ref[0]                            # (K, G)
    ay = ayT_ref[0]
    tax = c * ax - s * ay + tx_ref[0, 0, 0][None, :]
    tay = s * ax + c * ay + ty_ref[0, 0, 0][None, :]

    taxE = pltpu.repeat(tax, k, axis=1)        # (K, K*G)
    tayE = pltpu.repeat(tay, k, axis=1)
    dx = taxE - bxE_ref[0]                     # (1, K*G) broadcasts over rows
    dy = tayE - byE_ref[0]
    d2 = dx * dx + dy * dy

    # Quantized-unique NN encoding (ransac._nn_encode semantics): the j term
    # makes the group min unique, so ONE butterfly replaces the former
    # d2min + first-argmin pair (the tie-break butterfly was ~40% of kernel
    # time) and the selection is a single equality.
    col = lax.broadcasted_iota(jnp.int32, (k, kg), 1)
    j_idx = (col // g).astype(jnp.float32)
    d2q = jnp.minimum(jnp.round(d2 * _NN_Q), _NN_SAT)
    enc = d2q * float(k) + j_idx
    log2k = k.bit_length() - 1
    encmin = enc
    for t in range(log2k):
        encmin = jnp.minimum(encmin, pltpu.roll(encmin, shift=g << t, axis=1))
    first = (enc == encmin).astype(jnp.float32)

    # Nearest-neighbor attribute extraction: (K, K*G) @ (K*G, G) one-hot
    # contractions on the MXU. sel[j*G+g', g] = (g' == g).
    sel = sel_ref[:]                           # (K*G, G)
    bori_at = jnp.dot(first * boriE_ref[0], sel,
                      preferred_element_type=jnp.float32)      # (K, G)
    wb_at = jnp.dot(first * wbE_ref[0], sel,
                    preferred_element_type=jnp.float32)
    # arithmetic decode of the selected (quantized) squared distance
    d2_at = jnp.floor(encmin[:, 0:g] / float(k)) / _NN_Q

    # All gate/score math on (K, G) tiles.
    dang = aoriT_ref[0] + th[None, :] - bori_at
    dang = jnp.abs(jnp.mod(dang + math.pi, 2.0 * math.pi) - math.pi)
    if use_type:
        btype_at = jnp.dot(first * btypeE_ref[0], sel,
                           preferred_element_type=jnp.float32)
        type_ok = (jnp.abs(atypeT_ref[0] - btype_at) < 0.5).astype(jnp.float32)
    else:
        type_ok = jnp.ones((k, g), jnp.float32)
    inlier = ((d2_at <= dist_thresh * dist_thresh).astype(jnp.float32)
              * type_ok
              * (dang <= orient_thresh).astype(jnp.float32))

    sigma_d2 = 2.0 * (dist_thresh * 0.7) ** 2
    sigma_o2 = 2.0 * (orient_thresh * 0.7) ** 2
    sc = (jnp.exp(-(d2_at / sigma_d2) - (dang * dang) / sigma_o2)
          * waT_ref[0] * wb_at * inlier)

    sc_g = jnp.sum(sc, axis=0)                 # (G,)
    n_g = jnp.sum(inlier, axis=0)

    has_cand = cand_ref[0, 0, 0] > 0.5
    possible = possible_ref[0, 0, 0]
    raw = sc_g / (possible + 1e-6)
    score = jnp.minimum(jnp.exp(0.75 * jnp.log(jnp.maximum(raw, 1e-30))), 1.0)
    ok = jnp.logical_and(n_g >= min_inliers, has_cand)
    score_ref[0, 0, 0] = jnp.where(ok, score, 0.0)
    count_ref[0, 0, 0] = jnp.where(has_cand, n_g, 0.0)


def hypothesis_scores_pallas_grouped(a: MinutiaeSet, b: MinutiaeSet,
                                     p: MatchParams,
                                     interpret: bool = False,
                                     group: int | None = None):
    """Grouped-hypothesis Pallas scoring: G hypotheses per grid step in one
    (K, K*G) 2-D layout (see `_grouped_kernel`). Same sampling stream and
    outputs as `hypothesis_scores_pallas`."""
    wa = compute_descriptor_weights(a)
    wb = compute_descriptor_weights(b)
    u = hypothesis_uniforms(p)  # pair-independent, generated once
    theta, t, has_cand = jax.vmap(
        lambda x, y, wx, wy: sample_hypotheses(x, y, wx, wy, p, u)
    )(a, b, wa, wb)
    possible = jnp.minimum(jnp.sum(wa, -1), jnp.sum(wb, -1))

    pnum, k = a.valid.shape
    assert k & (k - 1) == 0, f"K={k} must be a power of two"
    h = p.ransac_iter
    g = group or min(64, max(2, _next_pow2(h)))
    assert (k * g) % 128 == 0, (k, g)
    hp = -(-h // g) * g
    n_groups = hp // g

    f32 = jnp.float32

    def _hyp(x):
        # 4-D (P, n_groups, 1, G): the last two block dims then equal the
        # array dims, as Mosaic's block-shape rule requires.
        x = x.astype(f32)
        if hp != h:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (hp - h,), f32)], axis=-1)
        return x.reshape(pnum, n_groups, 1, g)

    theta_in = _hyp(theta)
    tx_in = _hyp(t[..., 0])
    ty_in = _hyp(t[..., 1])
    cand_in = _hyp(has_cand)

    def _aT(x):  # (P, K) -> (P, K, G) lane-broadcast
        return jnp.broadcast_to(x.astype(f32)[:, :, None], (pnum, k, g))

    def _bE(x):  # (P, K) -> (P, 1, K*G) interleaved (col = j*G + g)
        return jnp.repeat(x.astype(f32), g, axis=-1).reshape(pnum, 1, k * g)

    # Validity is baked into the coordinates: invalid slots are displaced
    # ~2e6 px apart so every invalid pairing fails the distance gate.
    ax_v = jnp.where(a.valid, a.xy[..., 0], 1e6)
    ay_v = jnp.where(a.valid, a.xy[..., 1], 1e6)
    bx_v = jnp.where(b.valid, b.xy[..., 0], -1e6)
    by_v = jnp.where(b.valid, b.xy[..., 1], -1e6)

    a_args = [_aT(ax_v), _aT(ay_v), _aT(a.orientation),
              _aT(a.minutia_type), _aT(wa)]
    b_args = [_bE(bx_v), _bE(by_v), _bE(b.orientation),
              _bE(b.minutia_type), _bE(wb)]
    # Constant group selector: sel[j*G+g', g] = (g' == g).
    sel = jnp.tile(jnp.eye(g, dtype=f32), (k, 1))              # (K*G, G)

    kern = functools.partial(
        _grouped_kernel, k=k, g=g,
        dist_thresh=p.dist_thresh, orient_thresh=p.orient_thresh,
        use_type=p.use_type, min_inliers=p.min_inliers)

    aspec = pl.BlockSpec((1, k, g), lambda i, hh: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, k * g), lambda i, hh: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((k * g, g), lambda i, hh: (0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, 1, 1, g), lambda i, hh: (i, hh, 0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, 1, 1), lambda i, hh: (i, 0, 0),
                         memory_space=pltpu.SMEM)

    scores, counts = pl.pallas_call(
        kern,
        grid=(pnum, n_groups),
        in_specs=[aspec] * 5 + [bspec] * 5 + [sspec] + [hspec] * 4 + [pspec],
        out_specs=(hspec, hspec),
        out_shape=(jax.ShapeDtypeStruct((pnum, n_groups, 1, g), f32),
                   jax.ShapeDtypeStruct((pnum, n_groups, 1, g), f32)),
        interpret=interpret,
    )(*a_args, *b_args, sel, theta_in, tx_in, ty_in, cand_in,
      possible.astype(f32).reshape(pnum, 1, 1))
    scores = scores.reshape(pnum, hp)[:, :h]
    counts = counts.reshape(pnum, hp)[:, :h]
    return scores, counts, theta, t


def hypothesis_scores_pallas(a: MinutiaeSet, b: MinutiaeSet,
                             p: MatchParams,
                             interpret: bool = False):
    """Batched (P pairs) hypothesis scoring. a, b: (P, K) MinutiaeSets.
    Returns (scores (P, H), counts (P, H), theta (P, H), t (P, H, 2))."""
    wa = compute_descriptor_weights(a)
    wb = compute_descriptor_weights(b)
    u = hypothesis_uniforms(p)  # pair-independent, generated once
    theta, t, has_cand = jax.vmap(
        lambda x, y, wx, wy: sample_hypotheses(x, y, wx, wy, p, u)
    )(a, b, wa, wb)
    possible = jnp.minimum(jnp.sum(wa, -1), jnp.sum(wb, -1))

    pnum, k = a.valid.shape
    h = p.ransac_iter
    kern = functools.partial(
        _match_kernel, h_iters=h, k=k,
        dist_thresh=p.dist_thresh, orient_thresh=p.orient_thresh,
        use_type=p.use_type, min_inliers=p.min_inliers)

    def vspec():
        # (P, 1, K) layout: Mosaic requires block trailing dims to equal the
        # array's (or be 8/128-aligned); (1, K) blocks over (P, K) violate it
        return pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def sspec(n):
        return pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    f32 = jnp.float32
    args = [
        a.xy[..., 0].astype(f32), a.xy[..., 1].astype(f32),
        a.orientation.astype(f32), a.minutia_type.astype(f32),
        wa.astype(f32),
        b.xy[..., 0].astype(f32), b.xy[..., 1].astype(f32),
        b.orientation.astype(f32), b.minutia_type.astype(f32),
        wb.astype(f32),
        b.valid.astype(f32), a.valid.astype(f32),
    ]
    args = [x.reshape(pnum, 1, k) for x in args]
    scalar_args = [x.reshape(pnum, 1, h) for x in
                   (theta.astype(f32), t[..., 0].astype(f32),
                    t[..., 1].astype(f32), has_cand.astype(f32))]

    scores, counts = pl.pallas_call(
        kern,
        grid=(pnum,),
        in_specs=[vspec() for _ in args]
                 + [sspec(h) for _ in scalar_args]
                 + [sspec(1)],
        out_specs=(sspec(h), sspec(h)),
        out_shape=(jax.ShapeDtypeStruct((pnum, 1, h), f32),
                   jax.ShapeDtypeStruct((pnum, 1, h), f32)),
        interpret=interpret,
    )(*args, *scalar_args, possible.astype(f32).reshape(pnum, 1, 1))
    return scores.reshape(pnum, h), counts.reshape(pnum, h), theta, t


def match_pairs_batch_pallas(a: MinutiaeSet, b: MinutiaeSet,
                             p: MatchParams,
                             interpret: bool = False,
                             grouped: bool = True):
    """Batched 1:1 matching with Pallas hypothesis scoring (the grouped
    kernel above by default; ``grouped=False`` falls back to the round-1
    one-hypothesis-per-step kernel) and the shared XLA finish stage
    (selection, Kabsch refine, cross-check)."""
    from .ransac import _finish_match, _masked_mean

    fn = (hypothesis_scores_pallas_grouped if grouped
          else hypothesis_scores_pallas)
    scores, counts, theta, t = fn(a, b, p, interpret)
    wa = compute_descriptor_weights(a)
    wb = compute_descriptor_weights(b)

    def finish(ai, bi, wai, wbi, hs, hn, hth, ht):
        na = jnp.sum(ai.valid.astype(jnp.int32))
        nb = jnp.sum(bi.valid.astype(jnp.int32))
        possible = jnp.minimum(jnp.sum(wai), jnp.sum(wbi))
        std_a = jnp.sqrt(_masked_mean(
            (ai.xy - _masked_mean(ai.xy, ai.valid[:, None], axis=0)) ** 2,
            ai.valid[:, None], axis=0))
        std_b = jnp.sqrt(_masked_mean(
            (bi.xy - _masked_mean(bi.xy, bi.valid[:, None], axis=0)) ** 2,
            bi.valid[:, None], axis=0))
        reject = ((na < 8) | (nb < 8)
                  | (jnp.linalg.norm(std_a - std_b) > 35.0))
        return _finish_match(ai, bi, wai, wbi, possible, na, nb, reject,
                             hs, hn.astype(jnp.int32), hth, ht, p)

    return jax.vmap(finish)(a, b, wa, wb, scores, counts, theta, t)


def screen_pairs_batch_pallas(a: MinutiaeSet, b: MinutiaeSet,
                              p: MatchParams,
                              interpret: bool = False) -> jnp.ndarray:
    """Cascade screen: (P,) bool — could this pair possibly score > 0 under
    the full pass? Promotes any pair with a positive hypothesis score OR any
    hypothesis reaching the (relaxed) screen min_inliers, minus the hard
    rejects (<8 minutiae, spatial-std mismatch) that the full pass would
    zero anyway. Skips the Kabsch/re-match/cross-check finish entirely —
    the screen phase dominates all-pairs cost.

    Exactness caveat: the superset-of-positive-pairs guarantee is exact only
    at equal hypothesis budget (``p.full_iters in (0, p.ransac_iter)``). In
    production the screen runs fewer hypotheses than the full pass; setting
    ``p.full_iters`` to the full budget makes the screen's hypotheses a true
    prefix of the full pass's, so a miss can only come from a genuine pair
    whose good transforms are sampled exclusively in the hypothesis tail —
    mitigated by the min_inliers-2 relaxation, and bounded empirically by
    the cascade-on/off EER agreement tests."""
    from .ransac import _masked_mean

    scores, counts, _, _ = hypothesis_scores_pallas_grouped(
        a, b, p, interpret)

    na = jnp.sum(a.valid.astype(jnp.int32), axis=-1)
    nb = jnp.sum(b.valid.astype(jnp.int32), axis=-1)

    def _std(ms):
        m = ms.valid[..., None]
        mu = _masked_mean(ms.xy, m, axis=-2)
        return jnp.sqrt(_masked_mean((ms.xy - mu[..., None, :]) ** 2, m,
                                     axis=-2))

    reject = ((na < 8) | (nb < 8)
              | (jnp.linalg.norm(_std(a) - _std(b), axis=-1) > 35.0))
    # Promote on any hypothesis reaching the (already-relaxed) screen
    # min_inliers: random impostors frequently collect 1-2 accidental
    # inliers, so a raw any-inlier rule promotes ~half the gallery.
    hit = (jnp.max(scores, axis=-1) > 0.0) | (
        jnp.max(counts, axis=-1) >= p.min_inliers)
    return hit & ~reject

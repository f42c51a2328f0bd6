"""Pallas RANSAC hypothesis-scoring kernel.

The XLA matcher is VPU/HBM-bound at ~950 pairs/s (300 hypotheses each): each
hypothesis round-trips (K, K) tensors through HBM. Here one grid element =
one pair; the minutiae sets (K=64 rows) and all per-hypothesis work live in
VMEM, and the H hypotheses run in an in-kernel `fori_loop`.

Exact parity with the XLA path (`ransac._hypothesis`): the RNG-dependent
part — the weight-proportional (ia, ib) sample per hypothesis — is computed
OUTSIDE with the same jax.random calls and enters the kernel as precomputed
per-hypothesis scalars (theta, t, has_cand) in SMEM. The kernel reproduces
`_match_with_transform` in matrix form: nearest-neighbor selection becomes a
first-argmin indicator (d2 == rowmin, first occurrence), so no gathers are
needed (Mosaic forbids unaligned dynamic VMEM indexing).

Outputs per pair: (H,) hypothesis scores and inlier counts; selection,
Kabsch refine and cross-check stay in XLA (they run once per pair).
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
from .ransac import MatchParams, compute_descriptor_weights, _angle_diff, _apply_rigid

_BIG = 1e9


def sample_hypotheses(a: MinutiaeSet, b: MinutiaeSet, wa, wb,
                      p: MatchParams):
    """Reproduce ransac.py's per-hypothesis sampling (same keys):
    returns theta (H,), t (H, 2), has_cand (H,) for one pair."""
    key = jax.random.PRNGKey(p.seed)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(p.ransac_iter))

    def one(k):
        ka, kb = jax.random.split(k)
        logits_a = jnp.where(a.valid, jnp.log(jnp.maximum(wa, 1e-12)), -jnp.inf)
        ia = jax.random.categorical(ka, logits_a)
        cand = b.valid & (b.minutia_type == a.minutia_type[ia])
        has_cand = jnp.any(cand)
        logits_b = jnp.where(cand, jnp.log(jnp.maximum(wb, 1e-12)), -jnp.inf)
        ib = jax.random.categorical(kb, jnp.where(has_cand, logits_b,
                                                  jnp.zeros_like(logits_b)))
        theta = _angle_diff(b.orientation[ib], a.orientation[ia])
        t = b.xy[ib] - _apply_rigid(a.xy[ia], theta, jnp.zeros(2))
        return theta, t, has_cand

    theta, t, has_cand = jax.vmap(one)(keys)
    return theta, t, has_cand.astype(jnp.float32)


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
        d2min = jnp.min(d2, axis=1, keepdims=True)

        # first-argmin indicator without gathers: among the row minima,
        # keep the smallest column index (one where+min reduction instead
        # of a log-step prefix scan)
        eq = d2 == d2min
        first_col = jnp.min(jnp.where(eq, col_idx, k), axis=1, keepdims=True)
        first = (eq & (col_idx == first_col)).astype(jnp.float32)

        dang = aori[:, None] + th - bori[None, :]
        dang = jnp.abs(jnp.mod(dang + math.pi, 2.0 * math.pi) - math.pi)
        inlier = (first
                  * (d2 <= dist_thresh * dist_thresh).astype(jnp.float32)
                  * type_pair_ok
                  * (dang <= orient_thresh).astype(jnp.float32)
                  * valid_pair)

        sc = (jnp.exp(-d2 / sigma_d2) * jnp.exp(-(dang * dang) / sigma_o2)
              * wab * inlier)
        n = jnp.sum(inlier)
        raw = jnp.sum(sc) / (possible + 1e-6)
        score = jnp.minimum(jnp.exp(0.75 * jnp.log(jnp.maximum(raw, 1e-30))), 1.0)
        ok = jnp.logical_and(n >= min_inliers, has_cand)
        score_ref[0, 0, hh] = jnp.where(ok, score, 0.0)
        count_ref[0, 0, hh] = jnp.where(has_cand, n, 0.0)
        return _

    lax.fori_loop(0, h_iters, body, None)


def hypothesis_scores_pallas(a: MinutiaeSet, b: MinutiaeSet,
                             p: MatchParams,
                             interpret: bool = False):
    """Batched (P pairs) hypothesis scoring. a, b: (P, K) MinutiaeSets.
    Returns (scores (P, H), counts (P, H), theta (P, H), t (P, H, 2))."""
    wa = compute_descriptor_weights(a)
    wb = compute_descriptor_weights(b)
    theta, t, has_cand = jax.vmap(
        lambda u, v, wu, wv: sample_hypotheses(u, v, wu, wv, p)
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
                             interpret: bool = False):
    """Batched 1:1 matching with Pallas hypothesis scoring (the VMEM kernel
    above) and the shared XLA finish stage (selection, Kabsch refine,
    cross-check). ~1.5x the all-XLA `match_pairs_batch` on TPU."""
    from .ransac import _finish_match, _masked_mean

    scores, counts, theta, t = hypothesis_scores_pallas(a, b, p, interpret)
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

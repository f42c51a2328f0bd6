"""Minutiae quality enrichment + adaptive NMS + orientation dedup.

TPU-native rebuild of src/features/post_processing.py:10-137. Per-minutia
scoring vectorizes over the fixed K slots; the two sequential suppression
passes (quality-ordered adaptive NMS :10-32, pairwise orientation dedup
:37-64) are bounded `lax.fori_loop`s over K=64 — trivially cheap on device,
and they reproduce the reference's exact visit-order semantics (including
its last-writer-wins NMS quirk, where a later lower-quality point can
suppress an earlier kept one).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.filters import blur_mean
from ..ops.orientation import compute_orientation_field
from .minutiae import MinutiaeSet


def _enrich_one(ms: MinutiaeSet, skel: jnp.ndarray, density: jnp.ndarray,
                orient: jnp.ndarray, coherence: jnp.ndarray,
                quality_threshold: float, coherence_threshold: float,
                margin: int, patch_radius: int) -> MinutiaeSet:
    """Quality scoring for one image (post_processing.py:96-128)."""
    h, w = skel.shape
    x = ms.xy[:, 0].astype(jnp.int32)
    y = ms.xy[:, 1].astype(jnp.int32)

    in_margin = (x >= margin) & (x < w - margin) & (y >= margin) & (y < h - margin)

    xc = jnp.clip(x, 0, w - 1)
    yc = jnp.clip(y, 0, h - 1)
    local_coh = coherence[yc, xc]
    local_den = density[yc, xc]
    gates = (local_den >= quality_threshold) & (local_coh >= coherence_threshold)

    ang = orient[yc, xc]

    # Angular stability: std over the (2r x 2r) orientation patch
    # (post_processing.py:109-111). Computed for every pixel at once with
    # two separable box filters (E[x^2] - E[x]^2), then sampled at the
    # minutiae — replaces K dynamic_slices per image (slow gathers on TPU).
    # The even-size SAME conv covers rows [y-r, y+r), matching the
    # reference's patch slice; margin >= patch_radius keeps gated minutiae's
    # patches interior, where the two computations are identical.
    pr = patch_radius
    mean = blur_mean(orient, 2 * pr)
    sqmean = blur_mean(orient * orient, 2 * pr)
    var = jnp.maximum(sqmean - mean * mean, 0.0)
    stds = jnp.sqrt(var)[yc, xc]
    angular_stability = jnp.exp(-3.0 * stds)

    center_bonus = 1.0 - 0.5 * (
        (jnp.abs(x - w / 2.0) / (w / 2.0)) ** 2
        + (jnp.abs(y - h / 2.0) / (h / 2.0)) ** 2
    )
    local_intensity = skel[yc, xc].astype(jnp.float32)

    score = (0.5 * local_coh + 0.25 * local_den
             + 0.1 * angular_stability + 0.1 * local_intensity) * center_bonus

    valid = ms.valid & in_margin & gates
    return ms._replace(
        orientation=ang,
        quality=jnp.where(valid, score, 0.0),
        coherence=local_coh,
        angular_stability=angular_stability,
        valid=valid,
    )


def _nms_adaptive(ms: MinutiaeSet, density: jnp.ndarray, base_dist: float,
                  h: int, w: int) -> jnp.ndarray:
    """Quality-ordered adaptive NMS (post_processing.py:10-32). Returns the
    surviving-validity mask. Faithful last-writer-wins semantics: visiting a
    point marks it kept and suppresses everything inside its adaptive ball.
    """
    k = ms.valid.shape[-1]
    x = jnp.clip(ms.xy[:, 0].astype(jnp.int32), 0, w - 1)
    y = jnp.clip(ms.xy[:, 1].astype(jnp.int32), 0, h - 1)
    local_den = density[y, x]
    radius = base_dist / (0.5 + local_den)

    d2 = jnp.sum((ms.xy[:, None, :] - ms.xy[None, :, :]) ** 2, axis=-1)
    eye = jnp.eye(k, dtype=bool)

    # Visit in quality-descending order; invalid entries (quality 0,
    # sorted last among ties) are skipped via the validity gate.
    order = jnp.argsort(-ms.quality)

    def body(t, keep):
        i = order[t]
        ball = (d2[i] <= radius[i] ** 2) & ~eye[i] & ms.valid
        keep_if_visited = jnp.where(ball, False, keep).at[i].set(True)
        return jnp.where(ms.valid[i], keep_if_visited, keep)

    keep = lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    return keep & ms.valid


def _remove_redundant_oriented(ms: MinutiaeSet, keep: jnp.ndarray,
                               density: jnp.ndarray, base_radius: float,
                               angle_thresh: float, h: int, w: int) -> jnp.ndarray:
    """Pairwise orientation dedup (post_processing.py:37-64): visit i in
    extraction order; within i's adaptive radius, near-parallel pairs drop
    the lower-quality member. Sequential nested loop over K^2 (K=64)."""
    k = ms.valid.shape[-1]
    x = jnp.clip(ms.xy[:, 0].astype(jnp.int32), 0, w - 1)
    y = jnp.clip(ms.xy[:, 1].astype(jnp.int32), 0, h - 1)
    local_den = density[y, x]
    radius = base_radius * (1.0 + (1.0 - ms.quality)) / (0.5 + local_den)

    d2 = jnp.sum((ms.xy[:, None, :] - ms.xy[None, :, :]) ** 2, axis=-1)
    dang = ms.orientation[:, None] - ms.orientation[None, :]
    ang_close = jnp.abs(jnp.arctan2(jnp.sin(dang), jnp.cos(dang))) < angle_thresh

    # One pass per i with the inner j loop vectorized. This is EXACTLY the
    # reference's nested-loop semantics: within i's pass, a j can only be
    # removed by the (i, j) comparison itself (so same-pass j removals can't
    # gate later j's), and the reference never re-checks i mid-pass — both
    # facts make the j loop order-free.
    cols = jnp.arange(k)

    def body(i, removed):
        cond = (
            (cols > i)
            & keep[i] & keep
            & ~removed[i] & ~removed
            & (d2[i] <= radius[i] ** 2)
            & ang_close[i]
        )
        i_loses = ms.quality[i] < ms.quality          # (k,) per-j victim choice
        remove_j = cond & ~i_loses
        remove_i = jnp.any(cond & i_loses)
        removed = removed | remove_j
        return removed.at[i].set(removed[i] | remove_i)

    removed = lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    return keep & ~removed


def _sort_and_cap(ms: MinutiaeSet, max_minutiae: int) -> MinutiaeSet:
    """Final quality-descending sort + cap (post_processing.py:135)."""
    k = ms.valid.shape[-1]
    sort_key = jnp.where(ms.valid, -ms.quality, jnp.inf)
    order = jnp.argsort(sort_key)
    rank = jnp.arange(k, dtype=jnp.int32)
    new_valid = ms.valid[order] & (rank < max_minutiae)
    return MinutiaeSet(
        xy=ms.xy[order],
        minutia_type=ms.minutia_type[order],
        orientation=ms.orientation[order],
        quality=jnp.where(new_valid, ms.quality[order], 0.0),
        coherence=ms.coherence[order],
        angular_stability=ms.angular_stability[order],
        valid=new_valid,
    )


def _postprocess_one(ms: MinutiaeSet, skel: jnp.ndarray,
                     quality_window: int, quality_threshold: float,
                     coherence_threshold: float, min_distance: float,
                     margin: int, max_minutiae: int, patch_radius: int,
                     dedup_radius: float, dedup_angle: float) -> MinutiaeSet:
    h, w = skel.shape
    sk = skel.astype(jnp.float32)

    density = blur_mean(sk, quality_window)
    density = density / (jnp.max(density) + 1e-6)

    # Orientation/coherence re-estimated on the skeleton image itself, as the
    # reference does (process_image passes skel as gray,
    # extract_features.py:92 → post_processing.py:93).
    field = compute_orientation_field(sk)
    coherence = jnp.clip(field.reliability, 0.0, 1.0)

    ms = _enrich_one(ms, sk, density, field.orientation, coherence,
                     quality_threshold, coherence_threshold, margin, patch_radius)
    keep = _nms_adaptive(ms, density, min_distance, h, w)
    keep = _remove_redundant_oriented(ms, keep, density, dedup_radius,
                                      dedup_angle, h, w)
    ms = ms._replace(valid=keep, quality=jnp.where(keep, ms.quality, 0.0))
    return _sort_and_cap(ms, max_minutiae)


def postprocess_minutiae(ms: MinutiaeSet, skel: jnp.ndarray,
                         quality_window: int = 25,
                         quality_threshold: float = 0.15,
                         coherence_threshold: float = 0.2,
                         min_distance: float = 8.0,
                         margin: int = 30,
                         max_minutiae: int = 60,
                         patch_radius: int = 15,
                         dedup_radius: float = 20.0,
                         dedup_angle: float = math.radians(30.0)) -> MinutiaeSet:
    """Quality scoring + NMS + dedup over (..., H, W) skeletons with
    matching (..., K) minutiae sets. Defaults are the reference's
    (post_processing.py:76-83)."""
    fn = partial(_postprocess_one,
                 quality_window=quality_window,
                 quality_threshold=quality_threshold,
                 coherence_threshold=coherence_threshold,
                 min_distance=min_distance, margin=margin,
                 max_minutiae=max_minutiae, patch_radius=patch_radius,
                 dedup_radius=dedup_radius, dedup_angle=dedup_angle)
    lead = skel.shape[:-2]
    if not lead:
        return fn(ms, skel)
    flat_ms = jax.tree.map(
        lambda a: a.reshape((-1,) + a.shape[len(lead):]), ms)
    flat_sk = skel.reshape((-1,) + skel.shape[-2:])
    out = jax.vmap(fn)(flat_ms, flat_sk)
    return jax.tree.map(lambda a: a.reshape(lead + a.shape[1:]), out)

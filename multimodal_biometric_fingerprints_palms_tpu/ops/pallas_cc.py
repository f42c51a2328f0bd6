"""Pallas connected-components kernel.

The XLA CC (ops/components.py) iterates segmented-scan sweeps through HBM:
~1.5 ms/sweep on (32, 320, 256) and ridge masks need 15-50 sweeps, so the
five CC calls dominate the whole enhancement pipeline. Here one grid element
= one image, labels live in VMEM for the entire relaxation, and each
doubling step is a `pltpu.roll` + select — no HBM traffic between steps.

Same algorithm as the XLA fallback: per sweep, segmented min-scans along
rows and columns (log-doubling with (value, blocked) carries) plus a
3x3/cross min stencil; iterate to fixpoint with a bounded `lax.while_loop`.
Labels are linear indices stored as f32 (exact below 2^24; PolyU-sized
images are 81920).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float(2 ** 30)  # python scalar: jnp constants get captured by pallas


def _shift_no_wrap(x: jnp.ndarray, shift: int, axis: int, fill) -> jnp.ndarray:
    """out[i] = x[i - shift] (either sign) with ``fill`` shifted in
    (circular roll + edge mask). A concat+slice form hit Mosaic's
    "offset mismatch on non-concat dimension" for sublane shifts."""
    size = x.shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if shift >= 0:
        rolled = pltpu.roll(x, shift, axis)
        return jnp.where(idx < shift, fill, rolled)
    rolled = pltpu.roll(x, size + shift, axis)
    return jnp.where(idx >= size + shift, fill, rolled)


def _seg_min_doubling(v, blocked, axis: int, length: int, reverse: bool,
                      max_shift: int | None = None):
    """Segmented prefix (or suffix, when reverse) min via log-doubling.
    Reverse scans use negative shifts directly — Mosaic has no `rev`.
    ``max_shift`` truncates the doubling: ridge-mask runs are short, so
    full-width scans waste steps — the while_loop fixpoint is identical,
    long runs just take extra sweeps."""
    sgn = -1 if reverse else 1
    if max_shift is not None:
        length = min(length, max_shift + 1)
    shift = 1
    while shift < length:
        v_s = _shift_no_wrap(v, sgn * shift, axis, _INF)
        b_s = _shift_no_wrap(blocked, sgn * shift, axis, 1.0)
        v = jnp.where(blocked > 0.5, v, jnp.minimum(v, v_s))
        blocked = jnp.maximum(blocked, b_s)
        shift *= 2
    return v


# --- int32 segment-keyed relaxation -----------------------------------------
#
# The (value, blocked)-carry doubling above costs ~10 VPU ops per step. The
# key encoding below folds the segment structure into the VALUE so each
# doubling step is a plain roll+fill+min (3 ops): with labels
# lin = r*w + c < 2^17 (PolyU-sized frames) and seg = exclusive prefix count
# of background cells along the scan axis, the int32 key
#
#   key_fwd = label - seg * 2^17
#
# is strictly decreasing across segment starts (later segments sit whole
# 2^17-blocks lower), so an UNsegmented prefix-min at a foreground cell
# always lands inside the cell's own segment; adding seg*2^17 back decodes
# the segment-min. Suffix scans flip the sign (key_bwd = label + seg*2^17).
# Background cells carry label 2^28, which dominates every foreground key
# regardless of segment. All quantities stay below 2^28 + 2^26 — exact in
# int32 (and the seg bases are reused across every sweep of a relaxation).

_SEG_SCALE = 1 << 17
_INF_I = 1 << 28


def _shift_no_wrap_i(x, shift: int, axis: int, fill: int):
    size = x.shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if shift >= 0:
        rolled = pltpu.roll(x, shift, axis)
        return jnp.where(idx < shift, fill, rolled)
    rolled = pltpu.roll(x, size + shift, axis)
    return jnp.where(idx >= size + shift, fill, rolled)


def _prefix_count_excl(m: jnp.ndarray, axis: int, length: int) -> jnp.ndarray:
    """Exclusive prefix sum of an int32 0/1 array along axis (doubling)."""
    acc = _shift_no_wrap_i(m, 1, axis, 0)   # shift once: exclusive
    shift = 1
    while shift < length:
        acc = acc + _shift_no_wrap_i(acc, shift, axis, 0)
        shift *= 2
    return acc


def _run_ids(fg, h: int, w: int):
    """Per-pixel horizontal-run index: id 0..n_runs-1 in row-major order,
    constant on each contiguous fg run. Pure shift/add doubling scans.

    Run ids compact the label space for the size-histogram phases: a
    contiguous fg run is connected (both 4- and 8-connectivity), so the
    component-min RUN id is as injective a component key as the
    component-min pixel index, but lives in [0, h*w/2) with real masks
    having only a few thousand runs — the one-hot histogram contractions
    then touch ~20x fewer count-table rows."""
    fgi = fg.astype(jnp.int32)
    head = fgi * (1 - _shift_no_wrap_i(fgi, 1, 1, 0))
    # inclusive head count along each row
    p_inc = head
    shift = 1
    while shift < w:
        p_inc = p_inc + _shift_no_wrap_i(p_inc, shift, 1, 0)
        shift *= 2
    # row totals, broadcast to every pixel of the row (backward max of a
    # row-monotone array = its last value)
    tot = p_inc
    shift = 1
    while shift < w:
        tot = jnp.maximum(tot, _shift_no_wrap_i(tot, -shift, 1, 0))
        shift *= 2
    # exclusive cumsum of row totals down the rows
    s = _shift_no_wrap_i(tot, 1, 0, 0)
    shift = 1
    while shift < h:
        s = s + _shift_no_wrap_i(s, shift, 0, 0)
        shift *= 2
    return s + p_inc - 1          # valid at fg pixels


# Run-id count tables decompose id = hi*128 + lo; groups of 16 table rows
# (= 2048 ids) are accumulated with one MXU contraction per 8-row image
# chunk, and only the groups a chunk can reach (ids are row-major, so a
# chunk's max label bounds its group count) are visited — real ridge masks
# have ~1-4k runs, i.e. ONE group per chunk.
_RLE_LO = 128
_RLE_GROUP = 16


def _rle_nhi(h: int, w: int) -> int:
    nhi = -(-(h * w // 2 + 2) // _RLE_LO)
    return -(-nhi // _RLE_GROUP) * _RLE_GROUP


# Rows per table chunk: bigger chunks mean fewer sequential fori_loop
# iterations (each with VMEM read-modify-write dependencies that stall the
# pipeline); 32 rows keeps the per-chunk lo one-hot at (LO, 32w) bf16
# (~2 MB at w=256) comfortably in VMEM.
import os as _os
_RLE_ROWS = int(_os.environ.get("MBFP_RLE_ROWS", "32"))


def _rle_onehots(chunk, w: int, lo_iota, rows: int):
    """(1, rows*w) hi values and (LO, rows*w) lo one-hot for a label chunk,
    flattened along the contracted lane axis.

    Rows are extracted with a sublane-masked sum rather than `chunk[k:k+1]`:
    sliced rows keep their source sublane offset and Mosaic rejects lane
    concatenation of vectors with mismatched sublane offsets.

    Only the (1, w) label rows are concatenated (32 KB of lane copies);
    the (LO, rows*w) one-hot is then built IN PLACE by one broadcast
    compare against a lane iota. An earlier version concatenated 32
    per-row (LO, w) one-hot pieces instead — ~2 MB of lane-offset copies
    per chunk per phase, which dominated the fused split kernels."""
    sub_iota = lax.broadcasted_iota(jnp.int32, chunk.shape, 0)
    vals = []
    for k in range(rows):
        vals.append(jnp.sum(jnp.where(sub_iota == k, chunk, 0.0), axis=0,
                            keepdims=True))
    flat = jnp.concatenate(vals, axis=1)          # (1, rows*w) labels
    hi = jnp.floor(flat / float(_RLE_LO))
    lo = flat - hi * float(_RLE_LO)
    # lo_iota is an (LO, 1) COLUMN — the (LO, rows*w) compare broadcasts
    # it along lanes in registers instead of re-reading a materialized
    # (LO, rows*w) f32 iota plane (4 MB/chunk of VMEM traffic)
    lo_oh = (lo_iota == lo).astype(jnp.bfloat16)  # (LO, rows*w)
    return hi, lo_oh


def _chunk_rows(h: int) -> int:
    r = _RLE_ROWS
    while h % r != 0:
        r //= 2
    return r


def _runid_hist(label_f, fg, h: int, w: int, count_ref, lab_ref):
    """Per-label pixel counts for run-id labels. count_ref (nhi, _RLE_LO)
    f32. Background maps to hi=-2 (label -256), matching no group — a chunk
    with no foreground gets gmax = 0 and skips the one-hot extraction and
    the matmul entirely (the empty-relax fast paths rely on this)."""
    lab_ref[:] = jnp.where(fg, label_f, -256.0)
    count_ref[:] = jnp.zeros_like(count_ref)
    rows = _chunk_rows(h)
    lo_iota = lax.broadcasted_iota(jnp.int32, (_RLE_LO, 1), 0).astype(
        jnp.float32)
    hi_iota = lax.broadcasted_iota(
        jnp.int32, (_RLE_GROUP, 1), 0).astype(jnp.float32)

    def chunk_body(c, _):
        chunk = lab_ref[pl.ds(c * rows, rows), :]
        gmax = (jnp.max(chunk).astype(jnp.int32)
                // (_RLE_GROUP * _RLE_LO)) + 1

        def group_body(g, _):
            # extraction inside the group loop: recomputed when gmax > 1
            # (rare — in-pipeline remnant chunks are measured gmax <= 1
            # almost always) but skipped entirely for foreground-free
            # chunks (gmax == 0), which dominate remnant masks. Both an
            # ungated hoist (1128 vs 1140 img/s) and a pl.when(gmax > 0)-
            # gated hoist (1124) measured SLOWER than this in-loop form.
            hi_cat, lo_oh = _rle_onehots(chunk, w, lo_iota, rows)
            oh_hi = (hi_iota + jnp.float32(g * _RLE_GROUP)
                     == hi_cat).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                oh_hi, lo_oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            count_ref[pl.ds(g * _RLE_GROUP, _RLE_GROUP), :] = (
                count_ref[pl.ds(g * _RLE_GROUP, _RLE_GROUP), :] + acc)
            return _

        lax.fori_loop(0, gmax, group_body, None)

    # Unrolled chunk walk (static trip count): fori_loop serializes Mosaic's
    # scheduling across chunks, and the hist's count_ref read-modify-write
    # made that a real dependency chain; unrolled, chunk c+1's one-hot
    # extraction overlaps chunk c's matmul+accumulate.
    for c in range(h // rows):
        chunk_body(c, None)


def _runid_lookup(h: int, w: int, count_ref, lab_ref, sizes_ref):
    """Per-pixel size[p] = count[hi_p, lo_p] for run-id labels, with the
    same dynamic group bound. Background pixels get 0 (foreground-free
    chunks skip straight to the zero write)."""
    rows = _chunk_rows(h)
    lo_iota = lax.broadcasted_iota(jnp.int32, (_RLE_LO, 1), 0).astype(
        jnp.float32)
    hi_iota = lax.broadcasted_iota(
        jnp.int32, (_RLE_GROUP, 1), 0).astype(jnp.float32)

    def chunk_body(c, _):
        chunk = lab_ref[pl.ds(c * rows, rows), :]
        gmax = (jnp.max(chunk).astype(jnp.int32)
                // (_RLE_GROUP * _RLE_LO)) + 1

        def group_body(g, acc):
            hi_cat, lo_oh = _rle_onehots(chunk, w, lo_iota, rows)
            oh_hi = (hi_iota + jnp.float32(g * _RLE_GROUP)
                     == hi_cat).astype(jnp.float32)
            tmp = jax.lax.dot_general(
                count_ref[pl.ds(g * _RLE_GROUP, _RLE_GROUP), :],
                lo_oh.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (GROUP, rows*w)
            return acc + jnp.sum(oh_hi * tmp, axis=0, keepdims=True)

        flat = lax.fori_loop(0, gmax, group_body,
                             jnp.zeros((1, rows * w), jnp.float32))
        sizes_ref[pl.ds(c * rows, rows), :] = jnp.concatenate(
            [flat[:, k * w:(k + 1) * w] for k in range(rows)], axis=0)

    # Unrolled (see _runid_hist): lookup chunks are fully independent —
    # each reads the complete count table and writes its own sizes rows.
    for c in range(h // rows):
        chunk_body(c, None)
    return sizes_ref[:]


def _sliding_sum(x, T: int, axis: int):
    """Width-T sliding sum along ``axis`` anchored at the trailing edge
    (out[i] = sum x[i-T+1 .. i], zero-filled past the array edge), via
    power-of-two shift-add doubling + binary recomposition of T."""
    pows = [x]
    width = 1
    while width * 2 <= T:
        pows.append(pows[-1] + _shift_no_wrap(pows[-1], width, axis, 0.0))
        width *= 2
    acc = None
    offset = 0
    for k in range(len(pows) - 1, -1, -1):
        if T & (1 << k):
            part = pows[k]
            if acc is None:
                acc = part
            else:
                acc = acc + _shift_no_wrap(part, offset, axis, 0.0)
            offset += 1 << k
    return acc


def _all_components_below(mask, h: int, w: int, thresh: int):
    """Scalar bool: every connected component of ``mask`` has size
    < ``thresh`` — WITHOUT labeling. Exact sufficient+necessary-free test
    used as a fast path (False only means \"must label to decide\"):

    max over all thresh x thresh windows of mask mass < thresh
        ==> every component has size < thresh.

    Proof: a component with >= thresh pixels contains a connected subset
    of exactly thresh pixels (BFS prefix); its graph diameter is
    <= thresh-1, so its bounding box side is <= thresh (both 4- and
    8-connectivity), and the window anchored at the bbox bottom-right
    corner contains all thresh pixels. Windows are anchored sliding sums
    with zero fill, so every in-image bbox has its anchored window in
    range. Much sharper than the total-mass test (which needs the WHOLE
    remnant below thresh): scattered specks pass as long as no thresh x
    thresh neighborhood accumulates thresh pixels. Cost ~20 VPU
    shift-adds; requires thresh <= min(h, w) (callers fall back to the
    total test otherwise)."""
    m = mask.astype(jnp.float32)
    if thresh > min(h, w):
        return jnp.sum(m) < float(thresh)
    s = _sliding_sum(_sliding_sum(m, thresh, 1), thresh, 0)
    return jnp.max(s) < float(thresh)


def _relax_and_sizes(fg, h: int, w: int, connectivity: int, max_iters: int,
                     count_ref, lab_ref, sizes_ref, remnant: bool = False):
    """Run-id labeling + per-pixel component-size map (the filter-kernel
    workhorse).

    ``remnant=True`` marks masks that are split-kernel leftovers (specks /
    genuine small holes after the canonical components were resolved
    bit-packed): their runs are short, so the doubling scans truncate at
    ``MBFP_REMNANT_MAXSHIFT`` (fixpoint-identical for ANY mask — a longer
    run just takes extra convergence sweeps, see _seg_min_doubling)."""
    import os as _os
    _ab = _os.environ.get("MBFP_ABLATE_CC", "")
    max_shift = None
    if remnant:
        ms = int(_os.environ.get("MBFP_REMNANT_MAXSHIFT", "0"))
        max_shift = ms if ms > 0 else None
    ids = _run_ids(fg, h, w)
    if _ab == "norelax":      # ceiling probe: skip the relax (WRONG results)
        label = ids
    else:
        label = _label_relax(fg, h, w, connectivity, max_iters, label0=ids,
                             max_shift=max_shift)
    if _ab in ("notable", "norelax"):   # ceiling probe: skip hist+lookup
        # NOTE: with "notable" the relax result is DEAD (nothing consumes
        # `label`) and Mosaic DCEs it — this probe removes relax+hist+lookup
        sizes_ref[:] = jnp.sum(fg.astype(jnp.float32)) + jnp.zeros_like(
            sizes_ref)
        return label, sizes_ref[:]
    if _ab == "nohist":   # ceiling probe: keep the relax LIVE, skip tables
        sizes_ref[:] = label + jnp.zeros_like(sizes_ref)
        return label, sizes_ref[:]
    _runid_hist(label, fg, h, w, count_ref, lab_ref)
    if _ab == "nolookup":               # ceiling probe: skip lookup only
        sizes_ref[:] = jnp.sum(fg.astype(jnp.float32)) + jnp.zeros_like(
            sizes_ref)
        return label, sizes_ref[:]
    sizes = _runid_lookup(h, w, count_ref, lab_ref, sizes_ref)
    return label, sizes


def _cc_kernel(mask_ref, label_ref, *, h: int, w: int, connectivity: int,
               max_iters: int):
    fg = mask_ref[0] > 0.5                                   # (h, w) bool
    v = _label_relax(fg, h, w, connectivity, max_iters)
    label_ref[0] = v.astype(jnp.int32)


def connected_components_pallas(mask: jnp.ndarray, connectivity: int = 2,
                                max_iters: int = 512,
                                interpret: bool = False) -> jnp.ndarray:
    """Pallas CC over (..., H, W) boolean masks; same label convention as
    ops.components.connected_components (component-min linear index; 2^30
    background)."""
    lead = mask.shape[:-2]
    h, w = mask.shape[-2:]
    b = 1
    for d in lead:
        b *= d
    flat = mask.reshape(b, h, w).astype(jnp.float32)
    kern = functools.partial(_cc_kernel, h=h, w=w, connectivity=connectivity,
                             max_iters=max_iters)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(flat)
    return out.reshape(mask.shape)


# ---------------------------------------------------------------------------
# Fused CC + component-size filtering.
#
# The XLA wrappers (components.remove_small_objects / _holes /
# largest_component) run the CC kernel, then materialize two-level one-hot
# tensors in HBM for `component_sizes` and `_gather_by_label` — ~25-45 ms
# per call at batch 128. Here the size histogram and the per-pixel
# size-lookup run inside the kernel, row by row, as (nhi, 256) @ (256, 256)
# MXU contractions on VMEM data: count[k, l] = #pixels with label hi == k,
# lo == l, accumulated across rows; the lookup contracts the thresholded
# count table back against the same per-row one-hots.
# ---------------------------------------------------------------------------


def _label_relax(fg, h: int, w: int, connectivity: int, max_iters: int,
                 max_shift: int | None = None, label0=None,
                 sweeps_per_check: int = 2):
    """CC relaxation on values with int32 segment-keyed scans (see the key
    encoding note above): per sweep, a forward+backward keyed min-scan along
    each axis plus a 3x3/cross min stencil, iterated to fixpoint. Returns
    f32 labels (component-min linear index; _INF bg) — exact in f32, the
    downstream histogram phases consume f32.

    ``label0`` overrides the initial int32 labels (values must stay in
    [0, 2^17) at fg cells); geodesic reachability (binary reconstruction)
    is the special case label0 = 0 at markers."""
    assert h * w < _SEG_SCALE, (h, w)
    fg = jnp.asarray(fg, bool)
    bg_i = (~fg).astype(jnp.int32)

    if label0 is None:
        rows = lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = lax.broadcasted_iota(jnp.int32, (h, w), 1)
        label0 = rows * w + cols
    label0 = jnp.where(fg, label0, _INF_I)

    # Per-axis segment bases, computed once and reused by every sweep.
    base_w = _prefix_count_excl(bg_i, 1, w) * _SEG_SCALE
    base_h = _prefix_count_excl(bg_i, 0, h) * _SEG_SCALE

    def dir_pass(v, base, axis, length, forward: bool):
        """One keyed directional min-scan; sequential composition (each
        direction sees the previous one's labels, like the original
        4-scan sweep) propagates further per sweep than paired scans."""
        if max_shift is not None:
            length = min(length, max_shift + 1)
        sgn = 1 if forward else -1
        key = (v - base) if forward else (v + base)
        shift = 1
        while shift < length:
            key = jnp.minimum(key,
                              _shift_no_wrap_i(key, sgn * shift, axis, _INF_I))
            shift *= 2
        out = (key + base) if forward else (key - base)
        return jnp.where(fg, out, _INF_I)

    # After the four keyed axis scans the (0,+-1)/(+-1,0) offsets are
    # redundant: an edge-adjacent fg neighbor shares a row/column run the
    # scans already min-reduce over, so they cannot lower the post-scan
    # value. Connectivity-1 therefore needs no stencil at all (the sweep is
    # just the four scans) and connectivity-2 only the four diagonal hops —
    # ~1/3 fewer VPU ops per sweep with an unchanged fixpoint (the
    # while_loop still runs to convergence).
    if connectivity == 2:
        offs = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    else:
        offs = []

    def stencil(v):
        if not offs:
            return v
        best = v
        for dy, dx in offs:
            s = _shift_no_wrap_i(_shift_no_wrap_i(v, dy, 0, _INF_I),
                                 dx, 1, _INF_I)
            best = jnp.minimum(best, s)
        return jnp.where(fg, best, _INF_I)

    def sweep(v):
        v = dir_pass(v, base_w, 1, w, True)
        v = dir_pass(v, base_w, 1, w, False)
        v = dir_pass(v, base_h, 0, h, True)
        v = dir_pass(v, base_h, 0, h, False)
        return stencil(v)

    # Several sweeps per loop iteration: the convergence check is a full
    # vector->scalar reduce that stalls the pipeline, so checking every
    # sweep costs more than the (cheap) extra sweeps it saves.
    def cond(state):
        v, prev, i = state
        return jnp.logical_and(i < max_iters, jnp.any(v != prev))

    def body(state):
        v, _, i = state
        out = v
        for _k in range(sweeps_per_check):
            out = sweep(out)
        return out, v, i + sweeps_per_check

    first = sweep(label0)
    v, _, _ = lax.while_loop(cond, body, (first, label0, jnp.int32(1)))
    return jnp.where(fg, v.astype(jnp.float32), _INF)


def _cc_filter_kernel(mask_ref, out_ref, count_ref, lab_ref, sizes_ref, *,
                      h: int, w: int,
                      connectivity: int, max_iters: int, mode: str,
                      min_size: int, max_size: int):
    fg = mask_ref[0] > 0.5

    if mode == "clean":
        # remove_small_objects(min_size) then remove_small_holes(max_size),
        # both relaxations VMEM-resident, no HBM round trip between them.
        _, sizes = _relax_and_sizes(fg, h, w, connectivity, max_iters,
                                    count_ref, lab_ref, sizes_ref)
        kept = jnp.logical_and(fg, sizes >= float(min_size))
        inv = jnp.logical_not(kept)
        _, sizes2 = _relax_and_sizes(inv, h, w, connectivity, max_iters,
                                     count_ref, lab_ref, sizes_ref)
        fill = jnp.logical_and(inv, sizes2 < float(max_size))
        out = jnp.logical_or(kept, fill)
    elif mode == "remove_small":
        _, sizes = _relax_and_sizes(fg, h, w, connectivity, max_iters,
                                    count_ref, lab_ref, sizes_ref)
        out = jnp.logical_and(fg, sizes >= float(min_size))
    elif mode == "fill_holes":
        inv = jnp.logical_not(fg)
        _, sizes = _relax_and_sizes(inv, h, w, connectivity, max_iters,
                                    count_ref, lab_ref, sizes_ref)
        fill = jnp.logical_and(inv, sizes < float(max_size))
        out = jnp.logical_or(fg, fill)
    elif mode == "largest":
        ids = _run_ids(fg, h, w)
        label = _label_relax(fg, h, w, connectivity, max_iters, label0=ids)
        # phase 1 only: the winner is found on the count table, and
        # membership is a label compare — no per-pixel size lookup needed
        _runid_hist(label, fg, h, w, count_ref, lab_ref)
        count = count_ref[:]
        nhi = count.shape[0]
        hi_iota = lax.broadcasted_iota(jnp.int32, (nhi, _RLE_LO), 0)
        lo_iota = lax.broadcasted_iota(jnp.int32, (nhi, _RLE_LO), 1)
        m = jnp.max(count)
        idx = (hi_iota * _RLE_LO + lo_iota).astype(jnp.float32)
        best = jnp.min(jnp.where(count == m, idx, float(2 ** 30)))
        out = jnp.logical_and(fg, label == best)
    else:  # pragma: no cover
        raise ValueError(mode)
    out_ref[0] = out.astype(jnp.float32)


def cc_filter_pallas(mask: jnp.ndarray, mode: str, connectivity: int = 2,
                     min_size: int = 0, max_size: int = 0,
                     max_iters: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused connected-component size filtering, entirely VMEM-resident.

    mode: "remove_small" (skimage.remove_small_objects), "fill_holes"
    (remove_small_holes), "clean" (both, in sequence), "largest"
    (largest_component).
    """
    lead = mask.shape[:-2]
    h, w = mask.shape[-2:]
    assert h % 8 == 0, h
    b = 1
    for d in lead:
        b *= d
    nhi = _rle_nhi(h, w)
    flat = mask.reshape(b, h, w).astype(jnp.float32)
    kern = functools.partial(_cc_filter_kernel, h=h, w=w,
                             connectivity=connectivity, max_iters=max_iters,
                             mode=mode, min_size=min_size, max_size=max_size)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nhi, _RLE_LO), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(flat)
    return (out > 0.5).reshape(mask.shape)


def _fill_holes_split_kernel(mask_ref, reach1_ref, out_ref,
                             count_ref, lab_ref, sizes_ref, *,
                             h: int, w: int, connectivity: int,
                             max_iters: int, max_size: int):
    """remove_small_holes with the border-connected background pre-resolved
    by `pallas_bitpack.border_reach_packed` (reach1 = the canonical
    border-touching component). reach1 arrives as PACKED int32 planes —
    the BlockSpec maps grid image i to plane i // 32, and bit i % 32 is
    tested in-kernel, so the packed leg's results never round-trip HBM as
    f32 masks.

    Exactness (ANY number of border components): the canonical component
    reach1 — on real masks the big outside-background/valley network, the
    slowly converging relax — is excluded from the per-image relax and its
    fill decision is a closed-form popcount. Everything else (interior
    holes AND any non-canonical border nubs) relaxes per image and
    converges in a few sweeps (such components are small or they are kept
    either way). The earlier form required reach == reach1 and fell back
    to relaxing the FULL background whenever a second component touched
    the border — on thin-stage valley masks that fallback made the split
    cost more than the unsplit kernel (53 vs 25 ms/batch-128)."""
    kept = mask_ref[0] > 0.5
    bit = (pl.program_id(0) % 32).astype(jnp.int32)
    reach1 = (lax.shift_right_logical(reach1_ref[0], bit) & 1) > 0
    inv = jnp.logical_not(kept)
    interior = jnp.logical_and(inv, jnp.logical_not(reach1))
    # Closed-form fast path: if no max_size x max_size window of the
    # non-canonical background accumulates max_size pixels, every one of
    # its components is below max_size (_all_components_below) — fill it
    # all without labeling. The relax + tables are then runtime-skipped.
    fill_all = _all_components_below(interior, h, w, max_size)
    relax_mask = jnp.logical_and(interior, jnp.logical_not(fill_all))

    # The relax + table phases only RUN when the fast path misses: under
    # pl.when the whole ~60-op/plane relax is skipped at runtime for the
    # common near-empty remnant. sizes_ref then holds the previous grid
    # step's values — safe, because every consumer ANDs against relax_mask
    # (all-false exactly when skipped).
    @pl.when(jnp.logical_not(fill_all))
    def _run_relax():
        _relax_and_sizes(relax_mask, h, w, connectivity, max_iters,
                         count_ref, lab_ref, sizes_ref, remnant=True)

    sizes = sizes_ref[:]
    fill = jnp.logical_and(relax_mask, sizes < float(max_size))
    fill = jnp.logical_or(fill, jnp.logical_and(interior, fill_all))
    # canonical border component: closed-form size = popcount
    npix = jnp.sum(reach1.astype(jnp.float32))
    fill = jnp.logical_or(
        fill, jnp.logical_and(reach1, npix < float(max_size)))
    out_ref[0] = jnp.logical_or(kept, fill).astype(jnp.float32)


def fill_holes_split_pallas(mask: jnp.ndarray, reach1_planes: jnp.ndarray,
                            max_size: int,
                            connectivity: int = 1, max_iters: int = 512,
                            interpret: bool = False) -> jnp.ndarray:
    """mask: (..., H, W) bool/f32; reach1: PACKED (ceil(B/32), H, W) int32
    planes from `border_reach_packed(..., packed=True, union=False)`."""
    lead = mask.shape[:-2]
    h, w = mask.shape[-2:]
    b = 1
    for d in lead:
        b *= d
    nhi = _rle_nhi(h, w)
    kern = functools.partial(_fill_holes_split_kernel, h=h, w=w,
                             connectivity=connectivity, max_iters=max_iters,
                             max_size=max_size)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, h, w), lambda i: (i // 32, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[spec, pspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nhi, _RLE_LO), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(mask.reshape(b, h, w).astype(jnp.float32), reach1_planes)
    return (out > 0.5).reshape(mask.shape)


def center_seed(mask: jnp.ndarray) -> jnp.ndarray:
    """Canonical per-image foreground seed: the fg pixel nearest the image
    center (squared euclidean; ties broken by linear index). On real ridge
    masks this lands inside the main ridge network — the slowly converging
    component the packed reach leg should absorb. Returns a one-hot (or
    all-false where the image has no fg) bool mask of mask's shape."""
    h, w = mask.shape[-2:]
    # the fused key packs the linear index into the low 17 bits, which is
    # only injective for h*w <= 2^17; beyond that two pixels can share a
    # key, the seed stops being one-hot and the split kernels' closed-form
    # popcount sizes silently corrupt — fail loudly instead
    assert h * w <= 131072, (
        f"center_seed key packing requires h*w <= 131072, got {h}x{w}")
    yy = jnp.arange(h, dtype=jnp.int32) * 2 - (h - 1)
    xx = jnp.arange(w, dtype=jnp.int32) * 2 - (w - 1)
    dist = yy[:, None] * yy[:, None] + xx[None, :] * xx[None, :]
    # single fused key: coarsened distance (capped to 13 bits so the max
    # key 8191*2^17 + lin stays below the 2^30 background sentinel;
    # coarsening only blurs WHICH near-center pixel wins, any deterministic
    # choice is valid) in the high bits, unique linear index in the low
    # 17 bits — one masked min + one compare instead of two of each
    lin = (jnp.arange(h, dtype=jnp.int32)[:, None] * w
           + jnp.arange(w, dtype=jnp.int32)[None, :])
    key = jnp.minimum(dist >> 5, 8191) * jnp.int32(131072) + lin
    big = jnp.int32(2 ** 30)
    kmask = jnp.where(mask, key, big)
    kmin = jnp.min(kmask, axis=(-2, -1), keepdims=True)
    return jnp.logical_and(mask, kmask == kmin)


def _remove_small_split_kernel(mask_ref, reach1_ref, out_ref,
                               count_ref, lab_ref, sizes_ref, *,
                               h: int, w: int, connectivity: int,
                               max_iters: int, min_size: int):
    """remove_small_objects with the canonical center component
    pre-resolved by `pallas_bitpack.reach_packed` seeded at
    `center_seed` (packed int32 planes, bit i % 32 of plane i // 32).

    Exactness mirrors _fill_holes_split_kernel: the canonical component —
    on real masks the main ridge network, the slow relax — is excluded
    from the per-image relax and its keep decision is a closed-form
    popcount; every other component (specks and any secondary ridge
    patches) relaxes per image and converges in a few sweeps."""
    fg = mask_ref[0] > 0.5
    bit = (pl.program_id(0) % 32).astype(jnp.int32)
    reach1 = (lax.shift_right_logical(reach1_ref[0], bit) & 1) > 0
    remnant = jnp.logical_and(fg, jnp.logical_not(reach1))
    # Closed-form fast path (mirror of the hole fill's): if no min_size x
    # min_size window of the remnant accumulates min_size pixels, every
    # remnant component is small (_all_components_below) — drop them all
    # without labeling; the relax + tables are runtime-skipped.
    drop_all = _all_components_below(remnant, h, w, min_size)
    relax_mask = jnp.logical_and(remnant, jnp.logical_not(drop_all))

    # Runtime skip of the relax + table phases on fast-path hits (see
    # _fill_holes_split_kernel): stale sizes_ref values are masked out by
    # the relax_mask AND below.
    @pl.when(jnp.logical_not(drop_all))
    def _run_relax():
        _relax_and_sizes(relax_mask, h, w, connectivity, max_iters,
                         count_ref, lab_ref, sizes_ref, remnant=True)

    sizes = sizes_ref[:]
    kept = jnp.logical_and(relax_mask, sizes >= float(min_size))
    npix = jnp.sum(reach1.astype(jnp.float32))
    kept = jnp.logical_or(
        kept, jnp.logical_and(reach1, npix >= float(min_size)))
    out_ref[0] = kept.astype(jnp.float32)


def remove_small_split_pallas(mask: jnp.ndarray, min_size: int,
                              connectivity: int = 1, max_iters: int = 512,
                              interpret: bool = False) -> jnp.ndarray:
    """remove_small_objects(min_size) with the objects relax split like the
    hole pass: packed reach of the center-seeded canonical component (32
    images per int32 plane) + per-image relax of the remnant specks."""
    from .pallas_bitpack import reach_packed
    lead = mask.shape[:-2]
    h, w = mask.shape[-2:]
    b = 1
    for d in lead:
        b *= d
    mask_b = jnp.asarray(mask, bool)
    reach1 = reach_packed(mask_b, center_seed(mask_b),
                          connectivity=connectivity, max_iters=max_iters,
                          interpret=interpret, packed=True)
    nhi = _rle_nhi(h, w)
    kern = functools.partial(_remove_small_split_kernel, h=h, w=w,
                             connectivity=connectivity, max_iters=max_iters,
                             min_size=min_size)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, h, w), lambda i: (i // 32, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[spec, pspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nhi, _RLE_LO), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(mask_b.reshape(b, h, w).astype(jnp.float32), reach1)
    return (out > 0.5).reshape(mask.shape)


def _split2_kernel(mask_ref, reach1_ref, reach2_ref, out_ref,
                   count_ref, lab_ref, sizes_ref, *,
                   h: int, w: int, connectivity: int,
                   max_iters: int, thresh: int, holes: bool):
    """Size filter with TWO canonical components pre-resolved packed: the
    border-touching canonical component (reach1) and the center-seeded
    canonical component of what reach1 missed (reach2). Both get
    closed-form popcount size decisions; only the remnant relaxes per
    image (with the total-below-threshold fast path skipping even that).

    Why two planes: after hull segmentation the outside-of-hull area is
    dark, Sauvola marks it foreground, and it WALLS the valley network off
    from the border — so in the objects pass the border ring, and in the
    hole pass the whole walled-off valley network, are each a huge
    component that a single-plane split would relax per image every image
    (the measured ~26 ms/batch table cost of round 4). Exact for any
    component count: non-canonical border nubs and secondary patches land
    in the remnant and relax per image.

    holes=False: keep foreground components with size >= thresh.
    holes=True: fill background components with size < thresh
    (out = mask | fill) — remove_small_holes semantics
    (fingerprint_preprocess.py:73-74,167-168)."""
    m = mask_ref[0] > 0.5
    bit = (pl.program_id(0) % 32).astype(jnp.int32)
    r1 = (lax.shift_right_logical(reach1_ref[0], bit) & 1) > 0
    r2 = (lax.shift_right_logical(reach2_ref[0], bit) & 1) > 0
    work = jnp.logical_not(m) if holes else m
    remnant = jnp.logical_and(work, jnp.logical_not(
        jnp.logical_or(r1, r2)))
    # sliding-window fast path: no thresh x thresh window of the remnant
    # reaches thresh pixels => every remnant component is below thresh
    # (_all_components_below) — decide all of them without labeling
    fast = _all_components_below(remnant, h, w, thresh)
    relax_mask = jnp.logical_and(remnant, jnp.logical_not(fast))

    # Runtime skip of relax + table phases on fast-path hits; stale
    # sizes_ref values are masked out by the relax_mask AND below.
    @pl.when(jnp.logical_not(fast))
    def _run_relax():
        _relax_and_sizes(relax_mask, h, w, connectivity, max_iters,
                         count_ref, lab_ref, sizes_ref, remnant=True)

    sizes = sizes_ref[:]
    npix1 = jnp.sum(r1.astype(jnp.float32))
    npix2 = jnp.sum(r2.astype(jnp.float32))
    if holes:
        fill = jnp.logical_and(relax_mask, sizes < float(thresh))
        fill = jnp.logical_or(fill, jnp.logical_and(remnant, fast))
        fill = jnp.logical_or(fill,
                              jnp.logical_and(r1, npix1 < float(thresh)))
        fill = jnp.logical_or(fill,
                              jnp.logical_and(r2, npix2 < float(thresh)))
        out_ref[0] = jnp.logical_or(m, fill).astype(jnp.float32)
    else:
        kept = jnp.logical_and(relax_mask, sizes >= float(thresh))
        kept = jnp.logical_or(kept,
                              jnp.logical_and(r1, npix1 >= float(thresh)))
        kept = jnp.logical_or(kept,
                              jnp.logical_and(r2, npix2 >= float(thresh)))
        out_ref[0] = kept.astype(jnp.float32)


def _split2_pallas(mask: jnp.ndarray, thresh: int, holes: bool,
                   connectivity: int, max_iters: int,
                   interpret: bool) -> jnp.ndarray:
    """Driver for _split2_kernel: resolves the two canonical components
    bit-packed (32 images per int32 plane), then filters per image."""
    from .pallas_bitpack import (border_reach_packed, reach_packed,
                                 unpack_bits)
    lead = mask.shape[:-2]
    h, w = mask.shape[-2:]
    b = 1
    for d in lead:
        b *= d
    mask_b = jnp.asarray(mask, bool).reshape(b, h, w)
    work = jnp.logical_not(mask_b) if holes else mask_b
    reach1 = border_reach_packed(work, connectivity=connectivity,
                                 max_iters=max_iters, interpret=interpret,
                                 packed=True, union=False)
    interior = jnp.logical_and(work, jnp.logical_not(
        unpack_bits(reach1, b).reshape(b, h, w)))
    reach2 = reach_packed(interior, center_seed(interior),
                          connectivity=connectivity, max_iters=max_iters,
                          interpret=interpret, packed=True)
    nhi = _rle_nhi(h, w)
    kern = functools.partial(_split2_kernel, h=h, w=w,
                             connectivity=connectivity, max_iters=max_iters,
                             thresh=thresh, holes=holes)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, h, w), lambda i: (i // 32, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[spec, pspec, pspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nhi, _RLE_LO), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(mask_b.astype(jnp.float32), reach1, reach2)
    return (out > 0.5).reshape(mask.shape)


def remove_small_split2_pallas(mask: jnp.ndarray, min_size: int,
                               connectivity: int = 1, max_iters: int = 512,
                               interpret: bool = False) -> jnp.ndarray:
    """remove_small_objects(min_size) with BOTH the border-touching
    canonical fg component (e.g. the outside-of-hull Sauvola ring) and the
    center-seeded canonical component (the main ridge network) resolved
    bit-packed; only true specks relax per image."""
    return _split2_pallas(mask, min_size, False, connectivity, max_iters,
                          interpret)


def fill_holes_split2_pallas(mask: jnp.ndarray, max_size: int,
                             connectivity: int = 1, max_iters: int = 512,
                             interpret: bool = False) -> jnp.ndarray:
    """remove_small_holes(max_size) with BOTH the border-connected
    background and the center-seeded walled-off valley network resolved
    bit-packed; only genuine small interior holes relax per image."""
    return _split2_pallas(mask, max_size, True, connectivity, max_iters,
                          interpret)


def clean_mask_split(mask: jnp.ndarray, min_size: int, max_size: int,
                     connectivity: int = 1, max_iters: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """remove_small_objects(min_size) + remove_small_holes(max_size)
    (fingerprint_preprocess.py:73-74,167-168 semantics, identical to
    cc_filter_pallas(mode="clean")) with the slow relaxations split onto
    packed planes, TWO canonical components per pass (see _split2_kernel):
    the objects pass resolves the border ring and the center-seeded ridge
    network packed; the hole pass resolves the border-connected background
    and the walled-off valley network packed (mean 27 / max 58 sweeps on
    real valley masks, at 1/32nd the data volume). Per-image relaxes only
    see true specks / genuine small holes."""
    kept = remove_small_split2_pallas(mask, min_size,
                                      connectivity=connectivity,
                                      max_iters=max_iters,
                                      interpret=interpret)
    return fill_holes_split2_pallas(kept, max_size,
                                    connectivity=connectivity,
                                    max_iters=max_iters, interpret=interpret)


def _reconstruct_kernel(marker_ref, mask_ref, out_ref, *, h: int, w: int,
                        connectivity: int, max_iters: int):
    fg = mask_ref[0] > 0.5
    marker = jnp.logical_and(marker_ref[0] > 0.5, fg)
    rows = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lin1 = rows * w + cols + 1                       # 0 reserved for markers
    label0 = jnp.where(marker, 0, lin1)
    v = _label_relax(fg, h, w, connectivity, max_iters, label0=label0)
    out_ref[0] = jnp.logical_and(fg, v == 0.0).astype(jnp.float32)


def binary_reconstruct_pallas(marker: jnp.ndarray, mask: jnp.ndarray,
                              connectivity: int = 2, max_iters: int = 512,
                              interpret: bool = False) -> jnp.ndarray:
    """Binary geodesic reconstruction by dilation as marker REACHABILITY:
    keep the components of ``mask`` that contain a marker pixel. Exactly the
    fixpoint of `morphology.binary_reconstruction_by_dilation` (3x3 full
    kernel = connectivity 2), but via the keyed CC relaxation — scan steps
    propagate along whole runs, where geodesic dilation crawls 1 px per
    step, and no size-histogram phases are needed."""
    lead = mask.shape[:-2]
    h, w = mask.shape[-2:]
    b = 1
    for d in lead:
        b *= d
    kern = functools.partial(_reconstruct_kernel, h=h, w=w,
                             connectivity=connectivity, max_iters=max_iters)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(marker.reshape(b, h, w).astype(jnp.float32),
      mask.reshape(b, h, w).astype(jnp.float32))
    return (out > 0.5).reshape(mask.shape)

"""Connected components and mask-domain geometry.

TPU-native replacements for skimage.morphology.remove_small_objects /
remove_small_holes (fingerprint_preprocess.py:73-74, 167-168) and
cv2.findContours + convexHull (fingerprint_preprocess.py:112-123).

Labeling: each foreground pixel starts with its linear index; labels
propagate by *segmented min-scans* along rows and columns plus a 3x3 (or
cross) min stencil, iterated to fixpoint in a bounded `lax.while_loop` — a
sweep converges in O(#zigzags of the component shape) iterations instead of
O(image diameter).

The segmented min-scan is a manual log-doubling recurrence unrolled at trace
time (ceil(log2(L)) steps per direction): carry (v, blocked) where v is the
window min and blocked marks a reset inside the window; each step combines
with the copy shifted by 2^s. Everything is elementwise f32/bool plus static
pad/slice shifts — no scan primitives (tuple associative_scans took minutes
to compile and ~500 ms/sweep on TPU; lax.cummax-on-int32 crashed the remote
TPU compiler) and no gathers (~2.5 s/sweep on TPU). Sweeps iterate to
fixpoint in a bounded `lax.while_loop`, converging in O(#zigzags of the
component shape) iterations.

Convex hull: a convex set is the intersection of its supporting half-planes;
we intersect D sampled directions (`lax.scan` over angles), which converges
to cv2.convexHull's polygon as D grows (D=90 gives sub-pixel agreement at
PolyU resolutions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.int32(2 ** 30)


def _neighbor_min(label: jnp.ndarray, fg: jnp.ndarray,
                  connectivity: int) -> jnp.ndarray:
    """Min label over the connected neighborhood, restricted to foreground."""
    x = jnp.where(fg, label, _INF).astype(jnp.float32)
    lead = label.shape[:-2]
    xn = x.reshape((-1,) + label.shape[-2:])
    if connectivity == 2:
        mn = lax.reduce_window(
            xn, jnp.inf, lax.min,
            window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
            padding="SAME")
    else:  # 4-connectivity: cross-shaped neighborhood
        mn_h = lax.reduce_window(
            xn, jnp.inf, lax.min,
            window_dimensions=(1, 1, 3), window_strides=(1, 1, 1),
            padding="SAME")
        mn_v = lax.reduce_window(
            xn, jnp.inf, lax.min,
            window_dimensions=(1, 3, 1), window_strides=(1, 1, 1),
            padding="SAME")
        mn = jnp.minimum(mn_h, mn_v)
    mn = jnp.minimum(mn, xn).reshape(label.shape).astype(jnp.int32)
    return jnp.where(fg, mn, _INF)


def _pointer_jump(label: jnp.ndarray, fg: jnp.ndarray, hw: int) -> jnp.ndarray:
    """label <- label[label]: chase the label chain one hop (flat gather)."""
    lead = label.shape[:-2]
    flat = label.reshape(lead + (hw,))
    safe = jnp.clip(flat, 0, hw - 1)
    jumped = jnp.take_along_axis(flat, safe, axis=-1)
    out = jumped.reshape(label.shape)
    return jnp.where(fg, out, _INF)


_FINF = jnp.float32(2 ** 30)


def _shift_along(x: jnp.ndarray, axis: int, amount: int, fill):
    """Shift ``x`` forward by ``amount`` along ``axis`` (vacated slots get
    ``fill``): out[i] = x[i - amount]."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (amount, 0)
    padded = jnp.pad(x, pad, constant_values=fill)
    index = [slice(None)] * x.ndim
    index[axis] = slice(0, x.shape[axis])
    return padded[tuple(index)]


def _seg_min_scan(label: jnp.ndarray, fg: jnp.ndarray, axis: int,
                  reverse: bool) -> jnp.ndarray:
    """Segmented prefix-min of ``label`` along ``axis`` (segments reset at
    background) via log-doubling. Background slots return _INF."""
    axis = axis % label.ndim
    if reverse:
        label = jnp.flip(label, axis)
        fg = jnp.flip(fg, axis)

    v = jnp.where(fg, label.astype(jnp.float32), _FINF)
    blocked = jnp.logical_not(fg)
    length = label.shape[axis]
    shift = 1
    while shift < length:
        v_s = _shift_along(v, axis, shift, _FINF)
        b_s = _shift_along(blocked, axis, shift, True)
        v = jnp.where(blocked, v, jnp.minimum(v, v_s))
        blocked = jnp.logical_or(blocked, b_s)
        shift *= 2

    out = jnp.where(fg, v.astype(jnp.int32), _INF)
    if reverse:
        out = jnp.flip(out, axis)
    return out


# Implementation selector, read at trace time: "auto" picks the Pallas
# VMEM-resident kernel on TPU (ops/pallas_cc.py; whole relaxation on-chip,
# ~3x the XLA doubling scans) and the XLA form elsewhere. Set "xla"/"pallas"
# to force, before jit-compiling.
CC_IMPL = "auto"


def set_cc_impl(impl: str) -> None:
    global CC_IMPL
    assert impl in ("auto", "xla", "pallas"), impl
    CC_IMPL = impl


def _use_pallas_cc() -> bool:
    if CC_IMPL == "auto":
        import jax as _jax
        return _jax.default_backend() == "tpu"
    return CC_IMPL == "pallas"


def connected_components(mask: jnp.ndarray, connectivity: int = 2,
                         max_iters: int = 512) -> jnp.ndarray:
    # max_iters is a worst-case bound (pure-diagonal 8-conn chains advance
    # one pixel per sweep); the while_loop exits at convergence, which for
    # ridge masks takes ~10-20 sweeps.
    if _use_pallas_cc():
        from .pallas_cc import connected_components_pallas
        return connected_components_pallas(mask, connectivity, max_iters)
    """Label connected components of a boolean mask (..., H, W).

    Returns int32 labels: the linear index of each component's smallest
    pixel; background pixels get 2**30. connectivity: 1 (4-conn, the
    skimage remove_small_* default) or 2 (8-conn).
    """
    fg = mask.astype(bool)
    h, w = mask.shape[-2:]
    hw = h * w
    idx = (jnp.arange(h, dtype=jnp.int32)[:, None] * w
           + jnp.arange(w, dtype=jnp.int32)[None, :])
    label0 = jnp.where(fg, jnp.broadcast_to(idx, mask.shape), _INF)
    # Materialize the mask before the loop: XLA's fusible-sinking otherwise
    # clones the whole producer chain INTO the while body and recomputes it
    # every iteration (measured 2.9 s vs 0.2 s for the segmentation stage).
    fg, label0 = lax.optimization_barrier((fg, label0))

    # label values must be exact in f32 doubling scans (24-bit mantissa)
    if hw <= (1 << 24):
        def step(label):
            label = _seg_min_scan(label, fg, -1, False)
            label = _seg_min_scan(label, fg, -1, True)
            label = _seg_min_scan(label, fg, -2, False)
            label = _seg_min_scan(label, fg, -2, True)
            return _neighbor_min(label, fg, connectivity)
    else:  # large images: gather-based pointer jumping
        def step(label):
            label = _neighbor_min(label, fg, connectivity)
            label = _pointer_jump(label, fg, hw)
            label = _pointer_jump(label, fg, hw)
            return label

    def cond(state):
        label, prev, i = state
        return jnp.logical_and(i < max_iters, jnp.any(label != prev))

    def body(state):
        label, _, i = state
        return step(label), label, i + 1

    first = step(label0)
    label, _, _ = lax.while_loop(cond, body, (first, label0, jnp.int32(1)))
    return label


def component_sizes(label: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Pixel count per component root: (..., H*W+1); slot H*W is background.

    Built as a two-level one-hot contraction on the MXU: labels decompose
    as hi*256+lo, and count[hi, lo] = sum_p onehot_hi(p) x onehot_lo(p) —
    one batched bf16 matmul with exact f32 accumulation. The scatter-add
    form (sort-based on TPU) measured ~5-10x slower. Batch is chunked to
    bound the one-hot transients.
    """
    h, w = label.shape[-2:]
    hw = h * w
    lead = label.shape[:-2]
    b = 1
    for d in lead:
        b *= d
    nhi = (hw + 256) // 256  # covers the hw background bin
    lab = jnp.where(mask, label, hw).reshape(b, hw)

    def count_chunk(lab_c):
        hi = lab_c // 256
        lo = lab_c % 256
        oh_hi = jax.nn.one_hot(hi, nhi, dtype=jnp.bfloat16)
        oh_lo = jax.nn.one_hot(lo, 256, dtype=jnp.bfloat16)
        return jnp.einsum("bph,bpl->bhl", oh_hi, oh_lo,
                          preferred_element_type=jnp.float32)

    chunk = 16
    if b <= chunk:
        count = count_chunk(lab)
    else:
        pad = (-b) % chunk
        lab_p = jnp.concatenate(
            [lab, jnp.full((pad, hw), hw, lab.dtype)]) if pad else lab
        count = lax.map(count_chunk,
                        lab_p.reshape(-1, chunk, hw)).reshape(-1, nhi, 256)[:b]

    sizes = count.reshape(b, nhi * 256)[:, :hw + 1]
    return sizes.reshape(lead + (hw + 1,))


def _gather_by_label(values: jnp.ndarray, label: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """values: (..., H*W+1) per-root table -> per-pixel (..., H, W).

    Two-level one-hot matmul instead of a flat gather (slow on TPU). bf16
    is exact for table values < 256; larger component sizes round by <1%,
    which cannot flip the <=150 size thresholds these lookups feed.
    """
    h, w = label.shape[-2:]
    hw = h * w
    lead = label.shape[:-2]
    b = 1
    for d in lead:
        b *= d
    nhi = (hw + 256) // 256
    lab = jnp.where(mask, label, hw).reshape(b, hw)
    pad_v = jnp.zeros(lead + (nhi * 256 - (hw + 1),), values.dtype)
    table = jnp.concatenate([values, pad_v], axis=-1).reshape(b, nhi, 256)

    def chunk_fn(args):
        lab_c, tbl_c = args
        hi = lab_c // 256
        lo = lab_c % 256
        oh_hi = jax.nn.one_hot(hi, nhi, dtype=jnp.bfloat16)
        tmp = jnp.einsum("bph,bhl->bpl", oh_hi, tbl_c.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        oh_lo = jax.nn.one_hot(lo, 256, dtype=jnp.float32)
        return jnp.sum(tmp * oh_lo, axis=-1)

    chunk = 16
    if b <= chunk:
        out = chunk_fn((lab, table))
    else:
        pad = (-b) % chunk
        if pad:
            lab = jnp.concatenate([lab, jnp.full((pad, hw), hw, lab.dtype)])
            table = jnp.concatenate(
                [table, jnp.zeros((pad, nhi, 256), table.dtype)])
        out = lax.map(chunk_fn, (lab.reshape(-1, chunk, hw),
                                 table.reshape(-1, chunk, nhi, 256))
                      ).reshape(-1, hw)[:b]
    return out.reshape(label.shape)


def remove_small_objects(mask: jnp.ndarray, min_size: int,
                         connectivity: int = 2) -> jnp.ndarray:
    """Drop components smaller than min_size
    (skimage.morphology.remove_small_objects)."""
    if _use_pallas_cc():
        from .pallas_cc import cc_filter_pallas
        return cc_filter_pallas(mask.astype(bool), "remove_small",
                                connectivity, min_size=min_size)
    label = connected_components(mask, connectivity)
    sizes = component_sizes(label, mask)
    pix_size = _gather_by_label(sizes, label, mask)
    return jnp.logical_and(mask.astype(bool), pix_size >= min_size)


def remove_small_holes(mask: jnp.ndarray, max_size: int,
                       connectivity: int = 2) -> jnp.ndarray:
    """Fill background components smaller than max_size
    (skimage.morphology.remove_small_holes)."""
    if _use_pallas_cc():
        from .pallas_cc import cc_filter_pallas
        return cc_filter_pallas(mask.astype(bool), "fill_holes",
                                connectivity, max_size=max_size)
    inv = jnp.logical_not(mask.astype(bool))
    label = connected_components(inv, connectivity)
    sizes = component_sizes(label, inv)
    pix_size = _gather_by_label(sizes, label, inv)
    fill = jnp.logical_and(inv, pix_size < max_size)
    return jnp.logical_or(mask.astype(bool), fill)


def clean_mask(mask: jnp.ndarray, min_size: int, max_size: int,
               connectivity: int = 1) -> jnp.ndarray:
    """remove_small_objects(min_size) then remove_small_holes(max_size) —
    fused into one VMEM-resident Pallas kernel on TPU (both relaxations,
    the size histograms and the per-pixel lookups run on-chip)."""
    if _use_pallas_cc():
        from .pallas_cc import cc_filter_pallas
        return cc_filter_pallas(mask.astype(bool), "clean", connectivity,
                                min_size=min_size, max_size=max_size)
    return remove_small_holes(
        remove_small_objects(mask, min_size, connectivity),
        max_size, connectivity)


def largest_component(mask: jnp.ndarray, connectivity: int = 2) -> jnp.ndarray:
    """Keep only the largest connected component
    (reference keeps the largest contour, fingerprint_preprocess.py:112-116).
    On TPU the labeling, size histogram, and winner compare run in one
    VMEM-resident kernel; the XLA fallback's `component_sizes` one-hot
    einsum materializes (B, H*W, hw/256) transients in HBM."""
    fg = mask.astype(bool)
    if _use_pallas_cc():
        return _largest_component_majority(fg, connectivity)
    label = connected_components(fg, connectivity)
    sizes = component_sizes(label, fg)
    best = jnp.argmax(sizes[..., :-1], axis=-1).astype(jnp.int32)
    return jnp.logical_and(fg, label == best[..., None, None])


def _largest_component_majority(fg: jnp.ndarray, connectivity: int,
                                interpret: bool = False) -> jnp.ndarray:
    """largest_component with a packed majority shortcut: seed the pixel
    with the densest 15x15 fg neighborhood, flood its component with the
    bit-packed reach (32 images per int32 plane), and accept it closed-form
    when it holds a strict majority of fg pixels — no other component can
    then be larger. Images that fail the majority test (never real
    post-close/open segmentation masks, which are one blob plus speckles)
    fall back to the exact label-relax kernel through a data-selected mask,
    which relaxes empty (= converges immediately) for decided images."""
    from .pallas_cc import cc_filter_pallas
    from .pallas_bitpack import reach_packed
    from .filters import box_filter

    lead = fg.shape[:-2]
    h, w = fg.shape[-2:]
    flat = fg.reshape((-1,) + fg.shape[-2:])
    dens = box_filter(flat.astype(jnp.float32), 15)
    cand = jnp.where(flat, dens, -1.0)
    best = jnp.max(cand, axis=(-2, -1), keepdims=True)
    rows = jnp.arange(h, dtype=jnp.int32)[:, None]
    cols = jnp.arange(w, dtype=jnp.int32)[None, :]
    lin = rows * w + cols
    at = jnp.logical_and(flat, cand == best)
    cand_lin = jnp.where(at, lin, jnp.int32(h * w))
    first = jnp.min(cand_lin, axis=(-2, -1), keepdims=True)
    seed = jnp.logical_and(at, lin == first)

    reach = reach_packed(flat, seed, connectivity=connectivity,
                         interpret=interpret)
    n_reach = jnp.sum(reach, axis=(-2, -1), keepdims=True)
    n_fg = jnp.sum(flat, axis=(-2, -1), keepdims=True)
    decided = n_reach * 2 > n_fg
    fallback = cc_filter_pallas(jnp.logical_and(flat, ~decided), "largest",
                                connectivity, interpret=interpret)
    return jnp.where(decided, reach, fallback).reshape(fg.shape)


def _convex_hull_mask_scan(mask: jnp.ndarray, n_directions: int = 90,
                           pad: float = 0.5) -> jnp.ndarray:
    """Reference form of `convex_hull_mask`: one full-image masked max +
    compare per direction (O(D*H*W) work; kept for the equivalence test)."""
    fg = mask.astype(bool)
    h, w = mask.shape[-2:]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    thetas = jnp.linspace(0.0, 2.0 * jnp.pi, n_directions, endpoint=False)

    any_fg = jnp.any(fg, axis=(-2, -1), keepdims=True)

    def step(inside, theta):
        proj = jnp.cos(theta) * xs + jnp.sin(theta) * ys  # (H, W)
        pmax = jnp.max(jnp.where(fg, proj, -jnp.inf), axis=(-2, -1), keepdims=True)
        inside = jnp.logical_and(inside, proj <= pmax + pad)
        return inside, None

    inside0 = jnp.broadcast_to(any_fg, mask.shape)
    inside, _ = lax.scan(step, inside0, thetas)
    return inside


def convex_hull_mask(mask: jnp.ndarray, n_directions: int = 90,
                     pad: float = 0.5) -> jnp.ndarray:
    """Convex hull of a boolean mask as intersection of supporting
    half-planes over ``n_directions`` sampled angles
    (replaces cv2.convexHull + fillPoly, fingerprint_preprocess.py:117-123).

    Row-interval formulation, bit-identical to `_convex_hull_mask_scan`
    but ~50x less work: (1) the supporting value pmax_d is attained at a
    per-row x extreme (cos*x is monotone in x and f32 rounding preserves
    order, so the f32 max over a row equals the f32 value at the row's
    xmin/xmax); (2) each half-plane restricted to a row passes a prefix or
    suffix of x, so the hull row is an interval whose endpoints are found
    by an 8-step binary search per (row, direction) — ON THE ORIGINAL f32
    PREDICATE cos*x + sin*y <= pmax + pad, which keeps every boundary
    pixel identical. Work drops from O(D*H*W) full-image passes to
    O(log(W)*D*H) + a single interval test."""
    fg = mask.astype(bool)
    lead = mask.shape[:-2]
    h, w = mask.shape[-2:]
    fg3 = fg.reshape((-1, h, w))
    b = fg3.shape[0]
    ys = jnp.arange(h, dtype=jnp.float32)                     # (H,)
    xs_i = jnp.arange(w, dtype=jnp.int32)
    thetas = jnp.linspace(0.0, 2.0 * jnp.pi, n_directions, endpoint=False)
    cos, sin = jnp.cos(thetas), jnp.sin(thetas)               # (D,)

    any_fg = jnp.any(fg3, axis=(-2, -1))                      # (B,)
    row_any = jnp.any(fg3, axis=-1)                           # (B, H)
    xmax_r = jnp.max(jnp.where(fg3, xs_i[None, None, :], -1), axis=-1)
    xmin_r = jnp.min(jnp.where(fg3, xs_i[None, None, :], w), axis=-1)

    # pmax[b, d] = max over fg of cos*x + sin*y, via per-row extremes.
    xext = jnp.where(cos[None, None, :] > 0.0,
                     xmax_r[..., None], xmin_r[..., None]).astype(jnp.float32)
    sy = sin[None, :] * ys[:, None]                           # (H, D)
    rowval = cos[None, None, :] * xext + sy[None]             # (B, H, D)
    rowval = jnp.where(row_any[..., None], rowval, -jnp.inf)
    thr = jnp.max(rowval, axis=1) + pad                       # (B, D)

    # Per (row, direction) x-threshold by binary search on the original
    # f32 predicate: P(x) = cos*x + sin*y <= thr. cos > 0: passing x's are
    # a prefix (find last true); cos < 0: a suffix (find first true).
    def pred(x_int):
        x = x_int.astype(jnp.float32)                         # (B, H, D)
        return cos[None, None, :] * x + sy[None] <= thr[:, None, :]

    pos = cos > 0.0
    res_hi = jnp.full((b, h, n_directions), -1, jnp.int32)    # last true
    res_lo = jnp.full((b, h, n_directions), w, jnp.int32)     # first true
    bit = 1
    while bit * 2 <= w:
        bit *= 2
    while bit >= 1:
        cand_hi = res_hi + bit
        ok_hi = (cand_hi <= w - 1) & pred(cand_hi)
        res_hi = jnp.where(ok_hi, cand_hi, res_hi)
        cand_lo = res_lo - bit
        ok_lo = (cand_lo >= 0) & pred(cand_lo)
        res_lo = jnp.where(ok_lo, cand_lo, res_lo)
        bit //= 2

    big = jnp.int32(w)
    xhi = jnp.min(jnp.where(pos[None, None, :], res_hi, big - 1), axis=-1)
    xlo = jnp.max(jnp.where(pos[None, None, :], 0, res_lo), axis=-1)
    inside = ((xs_i[None, None, :] >= xlo[..., None])
              & (xs_i[None, None, :] <= xhi[..., None])
              & any_fg[:, None, None])
    return inside.reshape(lead + (h, w))


def mask_bbox(mask: jnp.ndarray) -> jnp.ndarray:
    """(y0, x0, y1, x1) inclusive bounds of a boolean mask (static shape;
    empty mask -> zeros). Replaces cv2.boundingRect."""
    fg = mask.astype(bool)
    h, w = mask.shape[-2:]
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    row_any = jnp.any(fg, axis=-1)
    col_any = jnp.any(fg, axis=-2)
    y0 = jnp.min(jnp.where(row_any, ys, h), axis=-1)
    y1 = jnp.max(jnp.where(row_any, ys, -1), axis=-1)
    x0 = jnp.min(jnp.where(col_any, xs, w), axis=-1)
    x1 = jnp.max(jnp.where(col_any, xs, -1), axis=-1)
    return jnp.stack([y0, x0, y1, x1], axis=-1)

"""Morphology: erode/dilate/open/close + geodesic reconstruction.

TPU-native replacements for cv2.morphologyEx / cv2.erode and
skimage.morphology.reconstruction (fingerprint_preprocess.py:76-81, 107-109).

Grayscale erosion/dilation with a rectangular SE is a min/max
`lax.reduce_window`; elliptical and arbitrary SEs shift-and-reduce over the
SE's offsets (unrolled at trace time — SEs are small and static). Geodesic
reconstruction by dilation is a bounded `lax.while_loop` to fixpoint.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def ellipse_se(size: int) -> np.ndarray:
    """OpenCV-style elliptical structuring element
    (cv2.getStructuringElement(MORPH_ELLIPSE, (size, size)))."""
    r = size / 2.0
    inv_r = 1.0 / max(r - 0.5, 1e-6)
    se = np.zeros((size, size), dtype=bool)
    for i in range(size):
        dy = i - (size - 1) / 2.0
        dx_max = (r - 0.5) * np.sqrt(max(0.0, 1.0 - (dy * inv_r) ** 2))
        j0 = int(np.ceil((size - 1) / 2.0 - dx_max))
        j1 = int(np.floor((size - 1) / 2.0 + dx_max))
        se[i, j0:j1 + 1] = True
    return se


def _reduce_rect(x: jnp.ndarray, size: int, op) -> jnp.ndarray:
    init = -jnp.inf if op is lax.max else jnp.inf
    lead = x.shape[:-2]
    xn = x.reshape((-1,) + x.shape[-2:]).astype(jnp.float32)
    out = lax.reduce_window(
        xn, init, op,
        window_dimensions=(1, size, size),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    return out.reshape(lead + x.shape[-2:])


def _reduce_se(x: jnp.ndarray, se: np.ndarray, op) -> jnp.ndarray:
    """Shift-and-reduce morphology for an arbitrary boolean SE."""
    size_h, size_w = se.shape
    ch, cw = size_h // 2, size_w // 2
    is_max = op is jnp.maximum
    pad_val = -jnp.inf if is_max else jnp.inf
    padded = jnp.pad(
        x.astype(jnp.float32),
        [(0, 0)] * (x.ndim - 2) + [(ch, size_h - 1 - ch), (cw, size_w - 1 - cw)],
        constant_values=pad_val,
    )
    h, w = x.shape[-2:]
    out = None
    for dy in range(size_h):
        for dx in range(size_w):
            if not se[dy, dx]:
                continue
            sl = padded[..., dy:dy + h, dx:dx + w]
            out = sl if out is None else op(out, sl)
    return out


def _slice_ax(x: jnp.ndarray, start: int, length: int, axis: int):
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(start, start + length)
    return x[tuple(sl)]


def _se_run_reduce(x: jnp.ndarray, se: np.ndarray, op, fill: float
                   ) -> jnp.ndarray:
    """min/max over an SE's offsets via run decomposition: every SE row is a
    contiguous run, a run reduce is TWO overlapping power-of-2 window
    reduces (idempotent ops make the overlap free), and equal runs on
    contiguous rows share one vertical window reduce. ~25 passes for the
    15x15 ellipse vs 225 shift-reduces (or a 225-tap conv). The input is
    padded with ``fill`` up front so every window position stays in-bounds
    (partial windows at borders must keep their in-bounds part)."""
    size_h, size_w = se.shape
    ch, cw = size_h // 2, size_w // 2
    h, w = x.shape[-2:]
    ax_h, ax_w = x.ndim - 2, x.ndim - 1

    runs: dict[tuple[int, int], list[int]] = {}
    for i in range(size_h):
        js = np.nonzero(se[i])[0]
        if js.size == 0:
            continue
        assert (np.diff(js) == 1).all(), "SE rows must be contiguous runs"
        runs.setdefault((int(js[0]) - cw, int(js[-1]) - cw),
                        []).append(i - ch)

    pads = [(0, 0)] * (x.ndim - 2) + [(ch, size_h - 1 - ch),
                                      (cw, size_w - 1 - cw)]
    xp = jnp.pad(x, pads, constant_values=fill)

    def build_pyramid(base, axis, max_len):
        # pyr[k][.., j] = op over base[.., j : j + k]
        pyr = {1: base}
        k = 1
        while k * 2 <= max_len:
            n = pyr[k].shape[axis] - k
            pyr[k * 2] = op(_slice_ax(pyr[k], 0, n, axis),
                            _slice_ax(pyr[k], k, n, axis))
            k *= 2
        return pyr

    def span(pyr, start, length, axis, out_len):
        # op over window [start, start+length-1] in padded coordinates
        m = 1 << (length.bit_length() - 1)
        lo = _slice_ax(pyr[m], start, out_len, axis)
        if length == m:
            return lo
        return op(lo, _slice_ax(pyr[m], start + length - m, out_len, axis))

    hmax = max(b - a + 1 for a, b in runs)
    hp = build_pyramid(xp, ax_w, hmax)

    out = None
    for (a, b), dys in runs.items():
        hred = span(hp, a + cw, b - a + 1, ax_w, w)  # rows still padded
        dys = sorted(dys)
        groups = []
        start = prev = dys[0]
        for d in dys[1:]:
            if d == prev + 1:
                prev = d
            else:
                groups.append((start, prev))
                start = prev = d
        groups.append((start, prev))
        vp = build_pyramid(hred, ax_h, max(e - s + 1 for s, e in groups))
        for s_, e_ in groups:
            r = span(vp, s_ + ch, e_ - s_ + 1, ax_h, h)
            out = r if out is None else op(out, r)
    return out


def binary_dilate(mask: jnp.ndarray, size: int = 3,
                  shape: str = "rect") -> jnp.ndarray:
    """Binary dilation: OR over SE-covered neighbors, via run-decomposed
    power-of-2 window maxes (`_se_run_reduce`)."""
    se = np.ones((size, size), bool) if shape == "rect" else ellipse_se(size)
    out = _se_run_reduce(mask.astype(jnp.float32), se, jnp.maximum, 0.0)
    return out > 0.5


def binary_erode(mask: jnp.ndarray, size: int = 3,
                 shape: str = "rect") -> jnp.ndarray:
    """Binary erosion: AND over SE-covered neighbors. Border behaves as
    background (zero fill), matching OpenCV's constant-0 border for erosion
    of 0/1 masks."""
    se = np.ones((size, size), bool) if shape == "rect" else ellipse_se(size)
    out = _se_run_reduce(mask.astype(jnp.float32), se, jnp.minimum, 0.0)
    return out > 0.5


def binary_opening(mask: jnp.ndarray, size: int = 3,
                   shape: str = "rect") -> jnp.ndarray:
    return binary_dilate(binary_erode(mask, size, shape), size, shape)


def binary_closing(mask: jnp.ndarray, size: int = 3,
                   shape: str = "rect") -> jnp.ndarray:
    return binary_erode(binary_dilate(mask, size, shape), size, shape)


def binary_reconstruction_by_dilation(marker: jnp.ndarray, mask: jnp.ndarray,
                                      max_iters: int = 32,
                                      substeps: int = 8) -> jnp.ndarray:
    """Binary geodesic reconstruction: iterate marker <- dilate3x3(marker) &
    mask. ``substeps`` dilations per while-loop iteration amortize the
    convergence check. On TPU this routes to the marker-reachability CC
    kernel (`pallas_cc.binary_reconstruct_pallas`) — same fixpoint, but
    scans propagate along whole runs instead of 1 px per dilation."""
    import jax as _jax
    if _jax.default_backend() == "tpu":
        from .pallas_cc import binary_reconstruct_pallas
        return binary_reconstruct_pallas(marker, mask, connectivity=2)
    from .filters import conv2d_same
    k = jnp.ones((3, 3), jnp.float32)
    marker = jnp.logical_and(marker.astype(bool), mask.astype(bool))
    # prevent producer recomputation inside the while loop
    marker, mask = lax.optimization_barrier((marker, mask.astype(bool)))

    def grow(m):
        for _ in range(substeps):
            m = jnp.logical_and(
                conv2d_same(m.astype(jnp.float32), k, border="zero") > 0.5,
                mask)
        return m

    def cond(state):
        m, prev, i = state
        return jnp.logical_and(i < max_iters, jnp.any(m != prev))

    def body(state):
        m, _, i = state
        return grow(m), m, i + 1

    first = grow(marker)
    out, _, _ = lax.while_loop(cond, body, (first, marker, jnp.int32(1)))
    return out


def dilate(x: jnp.ndarray, size: int = 3, shape: str = "rect") -> jnp.ndarray:
    if shape == "rect":
        return _reduce_rect(x, size, lax.max)
    return _reduce_se(x, ellipse_se(size), jnp.maximum)


def erode(x: jnp.ndarray, size: int = 3, shape: str = "rect") -> jnp.ndarray:
    if shape == "rect":
        return _reduce_rect(x, size, lax.min)
    return _reduce_se(x, ellipse_se(size), jnp.minimum)


def opening(x: jnp.ndarray, size: int = 3, shape: str = "rect") -> jnp.ndarray:
    return dilate(erode(x, size, shape), size, shape)


def closing(x: jnp.ndarray, size: int = 3, shape: str = "rect") -> jnp.ndarray:
    return erode(dilate(x, size, shape), size, shape)


def reconstruction_by_dilation(marker: jnp.ndarray, mask: jnp.ndarray,
                               max_iters: int = 256) -> jnp.ndarray:
    """Grayscale geodesic reconstruction by dilation
    (skimage.morphology.reconstruction, fingerprint_preprocess.py:76-81).

    Iterates marker <- min(dilate3x3(marker), mask) to fixpoint inside a
    bounded `lax.while_loop`. Requires marker <= mask.
    """
    marker = jnp.minimum(marker.astype(jnp.float32), mask.astype(jnp.float32))
    marker, mask = lax.optimization_barrier((marker, mask))

    def cond(state):
        m, prev, i = state
        return jnp.logical_and(i < max_iters, jnp.any(m != prev))

    def body(state):
        m, _, i = state
        new = jnp.minimum(_reduce_rect(m, 3, lax.max), mask)
        return new, m, i + 1

    first = jnp.minimum(_reduce_rect(marker, 3, lax.max), mask)
    out, _, _ = lax.while_loop(cond, body, (first, marker, jnp.int32(1)))
    return out


def binary_close_open_packed(mask: jnp.ndarray, size: int,
                             shape: str = "ellipse") -> jnp.ndarray:
    """closing(size) then opening(size) on (..., H, W) binary masks with
    32 masks bit-packed per int32 plane (ops/pallas_bitpack.py).

    Binary dilate/erode are OR/AND over SE offsets, so the run-decomposed
    reduce runs unchanged on packed planes with bitwise ops — every pass
    touches 1/32nd of the data of the f32 form. Zero pad fill matches
    `binary_erode`'s background border."""
    from .pallas_bitpack import pack_bits, unpack_bits
    se = np.ones((size, size), bool) if shape == "rect" else ellipse_se(size)
    lead = mask.shape[:-2]
    h, w = mask.shape[-2:]
    flat = mask.reshape((-1, h, w))
    b = flat.shape[0]
    p = pack_bits(flat)
    p = _se_run_reduce(p, se, jnp.bitwise_or, 0)    # dilate
    p = _se_run_reduce(p, se, jnp.bitwise_and, 0)   # erode  -> closing
    p = _se_run_reduce(p, se, jnp.bitwise_and, 0)   # erode
    p = _se_run_reduce(p, se, jnp.bitwise_or, 0)    # dilate -> opening
    return unpack_bits(p, b).reshape(lead + (h, w))

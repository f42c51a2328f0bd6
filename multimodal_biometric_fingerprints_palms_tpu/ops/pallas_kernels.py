"""Pallas TPU kernels for the enhancement hot path.

These fuse multi-op stages into single VMEM-resident passes — the XLA
versions materialize HBM intermediates between each conv/elementwise step;
here one grid element = one image held in VMEM (~330 KB at 320x256 f32,
far under the ~16 MB/core budget) and every intermediate lives on-chip.

Kernels:
- ``sauvola_binarize_pallas``: CLAHE'd image -> adaptive-Sauvola binary in
  one pass (box mean + box sqmean + k-map threshold,
  fingerprint_preprocess.py:49-57).
- ``nlm_denoise_pallas_blocked``: full non-local means (h=10, template 7,
  search 21, fingerprint_preprocess.py:36) — dy offsets on the grid, dx
  offsets in a fori+roll loop, accumulators in VMEM scratch.
- ``clahe_pallas``: OpenCV-compatible CLAHE, histograms/CDF/bilinear LUT
  application as in-VMEM one-hot MXU contractions.

Both take (B, H, W) float32 and accept ``interpret=True`` so CPU tests can
validate numerics against the XLA reference implementations.
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

from .pallas_cc import _shift_no_wrap


def _pad_symmetric(x: jnp.ndarray, before: int, after: int,
                   axis: int) -> jnp.ndarray:
    """Symmetric (edge-repeating) pad via static slices + concat — Mosaic
    has no `rev`, so jnp.pad(mode="symmetric") cannot lower in-kernel."""
    size = x.shape[axis]

    def row(i):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + 1)
        return x[tuple(sl)]

    pieces = [row(before - 1 - k) for k in range(before)]
    pieces.append(x)
    pieces += [row(size - 1 - k) for k in range(after)]
    return jnp.concatenate(pieces, axis=axis)


def _window_sum_1d(p: jnp.ndarray, out_len: int, size: int,
                   axis: int) -> jnp.ndarray:
    """Sliding-window sum of width `size` over a pre-padded array via a
    doubling tree: O(log size) adds instead of size-1 (24 adds for the
    Sauvola win=25 box overflowed Mosaic's scoped-VMEM stack)."""
    def sl(arr, start, length):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(start, start + length)
        return arr[tuple(idx)]

    # power sums: pows[k][i] = sum p[i : i + 2^k]
    pows = [p]
    w = 1
    while w * 2 <= size:
        prev = pows[-1]
        n = prev.shape[axis] - w
        pows.append(sl(prev, 0, n) + sl(prev, w, n))
        w *= 2

    out = None
    off = 0
    rem = size
    k = len(pows) - 1
    while rem > 0:
        w = 1 << k
        if rem >= w:
            piece = sl(pows[k], off, out_len)
            out = piece if out is None else out + piece
            off += w
            rem -= w
        k -= 1
    return out


def _box_sum_same(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable box sum with symmetric (scipy reflect) borders, on values."""
    r = size // 2
    ax_h = x.ndim - 2
    ax_w = x.ndim - 1
    p = _pad_symmetric(x, r, size - 1 - r, ax_h)
    acc = _window_sum_1d(p, x.shape[ax_h], size, ax_h)
    p = _pad_symmetric(acc, r, size - 1 - r, ax_w)
    return _window_sum_1d(p, x.shape[ax_w], size, ax_w)


def _sauvola_kernel(img_ref, out_ref, *, win: int, k: float):
    x = img_ref[0]
    n = float(win * win)
    mean = _box_sum_same(x, win) / n
    sqmean = _box_sum_same(x * x, win) / n
    std = jnp.sqrt(jnp.clip(sqmean - mean * mean, 0.0, None))
    std_n = std / (jnp.max(std) + 1e-6)
    k_map = k * (1.0 - 0.5 * std_n)
    sauv = mean * (1.0 - k_map * (1.0 - std / (mean + 1e-6)))
    out_ref[0] = (x < sauv).astype(jnp.float32)


def sauvola_binarize_pallas(img: jnp.ndarray, win: int = 25, k: float = 0.25,
                            interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) [0,1] -> (B, H, W) {0,1} adaptive-Sauvola binary."""
    b, h, w = img.shape
    kern = functools.partial(_sauvola_kernel, win=win, k=k)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(img.astype(jnp.float32))


def _box_band(n: int, t: int):
    """(n, n) banded box-sum matrix with symmetric border folds, built from
    iotas in-kernel: (M @ x)[i] = sum_{|j-i|<=t} x[sym(j)]."""
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    band = (jnp.abs(r - c) <= t).astype(jnp.float32)
    # symmetric reflection folds: out-of-range taps j<0 map to -1-j,
    # j>=n map to 2n-1-j
    lo = (r + c <= t - 1).astype(jnp.float32)
    hi = (r + c >= 2 * n - 1 - t).astype(jnp.float32)
    return (band + lo + hi).astype(jnp.bfloat16)


def _nlm_kernel_blocked(img_ref, strip_ref, out_ref, acc_ref, wacc_ref, *,
                        h_param: float, template: int, search: int,
                        bf16: bool):
    """One grid step = one (image, dy) pair: the dy row-offset comes from
    the grid (so only the 21 dx offsets unroll — the 441-offset full unroll
    compiled too slowly in Mosaic), the dy-shifted strip arrives via its
    BlockSpec (Mosaic cannot prove 8-alignment of an in-kernel dynamic
    sublane slice), the dx shifts are static lane slices, and the weighted
    accumulators persist in VMEM scratch across the dy steps of each
    image."""
    dy = pl.program_id(1)
    x = img_ref[0]
    hh, ww = x.shape
    hn2 = (h_param / 255.0) ** 2
    dt = jnp.bfloat16 if bf16 else jnp.float32
    inv = jnp.float32(-1.0 / hn2 / float(template * template))

    @pl.when(dy == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wacc_ref[:] = jnp.zeros_like(wacc_ref)

    xc = x.astype(dt)
    strip = strip_ref[0, 0]                    # (H, W+2r), already dtype dt

    # Template box sums as banded MXU matmuls (B_h @ diff^2 @ B_w): the
    # 8-add log-tree per offset was ~40% of the kernel's VPU issue; the MXU
    # is otherwise idle here and overlaps the elementwise work. f32
    # accumulation (matching ops.denoise.nlm_denoise's f32 box).
    t_r = template // 2
    mm_dt = dt
    prec = (None if bf16 else lax.Precision.HIGHEST)
    b_h = _box_band(hh, t_r).astype(mm_dt)
    b_w = _box_band(ww, t_r).astype(mm_dt)

    # Static dx slices beat dynamic rolls by ~1.5x (86 vs 131 ms/batch128).
    acc = acc_ref[:]
    wacc = wacc_ref[:]
    inv_f = jnp.float32(inv)
    for dx in range(search):
        shifted = strip[:, dx:dx + ww]
        diff = xc - shifted
        dsq = (diff * diff).astype(mm_dt)
        tmp = lax.dot_general(b_h, dsq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
        d2 = lax.dot_general(tmp.astype(mm_dt), b_w,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
        wgt = jnp.exp(d2 * inv_f).astype(dt)
        acc = acc + (wgt * shifted).astype(jnp.float32)
        wacc = wacc + wgt.astype(jnp.float32)
    acc_ref[:] = acc
    wacc_ref[:] = wacc

    @pl.when(dy == search - 1)
    def _():
        out_ref[0] = acc_ref[:] / jnp.maximum(wacc_ref[:], 1e-8)


def nlm_denoise_pallas_blocked(img: jnp.ndarray, h: float = 10.0,
                               template: int = 7, search: int = 21,
                               precision: str = "bf16",
                               interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) [0,1] non-local means — offset-blocked VMEM kernel.

    Matches `ops.denoise.nlm_denoise` (same border semantics: the search
    shifts read a reflect-padded image, the template box uses symmetric
    padding). precision="bf16" computes per-offset SSDs/weights in bfloat16
    with f32 accumulation, like the XLA default path.
    """
    b, hh, ww = img.shape
    r = search // 2
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    x = img.astype(jnp.float32)
    # (B, search, H, W+2r) dy-shifted strips in the compute dtype, built
    # with static XLA slices (in-kernel dynamic sublane slices need
    # 8-alignment Mosaic cannot prove).
    pad = jnp.pad(x.astype(dt), [(0, 0), (r, r), (r, r)], mode="reflect")
    strips = jnp.stack([pad[:, d:d + hh, :] for d in range(search)], axis=1)
    wp = ww + 2 * r
    kern = functools.partial(_nlm_kernel_blocked, h_param=h,
                             template=template, search=search,
                             bf16=precision == "bf16")
    return pl.pallas_call(
        kern,
        grid=(b, search),
        in_specs=[
            pl.BlockSpec((1, hh, ww), lambda i, d: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hh, wp), lambda i, d: (i, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hh, ww), lambda i, d: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hh, ww), jnp.float32),
            pltpu.VMEM((hh, ww), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, strips)


def _nlm_kernel_sym(img_ref, strip_ref, out_ref, wout_ref, macc_ref,
                    mwacc_ref, acc_ref, wacc_ref, *, h_param: float,
                    template: int, search: int, bf16: bool):
    """Symmetric-pair NLM: grid step d handles direct offsets dy = d - r
    (dy in [-r..0], all 21 dx) AND their mirrors (-dy, -dx). In the
    interior the mirror's patch SSD is bit-identical to the direct one
    (dsq_{-o}(q) == dsq_o(q - o) as values, and the banded box matmuls sum
    the same 49 products in the same order), so each banded-matmul SSD —
    the MXU wall of the blocked kernel — is computed ONCE per pair. Mirror
    contributions are lane-shifted by -dx in-kernel and written as per-step
    planes; the caller row-shifts them by -dy (a static XLA slice per
    step), masks them to the interior ring, and recomputes the border ring
    directly (`_nlm_mirror_band`)."""
    d = pl.program_id(1)
    r = search // 2
    nsteps = r + 1
    x = img_ref[0]
    hh, ww = x.shape
    hn2 = (h_param / 255.0) ** 2
    dt = jnp.bfloat16 if bf16 else jnp.float32
    inv_f = jnp.float32(-1.0 / hn2 / float(template * template))

    @pl.when(d == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wacc_ref[:] = jnp.zeros_like(wacc_ref)

    xc = x.astype(dt)
    strip = strip_ref[0, 0]                    # (H, W+2r), dtype dt

    t_r = template // 2
    mm_dt = dt
    prec = (None if bf16 else lax.Precision.HIGHEST)
    b_h = _box_band(hh, t_r).astype(mm_dt)
    b_w = _box_band(ww, t_r).astype(mm_dt)

    last = jnp.float32(d == nsteps - 1)        # dy == 0 on the last step
    acc = acc_ref[:]
    wacc = wacc_ref[:]
    m_a = jnp.zeros((hh, ww), jnp.float32)
    m_w = jnp.zeros((hh, ww), jnp.float32)
    for dxi in range(search):
        dx = dxi - r
        shifted = strip[:, dxi:dxi + ww]
        diff = xc - shifted
        dsq = (diff * diff).astype(mm_dt)
        tmp = lax.dot_general(b_h, dsq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
        d2 = lax.dot_general(tmp.astype(mm_dt), b_w,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
        wgt = jnp.exp(d2 * inv_f).astype(dt)
        # direct (dy, dx): all dx when dy < 0; only dx <= 0 when dy == 0
        sd = 1.0 - last if dx > 0 else jnp.float32(1.0)
        acc = acc + sd * (wgt * shifted).astype(jnp.float32)
        wacc = wacc + sd * wgt.astype(jnp.float32)
        # mirror (-dy, -dx): all dx when dy < 0; only dx < 0 when dy == 0
        sm = 1.0 - last if dx >= 0 else jnp.float32(1.0)
        t_w = sm * wgt.astype(jnp.float32)
        m_a = m_a + _shift_no_wrap((t_w * xc.astype(jnp.float32)),
                                   -dx, 1, 0.0)
        m_w = m_w + _shift_no_wrap(t_w, -dx, 1, 0.0)
    acc_ref[:] = acc
    wacc_ref[:] = wacc
    macc_ref[0, 0] = m_a
    mwacc_ref[0, 0] = m_w

    @pl.when(d == nsteps - 1)
    def _():
        out_ref[0] = acc_ref[:]
        wout_ref[0] = wacc_ref[:]


def _nlm_mirror_band(xc, padx, slab, hh: int, ww: int, h_param: float,
                     template: int, search: int, dt):
    """Direct evaluation of the MIRROR-half offsets ((dy > 0, any dx) and
    (dy == 0, dx > 0)) on one border slab of destination pixels, with the
    same banded-matmul box (expanded-slab + crop, so box folds only apply
    at true image borders) — bit-identical weights to the full-frame form.
    slab = (a, b, c0, c1) destination rows/cols. Returns (acc, wacc) of
    shape (..., b-a, c1-c0)."""

    def _box_sum_shift(v, size, box_dt):
        """Separable box SUM, symmetric borders, as fused shift-adds with
        f32 accumulation and a box_dt round between axes — the slab shapes
        are too small for MXU-tiled matmuls (a batched (22,268) einsum pads
        to 128-tiles at ~3% utilization and dominated the whole op)."""
        c = size // 2

        def axis_pass(u, ax):
            pad_spec = [(0, 0)] * u.ndim
            pad_spec[ax] = (c, size - 1 - c)
            p = jnp.pad(u, pad_spec, mode="symmetric")
            n = u.shape[ax]
            out = None
            for t in range(size):
                sl = [slice(None)] * u.ndim
                sl[ax] = slice(t, t + n)
                piece = p[tuple(sl)].astype(jnp.float32)
                out = piece if out is None else out + piece
            return out

        tmp = axis_pass(v, v.ndim - 2).astype(box_dt)
        return axis_pass(tmp, v.ndim - 1)

    a, b, c0, c1 = slab
    r = search // 2
    hn2 = (h_param / 255.0) ** 2
    inv_f = jnp.float32(-1.0 / hn2 / float(template * template))
    e0 = 3 if a > 0 else 0
    e1 = 3 if b < hh else 0
    f0 = 3 if c0 > 0 else 0
    f1 = 3 if c1 < ww else 0
    x_exp = xc[..., a - e0:b + e1, c0 - f0:c1 + f1]
    # source rows for q_y + dy, dy in [0..r]: padx rows a-e0+r .. b+e1+2r
    strip_rows = padx[..., a - e0 + r:b + e1 + 2 * r, :]
    acc = jnp.zeros(xc.shape[:-2] + (b - a, c1 - c0), jnp.float32)
    wacc = jnp.zeros_like(acc)
    for dy in range(0, r + 1):
        row_src = strip_rows[..., dy:dy + (b + e1) - (a - e0), :]
        # all 21 dx offsets stacked on a batch axis: ONE batched banded
        # matmul per axis instead of 21 small dispatches (the per-offset
        # form was dominated by XLA matmul dispatch latency)
        sh_all = jnp.stack(
            [row_src[..., :, c0 - f0 + r + dx:c1 + f1 + r + dx]
             for dx in range(-r, r + 1)], axis=-3)
        dsq = ((x_exp[..., None, :, :].astype(dt) - sh_all) ** 2).astype(dt)
        d2 = _box_sum_shift(dsq, template, dt)
        d2q = d2[..., e0:e0 + (b - a), f0:f0 + (c1 - c0)]
        wgt = jnp.exp(d2q * inv_f).astype(dt)
        sh_q = sh_all[..., e0:e0 + (b - a), f0:f0 + (c1 - c0)]
        if dy == 0:
            keep = (jnp.arange(2 * r + 1) > r).astype(jnp.float32)
            keep = keep[:, None, None]
        else:
            keep = jnp.float32(1.0)
        acc = acc + jnp.sum(
            keep * (wgt * sh_q).astype(jnp.float32), axis=-3)
        wacc = wacc + jnp.sum(keep * wgt.astype(jnp.float32), axis=-3)
    return acc, wacc


def _nlm_sym_planes_small(img: jnp.ndarray, h: float = 10.0,
                          template: int = 7, search: int = 21,
                          precision: str = "bf16",
                          interpret: bool = False) -> jnp.ndarray:
    """Small-shape symmetric-pair NLM (dy-paired, mirror planes in HBM,
    XLA slab ring). Superseded on production shapes by the dx-paired
    scratch-mirror kernel (`nlm_denoise_pallas_sym`), which needs
    h, w >= 2*(search//2 + 3) for its disjoint border bands; this path
    keeps arbitrary tiny shapes (tests, odd crops) bit-correct."""
    b, hh, ww = img.shape
    r = search // 2
    ring = r + 3                  # mirror-valid destination margin
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    x = img.astype(jnp.float32)
    xc = x.astype(dt)
    padx = jnp.pad(xc, [(0, 0), (r, r), (r, r)], mode="reflect")
    nsteps = r + 1
    strips = jnp.stack([padx[:, d:d + hh, :] for d in range(nsteps)], axis=1)
    wp = ww + 2 * r
    kern = functools.partial(_nlm_kernel_sym, h_param=h, template=template,
                             search=search, bf16=precision == "bf16")
    acc, wacc, m_a, m_w = pl.pallas_call(
        kern,
        grid=(b, nsteps),
        in_specs=[
            pl.BlockSpec((1, hh, ww), lambda i, d: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hh, wp), lambda i, d: (i, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hh, ww), lambda i, d: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hh, ww), lambda i, d: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hh, ww), lambda i, d: (i, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hh, ww), lambda i, d: (i, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((b, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((b, nsteps, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((b, nsteps, hh, ww), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hh, ww), jnp.float32),
            pltpu.VMEM((hh, ww), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, strips)

    # mirror planes: step d's mirror offset is (r - d, -dx); the dx shift
    # happened in-kernel, the row shift (down by r - d) is a static slice
    # of the top-zero-padded plane.  m_p[:, d, d:d+hh] rows = plane shifted
    # down by r - d.
    m_ap = jnp.pad(m_a, [(0, 0), (0, 0), (r, 0), (0, 0)])
    m_wp = jnp.pad(m_w, [(0, 0), (0, 0), (r, 0), (0, 0)])
    msum_a = sum(m_ap[:, d, d:d + hh, :] for d in range(nsteps))
    msum_w = sum(m_wp[:, d, d:d + hh, :] for d in range(nsteps))

    rows = jnp.arange(hh)[:, None]
    cols = jnp.arange(ww)[None, :]
    interior = ((rows >= ring) & (rows < hh - ring)
                & (cols >= ring) & (cols < ww - ring))
    acc = acc + jnp.where(interior, msum_a, 0.0)
    wacc = wacc + jnp.where(interior, msum_w, 0.0)

    # border ring: recompute the mirror half directly on four slabs
    top = (0, min(ring, hh), 0, ww)
    bot_a = max(hh - ring, min(ring, hh))
    bot = (bot_a, hh, 0, ww)
    mid0, mid1 = min(ring, hh), max(hh - ring, min(ring, hh))
    slabs = [top, bot]
    if mid1 > mid0 and ww > 2 * ring:
        slabs.append((mid0, mid1, 0, min(ring, ww)))
        slabs.append((mid0, mid1, max(ww - ring, ring), ww))
    elif mid1 > mid0:
        slabs.append((mid0, mid1, 0, ww))
    for slab in slabs:
        a_, b_, c0_, c1_ = slab
        if b_ <= a_ or c1_ <= c0_:
            continue
        sa, sw = _nlm_mirror_band(xc, padx, slab, hh, ww, h, template,
                                  search, dt)
        acc = acc.at[:, a_:b_, c0_:c1_].add(sa)
        wacc = wacc.at[:, a_:b_, c0_:c1_].add(sw)
    return acc / jnp.maximum(wacc, 1e-8)


def _shift_lanes_dyn(v: jnp.ndarray, s, fill: float) -> jnp.ndarray:
    """out[c] = v[c - s] with dynamic s <= 0 (lane roll + edge mask).
    Dynamic lane rotates need 32-bit data and 128-aligned lane counts —
    v is f32 and production widths are 256/320-padded."""
    size = v.shape[-1]
    idx = lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    rolled = pltpu.roll(v, size + s, axis=v.ndim - 1)
    return jnp.where(idx >= size + s, fill, rolled)


def _nlm_kernel_sym2(img_ref, strip_ref, acc_out, wacc_out,
                     acc_ref, wacc_ref, macc_ref, mwacc_ref, *,
                     h_param: float, template: int, search: int, bf16: bool):
    """dx-paired symmetric NLM: grid step d handles direct offsets
    dx = d - r (dx in [-r..0], all 21 dy) AND their mirrors (-dy, -dx).
    The mirror contribution msum[q] = plane_o[q - o] is accumulated in
    VMEM scratch — the row part of the shift (dy) is STATIC (dy is the
    unrolled loop), the lane part (dx = d - r) is ONE dynamic lane roll
    per grid step — so no mirror planes ever touch HBM (the dy-paired
    variant wrote 2x(B,11,H,W) f32 planes, ~1.8 GB round-trip per
    batch-128). Mirror terms are masked to the interior box in-kernel;
    the border ring is recomputed by `_nlm_ring_pallas`."""
    d = pl.program_id(1)
    r = search // 2
    ndx = r + 1
    x = img_ref[0]
    hh, ww = x.shape
    hn2 = (h_param / 255.0) ** 2
    dt = jnp.bfloat16 if bf16 else jnp.float32
    inv_f = jnp.float32(-1.0 / hn2 / float(template * template))
    f32 = jnp.float32

    @pl.when(d == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wacc_ref[:] = jnp.zeros_like(wacc_ref)
        macc_ref[:] = jnp.zeros_like(macc_ref)
        mwacc_ref[:] = jnp.zeros_like(mwacc_ref)

    xc = x.astype(dt)
    strip = strip_ref[0, 0]                    # (H+2r, W), dtype dt

    t_r = template // 2
    mm_dt = dt
    prec = (None if bf16 else lax.Precision.HIGHEST)
    b_h = _box_band(hh, t_r).astype(mm_dt)
    b_w = _box_band(ww, t_r).astype(mm_dt)

    last = jnp.float32(d == ndx - 1)           # dx == 0 on the last step
    acc = acc_ref[:]
    wacc = wacc_ref[:]
    # Offsets excluded on the LAST step (dx == 0: direct (dy>0, 0) is the
    # mirror of (-dy, 0), and (0, 0) has no mirror) accumulate into
    # separate *_x planes scaled ONCE by (1 - last) per grid step — the
    # per-offset sd/sm scalar multiplies were ~4 VPU plane-ops per dy.
    acc_x = jnp.zeros((hh, ww), f32)
    wacc_x = jnp.zeros((hh, ww), f32)
    sv = jnp.zeros((hh, ww), f32)
    sw = jnp.zeros((hh, ww), f32)
    sv_x = jnp.zeros((hh, ww), f32)
    sw_x = jnp.zeros((hh, ww), f32)
    for dyi in range(search):
        dy = dyi - r
        shifted = strip[dyi:dyi + hh, :]
        diff = xc - shifted
        dsq = (diff * diff).astype(mm_dt)
        tmp = lax.dot_general(b_h, dsq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
        d2 = lax.dot_general(tmp.astype(mm_dt), b_w,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
        wgt = jnp.exp(d2 * inv_f).astype(dt)
        val = (wgt * shifted).astype(f32)
        wv = wgt.astype(f32)                   # shared direct/mirror weight
        # direct (dy, dx): all dy when dx < 0; only dy <= 0 when dx == 0
        if dy <= 0:
            acc = acc + val
            wacc = wacc + wv
        else:
            acc_x = acc_x + val
            wacc_x = wacc_x + wv
        # mirror (-dy, -dx): all dy when dx < 0; only dy < 0 when dx == 0.
        # Mirror transport is a BARE circular roll: wrapped rows land
        # within |dy| <= r < ring of the border, and the final interior
        # mask (ring = r + 3) zeroes the whole band — the edge-fill
        # select of _shift_no_wrap was pure overhead here.
        pv = (wgt * xc).astype(f32)
        if dy < 0:
            sv = sv + pltpu.roll(pv, hh + dy, 0)
            sw = sw + pltpu.roll(wv, hh + dy, 0)
        elif dy == 0:
            sv_x = sv_x + pv
            sw_x = sw_x + wv
        else:
            sv_x = sv_x + pltpu.roll(pv, dy, 0)
            sw_x = sw_x + pltpu.roll(wv, dy, 0)
    keep = 1.0 - last
    acc_ref[:] = acc + keep * acc_x
    wacc_ref[:] = wacc + keep * wacc_x
    sv = sv + keep * sv_x
    sw = sw + keep * sw_x
    # dynamic lane roll, same bare-roll argument (|dx| <= r < ring)
    dx_dyn = d - (ndx - 1)                     # <= 0
    macc = macc_ref[:] + pltpu.roll(sv, ww + dx_dyn, axis=1)
    mwacc = mwacc_ref[:] + pltpu.roll(sw, ww + dx_dyn, axis=1)
    macc_ref[:] = macc
    mwacc_ref[:] = mwacc

    @pl.when(d == ndx - 1)
    def _():
        ring = r + 3
        rows_i = lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
        cols_i = lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
        interior = ((rows_i >= ring) & (rows_i < hh - ring)
                    & (cols_i >= ring) & (cols_i < ww - ring))
        acc_out[0] = acc_ref[:] + jnp.where(interior, macc, 0.0)
        wacc_out[0] = wacc_ref[:] + jnp.where(interior, mwacc, 0.0)


def _box7_up_f32(v: jnp.ndarray) -> jnp.ndarray:
    """out[i] = sum_{t=0..6} v[i+t] over sublanes, f32 accumulation
    (log-tree; matches the banded-matmul box to f32 rounding)."""
    p1 = v.astype(jnp.float32)
    p2 = p1 + _shift_no_wrap(p1, -1, 0, 0.0)
    p4 = p2 + _shift_no_wrap(p2, -2, 0, 0.0)
    return (p4 + _shift_no_wrap(p2, -4, 0, 0.0)
            + _shift_no_wrap(p1, -6, 0, 0.0))


def _nlm_ring_kernel(xband_ref, top_ref, bot_ref, acc_out, wacc_out, *,
                     h_param: float, template: int, search: int,
                     dxs: tuple, keep_thresh: int, lane_first: bool,
                     bf16: bool, wl: int, rofs: tuple):
    """Border-band mirror-half recompute for the dx-paired sym kernel.

    One grid step = one image; the 40-row offset bands (3 symmetric fold
    rows + 16 top data rows + 16 bottom data rows + 3 folds + 2 zeros) are
    assembled IN-KERNEL from two 40-row border blocks of the reflect-
    padded frame via static sublane slices — the previous design
    pre-assembled one 40-row slab per (substep, row offset) host-side,
    and that XLA concat graph cost ~5 ms/call at batch 128, more than the
    kernel itself. Lane offsets run as a static per-dx roll of the whole
    stacked band tensor; per-dx contributions accumulate positionally and
    the per-offset-block sums collapse once at the end. `lane_first`
    applies the lane-dim template box before the sublane box, preserving
    the oracle's rows-then-cols rounding order when the caller hands a
    transposed frame. An offset block g at lane offset dx contributes iff
    dx > 0 or g > keep_thresh — the mirror-half rule for both frames."""
    hn2 = (h_param / 255.0) ** 2
    dt = jnp.bfloat16 if bf16 else jnp.float32
    inv_f = jnp.float32(-1.0 / hn2 / float(template * template))
    f32 = jnp.float32
    t_r = template // 2
    pp = search // 2 + t_r
    prec = (None if bf16 else lax.Precision.HIGHEST)

    top = top_ref[0].astype(f32)          # (40, wpad): xpad rows [0, 40)
    bot = bot_ref[0].astype(f32)          # (40, wpad): xpad rows [-40, 0)
    wpad = top.shape[1]
    z2 = jnp.zeros((2, wpad), f32)
    base = 24 - pp                        # bot idx of xpad row pp+hh-16
    bands = []
    for ro in rofs:
        bands.append(top[pp + 2 + ro:pp + 3 + ro])
        bands.append(top[pp + 1 + ro:pp + 2 + ro])
        bands.append(top[pp + ro:pp + 1 + ro])
        bands.append(top[pp + ro:pp + ro + 16])
        bands.append(bot[base + ro:base + ro + 16])
        bands.append(bot[base + ro + 15:base + ro + 16])
        bands.append(bot[base + ro + 14:base + ro + 15])
        bands.append(bot[base + ro + 13:base + ro + 14])
        bands.append(z2)
    A = jnp.concatenate(bands, axis=0)    # (40*len(rofs), wpad) f32

    xb = xband_ref[0]                     # (40, wl), dt
    nro = len(rofs)
    n = 40 * nro
    xs = jnp.concatenate([xb] * nro, axis=0).astype(dt)
    b_w = _box_band(wl, t_r).astype(dt)

    # Mosaic forbids captured array constants: build the dest/keep masks
    # from iota. destm marks the 13+13 dest rows of each 40-row block;
    # the dx<=0 variant additionally requires block index g > keep_thresh.
    ridx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    br = ridx - (ridx // 40) * 40
    gidx = ridx // 40
    destm = jnp.logical_or(jnp.logical_and(br >= 3, br < 16),
                           jnp.logical_and(br >= 22, br < 35)).astype(f32)
    gk = (gidx > keep_thresh).astype(f32)
    pen_all = (1.0 - destm) * jnp.float32(1e9)
    pen_keep = (1.0 - destm * gk) * jnp.float32(1e9)

    acc = jnp.zeros((n, wl), f32)
    wacc = jnp.zeros((n, wl), f32)
    for dx in dxs:
        sh = _shift_no_wrap(A, -dx, 1, 0.0)[:, pp:pp + wl].astype(dt)
        diff = xs - sh
        dsq = (diff * diff).astype(dt)
        if lane_first:
            tmp = lax.dot_general(dsq, b_w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
            d2 = _box7_up_f32(tmp.astype(dt))
        else:
            tmp = _box7_up_f32(dsq).astype(dt)
            d2 = lax.dot_general(tmp, b_w, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        # d2 for dest p sits 3 block-rows above p's value row: realign
        # BEFORE the exp (cross-block bleed lands on masked rows). The
        # dest mask and the per-(block, dx) keep rule are baked in as an
        # additive penalty (exp of a huge negative -> exact 0).
        d2sh = _shift_no_wrap(d2, 3, 0, 0.0)
        pen = pen_all if dx > 0 else pen_keep
        wsh = jnp.exp((d2sh + pen) * inv_f).astype(dt)
        acc = acc + (wsh * sh).astype(f32)
        wacc = wacc + wsh.astype(f32)

    racc = jnp.zeros((40, wl), f32)
    rwacc = jnp.zeros((40, wl), f32)
    for g in range(nro):
        racc = racc + acc[40 * g:40 * (g + 1)]
        rwacc = rwacc + wacc[40 * g:40 * (g + 1)]
    acc_out[0] = racc
    wacc_out[0] = rwacc


def _nlm_ring_pallas(xc: jnp.ndarray, h: float, template: int, search: int,
                     dt, mode: str, interpret: bool):
    """Mirror-half ring sums for the first/last 13 rows of a frame.

    xc: (B, H, W) in the compute dtype — the ORIGINAL image frame for both
    modes. mode="rows": offsets sweep dy in [-r..r] on the sublane axis,
    dx in [0..r] on lanes, mirror set {dx>0} | {dx=0, dy>0}; corrects the
    top/bottom 13 rows. mode="cols": the kernel sees 27-column border
    strips TRANSPOSED (only the strips are transposed — transposing the
    full frame cost ~2.7 ms/batch-128), offsets sweep the original dx in
    [0..r] on sublanes and dy in [-r..r] on lanes, and the box order is
    swapped so the original row box still runs first; corrects the
    left/right 13 columns. Returns (acc, wacc): (B, 40, wl) f32 with dest
    rows at [3:16] (first band) and [22:35] (last band) of the frame."""
    b, hh, ww = xc.shape
    r = search // 2
    t_r = template // 2
    pp = r + t_r
    # band geometry: 16-row data blocks + 3 fold rows must fit the two
    # 40-row border blocks for every |ro| <= r
    assert pp + r + 16 <= 40 and pp - r >= 3, (search, template)
    ns = 40 - pp                             # border strip depth
    if mode == "rows":
        wl = ww
        topsrc = xc[:, :ns, :]
        botsrc = xc[:, hh - ns:, :]
        rofs = tuple(range(-r, r + 1))
        dxs = tuple(range(0, r + 1))
        keep_thresh = r
        lane_first = False
    else:
        wl = hh
        topsrc = jnp.swapaxes(xc[:, :, :ns], 1, 2)
        botsrc = jnp.swapaxes(xc[:, :, ww - ns:], 1, 2)
        rofs = tuple(range(0, r + 1))
        dxs = tuple(range(-r, r + 1))
        keep_thresh = 0
        lane_first = True
    wpad = -(-(wl + 2 * pp) // 128) * 128
    top = jnp.pad(topsrc, [(0, 0), (pp, 0), (pp, pp)], mode="reflect")
    bot = jnp.pad(botsrc, [(0, 0), (0, pp), (pp, pp)], mode="reflect")
    top = jnp.pad(top, [(0, 0), (0, 0), (0, wpad - (wl + 2 * pp))])
    bot = jnp.pad(bot, [(0, 0), (0, 0), (0, wpad - (wl + 2 * pp))])
    zx = jnp.zeros((b, 2, wl), dt)
    xband = jnp.concatenate(
        [topsrc[:, 2:3], topsrc[:, 1:2], topsrc[:, 0:1], topsrc[:, 0:16],
         botsrc[:, ns - 16:], botsrc[:, ns - 1:], botsrc[:, ns - 2:ns - 1],
         botsrc[:, ns - 3:ns - 2], zx], axis=1)
    kern = functools.partial(
        _nlm_ring_kernel, h_param=h, template=template, search=search,
        dxs=dxs, keep_thresh=keep_thresh, lane_first=lane_first,
        bf16=dt == jnp.bfloat16, wl=wl, rofs=rofs)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 40, wl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 40, wpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 40, wpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 40, wl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 40, wl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 40, wl), jnp.float32),
            jax.ShapeDtypeStruct((b, 40, wl), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xband, top, bot)



def nlm_denoise_pallas_sym(img: jnp.ndarray, h: float = 10.0,
                           template: int = 7, search: int = 21,
                           precision: str = "bf16",
                           interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) [0,1] non-local means with symmetric-pair SSD reuse.

    Same math as `ops.denoise.nlm_denoise` (cv2.fastNlMeansDenoising
    semantics, fingerprint_preprocess.py:36) up to f32 accumulation ORDER:
    every per-offset weight and value is bit-identical (the mirror SSD
    identity dsq_{-o}(q) == dsq_o(q-o) is exact, including bf16 rounding,
    wherever both template windows are interior; the 13-px border ring is
    recomputed directly by `_nlm_ring_pallas` band kernels), but direct/
    mirror terms accumulate in a different order, so results drift by a
    few 1e-6 from the canonical-order forms. Halves the banded-matmul SSD
    work — the MXU wall of `nlm_denoise_pallas_blocked` — and keeps the
    mirror transport entirely in VMEM (the earlier dy-paired variant
    round-tripped ~1.8 GB of mirror planes through HBM per batch-128 and
    needed an XLA ring that cost more than the kernel saved)."""
    b, hh, ww = img.shape
    r = search // 2
    ring = r + 3
    if hh < 2 * ring + 1 or ww < 2 * ring + 1:
        # the ring kernel's 27-deep border strips need >= 27 rows/cols
        return _nlm_sym_planes_small(img, h, template, search, precision,
                                     interpret)
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    x = img.astype(jnp.float32)
    xc = x.astype(dt)
    padx = jnp.pad(xc, [(0, 0), (r, r), (r, r)], mode="reflect")
    ndx = r + 1
    # strips[d] = reflect-padded rows, cols [d, d+W) — the dx = d - r
    # column offset is baked into the strip so in-kernel dy slices stay
    # static (sublane) and aligned-free.
    strips = jnp.stack([padx[:, :, d:d + ww] for d in range(ndx)], axis=1)
    kern = functools.partial(_nlm_kernel_sym2, h_param=h, template=template,
                             search=search, bf16=precision == "bf16")
    hp = hh + 2 * r
    acc, wacc = pl.pallas_call(
        kern,
        grid=(b, ndx),
        in_specs=[
            pl.BlockSpec((1, hh, ww), lambda i, d: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, ww), lambda i, d: (i, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hh, ww), lambda i, d: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hh, ww), lambda i, d: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((b, hh, ww), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hh, ww), jnp.float32),
            pltpu.VMEM((hh, ww), jnp.float32),
            pltpu.VMEM((hh, ww), jnp.float32),
            pltpu.VMEM((hh, ww), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, strips)

    # Border ring: first/last 13 rows at full width from the row-frame
    # band kernel; left/right 13-col strips (corner rows excluded) from
    # the transposed frame. Assembled by concat into ONE full-frame
    # correction per accumulator (eight .at[].add slices each forced a
    # full-array copy).
    racc, rwacc = _nlm_ring_pallas(xc, h, template, search, dt, "rows",
                                   interpret)
    cacc, cwacc = _nlm_ring_pallas(xc, h, template, search, dt, "cols",
                                   interpret)
    midz = jnp.zeros((b, hh - 26, ww - 26), jnp.float32)

    def assemble(rows_corr, cols_corr):
        left = jnp.swapaxes(cols_corr[:, 3:16, 13:hh - 13], 1, 2)
        right = jnp.swapaxes(cols_corr[:, 22:35, 13:hh - 13], 1, 2)
        mid = jnp.concatenate([left, midz, right], axis=2)
        return jnp.concatenate(
            [rows_corr[:, 3:16], mid, rows_corr[:, 22:35]], axis=1)

    acc = acc + assemble(racc, cacc)
    wacc = wacc + assemble(rwacc, cwacc)
    return acc / jnp.maximum(wacc, 1e-8)


# ---------------------------------------------------------------------------
# CLAHE.
#
# The XLA clahe (ops/histogram.py) materializes (B, tiles, pixels, 256)
# one-hot tensors in HBM for both the tile histograms and the 4-corner LUT
# application — ~50 ms/call at batch 128, and the chain calls it three
# times. Here one grid element = one image: per 8-row chunk the bin one-hot
# (256, W) is built in registers and contracted on the MXU against a
# tile-selector to accumulate the (256 bins, tiles) histogram; clip/
# redistribute/CDF run on that (256, G*G) tile matrix (CDF = triangular
# matmul); the bilinear 4-corner LUT application contracts the same one-hot
# against corner-selected LUT columns. Everything stays in VMEM.
# ---------------------------------------------------------------------------


def _binarize_fused_kernel(img_ref, out_ref, count_ref, lab_ref, sizes_ref,
                           bin2_ref, hist_ref, *,
                           h: int, w: int, win: int, k: float, patch: int,
                           min_size: int, max_size: int, cc_iters: int):
    """The whole binarize stage after CLAHE as one VMEM pass
    (fingerprint_preprocess.py:49-81): adaptive Sauvola -> per-patch Otsu
    OR-refinement -> small-object/hole cleanup (keyed CC relax + size
    histograms) -> 3x3 ellipse open -> erode marker -> geodesic
    reconstruction as marker reachability."""
    from .pallas_cc import _label_relax, _relax_and_sizes

    f32 = jnp.float32
    # --- adaptive Sauvola + per-patch Otsu OR-refinement
    # (fingerprint_preprocess.py:49-71; helpers shared with the split
    # variant below) ---
    _binarize_front(img_ref, bin2_ref, hist_ref, h=h, w=w, win=win, k=k,
                    patch=patch)
    binary = jnp.maximum(_sauvola_front(img_ref, h=h, w=w, win=win, k=k),
                         bin2_ref[:])

    # --- cleanup: remove_small_objects(min_size) + remove_small_holes ---
    fg = binary > 0.5
    _, sizes = _relax_and_sizes(fg, h, w, 1, cc_iters,
                                count_ref, lab_ref, sizes_ref)
    kept = jnp.logical_and(fg, sizes >= float(min_size))
    inv = jnp.logical_not(kept)
    _, sizes2 = _relax_and_sizes(inv, h, w, 1, cc_iters,
                                 count_ref, lab_ref, sizes_ref)
    cleaned = jnp.logical_or(kept,
                             jnp.logical_and(inv, sizes2 < float(max_size)))

    # --- 3x3 ellipse (cross) open + erode marker (:76-79) ---
    def cross_reduce(m, op, fill):
        best = m
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            s = _shift01(m, dy, dx, fill)
            best = op(best, s)
        return best

    cf = cleaned.astype(f32)
    er = cross_reduce(cf, jnp.minimum, 0.0)
    opened = cross_reduce(er, jnp.maximum, 0.0)
    marker = cross_reduce(opened, jnp.minimum, 0.0)

    # --- reconstruction as marker reachability (:79-81) ---
    ofg = opened > 0.5
    rows_i = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols_i = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lin1 = rows_i * w + cols_i + 1
    label0 = jnp.where(jnp.logical_and(marker > 0.5, ofg), 0, lin1)
    vreach = _label_relax(ofg, h, w, 2, cc_iters, label0=label0)
    out_ref[0] = jnp.where(jnp.logical_and(ofg, vreach == 0.0), 1.0, 0.0)


def _shift01(m, dy: int, dx: int, fill: float):
    """Static 2-D shift with fill (shared by the fused binarize kernel)."""
    from .pallas_cc import _shift_no_wrap
    s = m
    if dy != 0:
        s = _shift_no_wrap(s, dy, 0, fill)
    if dx != 0:
        s = _shift_no_wrap(s, dx, 1, fill)
    return s


def _binarize_fg_kernel(img_ref, out_ref, bin2_ref, hist_ref, *,
                        h: int, w: int, win: int, k: float, patch: int):
    """Sauvola + patch-Otsu foreground only — no CC work. The object filter
    runs after this as the packed-reach split (remove_small_split_pallas),
    so the main ridge network's slow relax happens 32 images per int32
    plane instead of per image."""
    _binarize_front(img_ref, bin2_ref, hist_ref, h=h, w=w, win=win, k=k,
                    patch=patch)
    out_ref[0] = jnp.maximum(_sauvola_front(img_ref, h=h, w=w, win=win, k=k),
                             bin2_ref[:])


def _sauvola_front(img_ref, *, h: int, w: int, win: int, k: float):
    x = img_ref[0]
    n = float(win * win)
    mean = _box_sum_same(x, win) / n
    sqmean = _box_sum_same(x * x, win) / n
    std = jnp.sqrt(jnp.clip(sqmean - mean * mean, 0.0, None))
    std_n = std / (jnp.max(std) + 1e-6)
    k_map = k * (1.0 - 0.5 * std_n)
    sauv = mean * (1.0 - k_map * (1.0 - std / (mean + 1e-6)))
    return (x < sauv).astype(jnp.float32)


def _binarize_front(img_ref, bin2_ref, hist_ref, *, h: int, w: int,
                    win: int, k: float, patch: int):
    """Patch-Otsu OR-refinement rows into bin2_ref (shared by the fused and
    the split binarize kernels)."""
    f32 = jnp.float32
    gh, gw = h // patch, w // patch
    # The hist scratch is padded to a multiple of 8 rows; run the Otsu math
    # on all padded rows (they are zero -> thr/ok land unused defaults).
    np_tiles = hist_ref.shape[0]
    bins_iota = lax.broadcasted_iota(jnp.int32, (256, w), 0).astype(f32)
    col_iota = lax.broadcasted_iota(jnp.int32, (gw, w), 1)
    q_iota = lax.broadcasted_iota(jnp.int32, (gw, w), 0)
    selp = (q_iota == col_iota // patch).astype(jnp.bfloat16)

    hist_ref[:] = jnp.zeros_like(hist_ref)

    def hist_chunk(c, _):
        rows = jnp.clip(jnp.round(img_ref[0, pl.ds(c * 8, 8), :] * 255.0),
                        0.0, 255.0)
        ty = (c * 8) // patch
        sumoh = jnp.zeros((256, w), jnp.bfloat16)
        for kk in range(8):
            sumoh = sumoh + (bins_iota == rows[kk:kk + 1, :]).astype(
                jnp.bfloat16)
        band = lax.dot_general(selp, sumoh, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
        hist_ref[pl.ds(ty * gw, gw), :] = (
            hist_ref[pl.ds(ty * gw, gw), :] + band)
        return _

    lax.fori_loop(0, h // 8, hist_chunk, None)

    hist = hist_ref[:]
    area = float(patch * patch)
    p = hist / area
    bins_row = lax.broadcasted_iota(jnp.int32, (np_tiles, 256), 1).astype(f32)
    r_iota = lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    c_iota = lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    up = (r_iota <= c_iota).astype(f32)
    omega = lax.dot_general(p, up, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    mu = lax.dot_general(p * bins_row, up, (((1,), (0,)), ((), ())),
                         preferred_element_type=f32)
    mu_t = mu[:, -1:]
    denom = omega * (1.0 - omega)
    sigma_b = jnp.where(denom > 1e-8,
                        (mu_t * omega - mu) ** 2 / jnp.maximum(denom, 1e-8),
                        0.0)
    smax = jnp.max(sigma_b, axis=-1, keepdims=True)
    first = jnp.min(jnp.where(sigma_b == smax, bins_row, 256.0), axis=-1,
                    keepdims=True)
    thr = first / 255.0
    e1 = mu_t / 255.0
    e2 = jnp.sum(p * (bins_row / 255.0) ** 2, axis=-1, keepdims=True)
    p_std = jnp.sqrt(jnp.maximum(e2 - e1 * e1, 0.0))
    refine_ok = (p_std >= 3.0 / 255.0).astype(f32)

    zpad = jnp.zeros((hist.shape[0], 254), f32)
    hist_ref[:] = jnp.concatenate([thr, refine_ok, zpad], axis=1)

    selp_f = selp.astype(f32)

    def refine_chunk(c, _):
        ty = (c * 8) // patch
        band = hist_ref[pl.ds(ty * gw, gw), :]
        thr_band = band[:, 0:1]
        ok_band = band[:, 1:2]
        thr_cols = jnp.sum(selp_f * thr_band, axis=0, keepdims=True)
        ok_cols = jnp.sum(selp_f * ok_band, axis=0, keepdims=True)
        xr = img_ref[0, pl.ds(c * 8, 8), :]
        ref_rows = ((xr < thr_cols) & (ok_cols > 0.5)).astype(f32)
        bin2_ref[pl.ds(c * 8, 8), :] = ref_rows
        return _

    lax.fori_loop(0, h // 8, refine_chunk, None)


def _binarize_phase2_kernel(kept_ref, reach1_ref, reach2_ref, out_ref,
                            count_ref, lab_ref, sizes_ref, *,
                            h: int, w: int, max_size: int, cc_iters: int):
    """Hole fill (split exactness logic, see pallas_cc._fill_holes_split_
    kernel; reach1/reach2 arrive as packed int32 planes, bit i % 32 of
    plane i // 32). TWO canonical components are pre-resolved packed: the
    border-connected background (reach1) and — because after hull
    segmentation the outside-of-hull area is dark, so Sauvola marks it
    foreground and WALLS the valley network off from the border — the
    center-seeded component of what the border reach missed (reach2, the
    17k-47k px/image valley network that otherwise relaxes per image, the
    pipeline's single most expensive relax). Both get closed-form popcount
    fill decisions; only genuine small interior holes relax per image.
    The open/erode/reconstruction tail runs bit-packed afterwards
    (pallas_bitpack.open_erode_reconstruct_packed)."""
    from .pallas_cc import _all_components_below, _relax_and_sizes

    kept = kept_ref[0] > 0.5
    bit = (pl.program_id(0) % 32).astype(jnp.int32)
    reach1 = (lax.shift_right_logical(reach1_ref[0], bit) & 1) > 0
    reach2 = (lax.shift_right_logical(reach2_ref[0], bit) & 1) > 0
    inv = jnp.logical_not(kept)
    interior = jnp.logical_and(inv, jnp.logical_not(reach1))
    remnant = jnp.logical_and(interior, jnp.logical_not(reach2))
    # sliding-window fast path (see pallas_cc._all_components_below): no
    # max_size x max_size window of the non-canonical background reaches
    # max_size pixels -> every component of it is below max_size
    fill_all = _all_components_below(remnant, h, w, max_size)
    relax_mask = jnp.logical_and(remnant, jnp.logical_not(fill_all))

    # Runtime skip on fast-path hits (see pallas_cc._fill_holes_split_
    # kernel): the relax + table phases only execute when some interior
    # hole might exceed max_size; stale sizes_ref values are masked out by
    # the relax_mask AND below.
    @pl.when(jnp.logical_not(fill_all))
    def _run_relax():
        _relax_and_sizes(relax_mask, h, w, 1, cc_iters,
                         count_ref, lab_ref, sizes_ref, remnant=True)

    sizes2 = sizes_ref[:]
    fill = jnp.logical_and(relax_mask, sizes2 < float(max_size))
    fill = jnp.logical_or(fill, jnp.logical_and(remnant, fill_all))
    # canonical components: closed-form size = popcount (reach2 is grown
    # from a single seed so it is exactly one component)
    npix2 = jnp.sum(reach2.astype(jnp.float32))
    fill = jnp.logical_or(
        fill, jnp.logical_and(reach2, npix2 < float(max_size)))
    npix = jnp.sum(reach1.astype(jnp.float32))
    fill = jnp.logical_or(
        fill, jnp.logical_and(reach1, npix < float(max_size)))
    out_ref[0] = jnp.logical_or(kept, fill).astype(jnp.float32)


def binarize_fused_split_pallas(img_eq: jnp.ndarray, win: int = 25,
                                k: float = 0.25, patch: int = 32,
                                min_size: int = 80, max_size: int = 150,
                                cc_iters: int = 512,
                                interpret: bool = False) -> jnp.ndarray:
    """enhance.binarize after CLAHE, same result as binarize_fused_pallas,
    split around bit-packed reachability passes: phase 1a (per image)
    Sauvola+Otsu foreground -> packed center-seeded reach + per-image
    remnant relax for the small-object filter (the main ridge network is
    the slow fg relax; it runs 32 images/plane) -> packed border reach of
    the inverted mask (the border-connected valley background is the
    pipeline's slowest relaxation) -> phase 2 (per image) interior-hole
    fill -> packed open/erode/reconstruction tail (pure bitwise)."""
    from .pallas_cc import (_rle_nhi, _RLE_LO, remove_small_split2_pallas,
                            center_seed)
    from .pallas_bitpack import (border_reach_packed, reach_packed,
                                 unpack_bits, open_erode_reconstruct_packed)

    lead = img_eq.shape[:-2]
    h, w = img_eq.shape[-2:]
    assert h % 8 == 0 and h % patch == 0 and w % patch == 0, (h, w)
    b = 1
    for d in lead:
        b *= d
    nhi = _rle_nhi(h, w)
    np_tiles = (h // patch) * (w // patch)
    npt = -(-np_tiles // 8) * 8
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    k1 = functools.partial(_binarize_fg_kernel, h=h, w=w, win=win, k=k,
                           patch=patch)
    fg = pl.pallas_call(
        k1,
        grid=(b,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32),
                        pltpu.VMEM((npt, 256), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(img_eq.reshape(b, h, w).astype(jnp.float32))

    # two-plane objects filter: the border-touching Sauvola ring AND the
    # center-seeded ridge network both resolve bit-packed; only true
    # specks relax per image (see pallas_cc._split2_kernel)
    kept = remove_small_split2_pallas(fg > 0.5, min_size, connectivity=1,
                                      max_iters=cc_iters,
                                      interpret=interpret).astype(jnp.float32)

    inv = kept < 0.5
    reach1 = border_reach_packed(inv, connectivity=1,
                                 max_iters=cc_iters,
                                 interpret=interpret, packed=True,
                                 union=False)
    # second canonical seed: the hull segmentation leaves the outside-of-
    # hull area dark, Sauvola marks it foreground, and the valley network
    # is walled off from the border — reach1 absorbs (almost) nothing and
    # the whole valley would relax per image. Resolve it packed instead,
    # seeded at the interior background pixel nearest the image center.
    interior = jnp.logical_and(inv, jnp.logical_not(
        unpack_bits(reach1, b).reshape(b, h, w)))
    reach2 = reach_packed(interior, center_seed(interior), connectivity=1,
                          max_iters=cc_iters, interpret=interpret,
                          packed=True)

    k2 = functools.partial(_binarize_phase2_kernel, h=h, w=w,
                           max_size=max_size, cc_iters=cc_iters)
    pspec = pl.BlockSpec((1, h, w), lambda i: (i // 32, 0, 0),
                         memory_space=pltpu.VMEM)
    cleaned = pl.pallas_call(
        k2,
        grid=(b,),
        in_specs=[spec, pspec, pspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nhi, _RLE_LO), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(kept, reach1, reach2)
    out = open_erode_reconstruct_packed(cleaned > 0.5, max_iters=cc_iters,
                                        interpret=interpret)
    return out.reshape(img_eq.shape)


def binarize_fused_pallas(img_eq: jnp.ndarray, win: int = 25, k: float = 0.25,
                          patch: int = 32, min_size: int = 80,
                          max_size: int = 150, cc_iters: int = 512,
                          interpret: bool = False) -> jnp.ndarray:
    """Everything in enhance.binarize AFTER the CLAHE call, as one kernel.
    img_eq: (..., H, W) [0,1] on the u8 grid. Returns a boolean ridge mask."""
    lead = img_eq.shape[:-2]
    h, w = img_eq.shape[-2:]
    assert h % 8 == 0 and h % patch == 0 and w % patch == 0, (h, w)
    b = 1
    for d in lead:
        b *= d
    from .pallas_cc import _rle_nhi, _RLE_LO
    nhi = _rle_nhi(h, w)
    np_tiles = (h // patch) * (w // patch)
    npt = -(-np_tiles // 8) * 8
    kern = functools.partial(_binarize_fused_kernel, h=h, w=w, win=win, k=k,
                             patch=patch, min_size=min_size,
                             max_size=max_size, cc_iters=cc_iters)
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
                        pltpu.VMEM((h, w), jnp.float32),
                        pltpu.VMEM((h, w), jnp.float32),
                        pltpu.VMEM((npt, 256), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(img_eq.reshape(b, h, w).astype(jnp.float32))
    return (out > 0.5).reshape(img_eq.shape)


def _clahe_kernel_v2(v_ref, out_ref, hist_ref, lut_ref, mxw_ref, *,
                     h: int, w: int, grid: int, clip_limit: float):
    """CLAHE v2: transposed (tiles, bins) histogram with ONE band matmul per
    8-row chunk (the chunk's 8 one-hots sum first — counts are what's
    needed), and ONE (nt, 256) @ (256, w) matmul per row in the apply phase
    (P[t, x] = lut_t[v[x]] for every tile at once) blended with a sparse
    4-corner weight mask. ~5x fewer matmul dispatches than the per-row
    4-corner form (small Mosaic matmuls are latency-bound). Requires
    grid == 8 so tile-band rows are 8-aligned dynamic slices."""
    # The apply phase slices a 24-row LUT band at a*grid with a clamped to
    # grid-3 and reads mxw_ref[0:24]; in-bounds only when
    # nt >= (grid-3)*grid + 24, i.e. grid >= 8. clahe_pallas routes
    # grid != 8 elsewhere — enforce the contract for any direct caller.
    assert grid == 8, f"_clahe_kernel_v2 requires grid == 8, got {grid}"
    th = h // grid
    tw = w // grid
    tile_area = th * tw
    nt = grid * grid

    f32 = jnp.float32
    bins_iota = lax.broadcasted_iota(jnp.int32, (256, w), 0).astype(f32)
    col_iota = lax.broadcasted_iota(jnp.int32, (256, w), 1)
    tx_of_col = (col_iota // tw).astype(f32)[0:1, :]            # (1, w)
    # SEL8[q, x] = 1 if column x belongs to tile column q
    q_iota8 = lax.broadcasted_iota(jnp.int32, (grid, w), 0).astype(f32)
    sel8 = (q_iota8 == jnp.broadcast_to(tx_of_col, (grid, w))
            ).astype(jnp.bfloat16)

    hist_ref[:] = jnp.zeros((nt, 256), f32)

    bins_iota8h = lax.broadcasted_iota(jnp.int32, (256, 8 * w), 0).astype(f32)
    sub8h = lax.broadcasted_iota(jnp.int32, (8, w), 0)
    sel8_8 = jnp.concatenate([sel8] * 8, axis=1)                # (grid, 8w)

    def accum_chunk(c, _):
        rows = v_ref[0, pl.ds(c * 8, 8), :]                     # (8, w)
        ty = (c * 8) // th
        # lane-blocked one-hot of the whole chunk: ONE compare + ONE matmul
        # instead of 8 compares + 7 bf16 adds (masked sums: sliced rows
        # keep their sublane offset; mixed-offset lane concat is rejected)
        rows_cat = jnp.concatenate(
            [jnp.sum(jnp.where(sub8h == k, rows, 0.0), axis=0, keepdims=True)
             for k in range(8)], axis=1)                        # (1, 8w)
        oh8 = (bins_iota8h == rows_cat).astype(jnp.bfloat16)    # (256, 8w)
        band = lax.dot_general(
            sel8_8, oh8, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                          # (grid, 256)
        hist_ref[pl.ds(ty * grid, grid), :] = (
            hist_ref[pl.ds(ty * grid, grid), :] + band)
        return _

    lax.fori_loop(0, h // 8, accum_chunk, None)

    # Clip + even redistribution (OpenCV truncates the limit to int).
    limit = max(float(int(clip_limit * tile_area / 256.0)), 1.0)
    hist = hist_ref[:]
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / 256.0

    # CDF along bins as an upper-triangular matmul; LUT in [0, 255].
    r_iota = lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    c_iota = lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    up = (r_iota <= c_iota).astype(f32)                          # (b_in, b_out)
    cdf = lax.dot_general(hist, up, (((1,), (0,)), ((), ())),
                          preferred_element_type=f32)
    scale = 255.0 / tile_area
    lut_ref[:] = jnp.clip(jnp.round(cdf * scale), 0.0, 255.0)    # (nt, 256)

    # Constant x-side blend mask: MXW[t, x] = wx weight of tile column
    # (t % grid) at pixel column x (zero unless t%grid is x0 or x1).
    xx = col_iota.astype(f32)[0:1, :] / tw - 0.5
    x0 = jnp.clip(jnp.floor(xx), 0.0, grid - 1.0)
    x1 = jnp.minimum(x0 + 1.0, grid - 1.0)
    wx1 = jnp.clip(xx - jnp.floor(xx), 0.0, 1.0)
    wx1 = jnp.where(xx < 0, 0.0, jnp.where(xx > grid - 1, 1.0, wx1))
    t_iota = lax.broadcasted_iota(jnp.int32, (nt, w), 0)
    txt = (t_iota % grid).astype(f32)                            # (nt, w)
    tyt = (t_iota // grid).astype(f32)
    mxw_ref[:] = ((txt == x0) * (1.0 - wx1) + (txt == x1) * wx1)

    # Apply phase: ONE (24, 256) @ (256, 8w) matmul per 8-row chunk. The
    # old per-row form (8 small LUT matmuls per chunk, 320 per image) was
    # latency-bound — the window slice that cut its MACs 4x didn't move the
    # clock at all. Here the 8 rows' one-hots are laid out in lane blocks
    # (column k*w+x = row k, pixel x), and the bilinear y-window of an
    # 8-row chunk spans at most 3 tile rows (8 rows < tile height), so a
    # 24-row 8-aligned LUT slice covers every row of the chunk; per-lane
    # y-weights select each lane block's own tile rows.
    mxw24 = jnp.concatenate([mxw_ref[0:24, :]] * 8, axis=1)  # (24, 8w)
    bins_iota8 = lax.broadcasted_iota(jnp.int32, (256, 8 * w), 0).astype(f32)
    lane_k = (lax.broadcasted_iota(jnp.int32, (1, 8 * w), 1) // w).astype(f32)
    sub8 = lax.broadcasted_iota(jnp.int32, (8, w), 0)
    tyt24 = (lax.broadcasted_iota(jnp.int32, (24, 8 * w), 0) // grid
             ).astype(f32)

    def apply_chunk(c, _):
        rows = v_ref[0, pl.ds(c * 8, 8), :]
        # (1, 8w) lane-blocked row values (masked sums: sliced rows keep
        # their sublane offset and Mosaic rejects mixed-offset lane concat)
        rows_cat = jnp.concatenate(
            [jnp.sum(jnp.where(sub8 == k, rows, 0.0), axis=0, keepdims=True)
             for k in range(8)], axis=1)
        oh8 = (bins_iota8 == rows_cat).astype(jnp.bfloat16)    # (256, 8w)

        yy = ((c * 8).astype(f32) + lane_k) / th - 0.5          # (1, 8w)
        y0 = jnp.clip(jnp.floor(yy), 0.0, grid - 1.0)
        y1 = jnp.minimum(y0 + 1.0, grid - 1.0)
        wy1 = jnp.clip(yy - jnp.floor(yy), 0.0, 1.0)
        wy1 = jnp.where(yy < 0, 0.0, jnp.where(yy > grid - 1, 1.0, wy1))
        # window start: first row's y0, clamped so [a, a+2] stays in range
        yy0 = (c * 8).astype(f32) / th - 0.5
        a = jnp.clip(jnp.floor(yy0), 0.0, grid - 3.0)

        lut_win = lut_ref[pl.ds(a.astype(jnp.int32) * grid, 24),
                          :].astype(jnp.bfloat16)
        p24 = lax.dot_general(
            lut_win, oh8, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                          # (24, 8w)
        ty = a + tyt24
        w24 = ((ty == y0) * (1.0 - wy1) + (ty == y1) * wy1) * mxw24
        flat = jnp.sum(w24 * p24, axis=0, keepdims=True)         # (1, 8w)
        out_ref[0, pl.ds(c * 8, 8), :] = jnp.concatenate(
            [flat[:, k * w:(k + 1) * w] for k in range(8)], axis=0)
        return _

    lax.fori_loop(0, h // 8, apply_chunk, None)


def _clahe_kernel(v_ref, out_ref, hist_ref, *, h: int, w: int, grid: int,
                  clip_limit: float):
    th = h // grid
    tw = w // grid
    tile_area = th * tw
    nt = grid * grid

    bins_iota = lax.broadcasted_iota(jnp.int32, (256, w), 0).astype(
        jnp.float32)
    col_iota = lax.broadcasted_iota(jnp.int32, (256, w), 1)
    tx_of_col = (col_iota // tw).astype(jnp.float32)[0:1, :]   # (1, w)
    t_iota = lax.broadcasted_iota(jnp.int32, (nt, w), 0).astype(jnp.float32)

    hist_ref[:] = jnp.zeros((256, nt), jnp.float32)

    def row_onehot(row):                                # (1, w) u8-as-f32
        return (bins_iota == row).astype(jnp.bfloat16)  # (256, w)

    def accum_chunk(c, _):
        rows = v_ref[0, pl.ds(c * 8, 8), :]
        ty = ((c * 8) // th).astype(jnp.float32)        # chunk within 1 tile row
        sel = (t_iota == ty * grid + tx_of_col).astype(jnp.bfloat16)
        acc = hist_ref[:]
        for k in range(8):
            oh = row_onehot(rows[k:k + 1, :])
            acc = acc + lax.dot_general(
                oh, sel, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (256, nt)
        hist_ref[:] = acc
        return _

    lax.fori_loop(0, h // 8, accum_chunk, None)

    # Clip + even redistribution (OpenCV truncates the limit to int).
    limit = max(float(int(clip_limit * tile_area / 256.0)), 1.0)
    hist = hist_ref[:]
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=0, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / 256.0

    # CDF over bins as a lower-triangular matmul; LUT in [0, 255].
    r_iota = lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    c_iota = lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    tri = (r_iota >= c_iota).astype(jnp.float32)        # (bins_out, bins_in)
    cdf = lax.dot_general(tri, hist, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    scale = 255.0 / tile_area
    lut = jnp.clip(jnp.round(cdf * scale), 0.0, 255.0)  # (256, nt)

    # Bilinear blend between tile-center LUTs (OpenCV convention).
    xx = (col_iota.astype(jnp.float32)[0:1, :] + 0.0) / tw - 0.5
    x0 = jnp.clip(jnp.floor(xx), 0.0, grid - 1.0)
    x1 = jnp.minimum(x0 + 1.0, grid - 1.0)
    wx1 = jnp.clip(xx - jnp.floor(xx), 0.0, 1.0)
    wx1 = jnp.where(xx < 0, 0.0, jnp.where(xx > grid - 1, 1.0, wx1))
    t64_iota = lax.broadcasted_iota(jnp.int32, (nt, w), 0).astype(jnp.float32)

    def apply_chunk(c, _):
        rows = v_ref[0, pl.ds(c * 8, 8), :]
        out_rows = []
        for k in range(8):
            # c is traced: per-row tile coords/weights as jnp scalars
            yy = (c * 8 + k).astype(jnp.float32) / th - 0.5
            y0 = jnp.clip(jnp.floor(yy), 0.0, grid - 1.0)
            y1 = jnp.minimum(y0 + 1.0, grid - 1.0)
            wy1 = jnp.clip(yy - jnp.floor(yy), 0.0, 1.0)
            wy1 = jnp.where(yy < 0, 0.0,
                            jnp.where(yy > grid - 1, 1.0, wy1))
            oh = row_onehot(rows[k:k + 1, :]).astype(jnp.float32)
            acc = jnp.zeros((1, w), jnp.float32)
            for ty_a, w_y in ((y0, 1.0 - wy1), (y1, wy1)):
                for tx_c, w_x in ((x0, 1.0 - wx1), (x1, wx1)):
                    g_sel = (t64_iota == ty_a * grid + tx_c).astype(
                        jnp.float32)                     # (nt, w)
                    l_cols = lax.dot_general(
                        lut, g_sel, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (256, w)
                    val = jnp.sum(oh * l_cols, axis=0, keepdims=True)
                    acc = acc + w_y * w_x * val
            out_rows.append(acc)
        out_ref[0, pl.ds(c * 8, 8), :] = jnp.concatenate(out_rows, axis=0)
        return _

    lax.fori_loop(0, h // 8, apply_chunk, None)


def clahe_pallas(x: jnp.ndarray, clip_limit: float = 2.5, grid: int = 8,
                 interpret: bool = False) -> jnp.ndarray:
    """(..., H, W) [0,1] -> CLAHE'd [0,1]; matches ops.histogram.clahe.
    Requires H, W divisible by grid and tile height divisible by 8."""
    import math as _math  # noqa: F401  (math used in kernel via closure)
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    th = h // grid
    assert h % grid == 0 and w % grid == 0 and th % 8 == 0, (h, w, grid)
    b = 1
    for d in lead:
        b *= d
    v = jnp.clip(jnp.round(x.astype(jnp.float32) * 255.0), 0, 255)
    if grid == 8:
        kern = functools.partial(_clahe_kernel_v2, h=h, w=w, grid=grid,
                                 clip_limit=clip_limit)
        scratch = [pltpu.VMEM((grid * grid, 256), jnp.float32),
                   pltpu.VMEM((grid * grid, 256), jnp.float32),
                   pltpu.VMEM((grid * grid, w), jnp.float32)]
    else:
        kern = functools.partial(_clahe_kernel, h=h, w=w, grid=grid,
                                 clip_limit=clip_limit)
        scratch = [pltpu.VMEM((256, grid * grid), jnp.float32)]
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(v.reshape(b, h, w))
    return jnp.clip(out.reshape(x.shape) / 255.0, 0.0, 1.0)

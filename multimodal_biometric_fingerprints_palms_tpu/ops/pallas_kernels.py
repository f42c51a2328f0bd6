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
    inv = jnp.asarray(-1.0 / hn2 / float(template * template), dt)

    @pl.when(dy == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wacc_ref[:] = jnp.zeros_like(wacc_ref)

    xc = x.astype(dt)
    strip = strip_ref[0, 0]                    # (H, W+2r), already dtype dt

    # Static dx slices beat dynamic rolls by ~1.5x (86 vs 131 ms/batch128);
    # the log-tree box sums keep the unrolled footprint inside the raised
    # scoped-VMEM limit (the 12-add box form needed 52 MB and OOMed).
    acc = acc_ref[:]
    wacc = wacc_ref[:]
    for dx in range(search):
        shifted = strip[:, dx:dx + ww]
        diff = xc - shifted
        d2 = _box_sum_same(diff * diff, template)
        wgt = jnp.exp(d2 * inv)
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
    kern = functools.partial(_clahe_kernel, h=h, w=w, grid=grid,
                             clip_limit=clip_limit)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((256, grid * grid), jnp.float32)],
        interpret=interpret,
    )(v.reshape(b, h, w))
    return jnp.clip(out.reshape(x.shape) / 255.0, 0.0, 1.0)

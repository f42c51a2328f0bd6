"""Histogram ops: percentile stretch, Otsu thresholding, CLAHE.

TPU-native replacements for cv2.createCLAHE (fingerprint_preprocess.py:25-29,
46-47, 97-98) and skimage.threshold_otsu (fingerprint_preprocess.py:68, 100).

Design: histograms are one-hot bf16 contractions on the MXU (exact f32
counts; scatter-adds are sort-based and several times slower on TPU), and
CLAHE's bilinear LUT application is likewise matmul-shaped. Quantiles come
from histograms instead of per-image sorts (exact for u8-grid data).
Images are float32 in [0, 1] throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NBINS = 256


def _to_u8(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float -> integer bin index 0..255."""
    return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.int32)


def histogram256(values: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-row 256-bin histogram. values: (..., N) int32 in [0,255].

    Returns (..., 256) float32 counts. Computed as a nibble-decomposed
    one-hot bf16 contraction on the MXU: with hi = v >> 4 and lo = v & 15,
    count[hi, lo] = sum_n onehot16(hi_n) * onehot16(lo_n) — one (N,16) x
    (N,16) matmul per row instead of a (N,256) one-hot reduction. Exact
    for unweighted counts and for 0/1 mask weights (one-hot entries are
    0/1, f32 accumulation); fractional weights would round to bf16 when
    folded into the one-hot factor, so pass only 0/1 masks as weights.
    The materialized
    one-hots shrink 8x (two 16-wide instead of one 256-wide) — histograms
    here are HBM-bound, not MAC-bound. Scatter-adds, the obvious
    formulation, are sort-based and several times slower on TPU.
    """
    lead = values.shape[:-1]
    n = values.shape[-1]
    b = 1
    for d in lead:
        b *= d
    v = values.reshape(b, n)
    oh_hi = jax.nn.one_hot(v >> 4, 16, dtype=jnp.bfloat16)
    oh_lo = jax.nn.one_hot(v & 15, 16, dtype=jnp.bfloat16)
    if weights is not None:
        # fold the weights into one factor; 0/1 mask weights stay exact
        oh_hi = oh_hi * weights.reshape(b, n).astype(jnp.bfloat16)[..., None]
    hist = jnp.einsum("bnh,bnl->bhl", oh_hi, oh_lo,
                      preferred_element_type=jnp.float32)
    return hist.reshape(lead + (NBINS,))


def _quantile_from_hist(hist: jnp.ndarray, qs, n: int) -> jnp.ndarray:
    """np.percentile('linear') from per-row histograms.

    hist: (..., NBINS) counts of values on a known bin grid; returns
    (..., len(qs)) bin-index-valued quantiles (float, interpolated).
    Exact when the data sits on the bin grid (u8 images); replaces the
    per-image O(n log n) sort (~hundreds of ms per batch on TPU) with one
    histogram + a 256-wide comparison.
    """
    cum = jnp.cumsum(hist, axis=-1)                      # (..., NBINS)
    qs = jnp.asarray(qs, dtype=jnp.float32)
    v = (n - 1) * qs / 100.0                             # virtual order stats
    k0 = jnp.floor(v)
    k1 = jnp.ceil(v)

    def order_stat(k):
        # value of the k-th (0-based) order statistic: first bin with cum > k
        return jnp.sum((cum[..., None, :] <= k[..., None]).astype(jnp.float32),
                       axis=-1)

    lo = order_stat(k0)
    hi = order_stat(k1)
    return lo + (v - k0) * (hi - lo)


def quantiles_bisect(x: jnp.ndarray, qs, iters: int = 24,
                     snap_u8: bool = False) -> jnp.ndarray:
    """np.percentile('linear') over the trailing two dims by bisection on
    the VALUE axis: each order statistic is located with ``iters``
    count(x <= mid) compare-reduce passes (pure VPU work), instead of a
    one-hot histogram contraction (MXU matmuls over #bins columns).
    log2(bins) cheap passes beat one pass over all bins: at iters=24 the
    error is range * 2^-24, far below the 2048-bin histogram this replaces,
    for ~1/10th the time (measured batch 128 @ 320x256).

    Returns (..., len(qs)).
    """
    from jax import lax
    lead = x.shape[:-2]
    n = x.shape[-2] * x.shape[-1]
    xb = x.reshape(lead + (1, n))
    # accept scalar q like np.percentile (shape-polymorphic API)
    qs = jnp.atleast_1d(jnp.asarray(qs, dtype=jnp.float32))
    nq = qs.shape[0]
    v = (n - 1) * qs / 100.0                      # virtual order stats
    k0 = jnp.floor(v)
    # targets: the k0-th and ceil-th order statistics for every quantile
    ks = jnp.concatenate([k0, jnp.ceil(v)])       # (2Q,)
    thresh = ks + 1.0                             # count needed to cover k-th

    xmin = jnp.min(xb, axis=-1)                   # (..., 1)
    xmax = jnp.max(xb, axis=-1)
    span = xmax - xmin
    lo0 = jnp.broadcast_to(xmin - span * 1e-3 - 1e-12,
                           lead + (2 * nq,))
    hi0 = jnp.broadcast_to(xmax, lead + (2 * nq,))

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((xb <= mid[..., None]).astype(jnp.float32), axis=-1)
        covered = cnt >= thresh                   # k-th order stat <= mid
        return jnp.where(covered, lo, mid), jnp.where(covered, mid, hi)

    _, hi = lax.fori_loop(0, iters, body, (lo0, hi0))
    if snap_u8:
        # order-stat values sit on the 1/255 grid; after `iters` halvings
        # the bracket is far inside half a grid step, so rounding recovers
        # the exact order statistics before interpolation
        hi = jnp.round(hi * 255.0) / 255.0
    lo_stat = hi[..., :nq]
    hi_stat = hi[..., nq:]
    return lo_stat + (v - k0) * (hi_stat - lo_stat)


def quantiles_u8(x: jnp.ndarray, qs) -> jnp.ndarray:
    """Exact np.percentile over trailing two dims for u8-grid data in [0,1].
    Returns (..., len(qs)) in [0,1].

    Bisection on the quantized values with the order statistics snapped
    back to the 1/255 grid — exact for 8-bit-valued data, no histogram.
    """
    xq = _to_u8(x).astype(jnp.float32) / 255.0
    return quantiles_bisect(xq, qs, iters=16, snap_u8=True)


def quantiles_approx(x: jnp.ndarray, qs, bins: int = 1024) -> jnp.ndarray:
    """Approximate quantiles over trailing two dims for continuous data.

    Kept for API compatibility; now routed through `quantiles_bisect`,
    whose error (range * 2^-24) is far below any histogram binning this
    function ever used."""
    del bins
    return quantiles_bisect(x, qs, iters=24)


def percentile_stretch(x: jnp.ndarray, p_low: float = 0.5, p_high: float = 99.5,
                       axes: tuple[int, ...] = (-2, -1)) -> jnp.ndarray:
    """Percentile contrast stretch to [0,1]
    (reference normalize_image, fingerprint_preprocess.py:20).

    Input images are uint8-valued (the reference loads 8-bit files), so the
    percentiles are computed exactly from a 256-bin histogram instead of a
    per-image sort. Inputs are quantized through the u8 grid first — the
    reference operates on uint8 anyway.
    """
    xq = _to_u8(x).astype(jnp.float32) / 255.0
    q = quantiles_u8(xq, jnp.asarray([p_low, p_high]))
    lo = q[..., 0][..., None, None]
    hi = q[..., 1][..., None, None]
    return jnp.clip((xq - lo) / jnp.maximum(hi - lo, 1e-8), 0.0, 1.0)


def _otsu_from_hist(hist: jnp.ndarray) -> jnp.ndarray:
    """Otsu threshold (bin index, float) from (..., 256) histograms.

    Vectorized inter-class-variance argmax; returns the bin value such that
    foreground = pixels with value > threshold (skimage convention).
    """
    p = hist / jnp.maximum(jnp.sum(hist, axis=-1, keepdims=True), 1e-8)
    bins = jnp.arange(NBINS, dtype=jnp.float32)
    omega = jnp.cumsum(p, axis=-1)
    mu = jnp.cumsum(p * bins, axis=-1)
    mu_t = mu[..., -1:]
    denom = omega * (1.0 - omega)
    sigma_b = jnp.where(denom > 1e-8, (mu_t * omega - mu) ** 2 / jnp.maximum(denom, 1e-8), 0.0)
    return jnp.argmax(sigma_b, axis=-1).astype(jnp.float32)


def otsu_threshold(x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Global Otsu threshold in [0,1] over the trailing two dims."""
    lead = x.shape[:-2]
    v = _to_u8(x).reshape(lead + (-1,))
    w = None if mask is None else mask.reshape(lead + (-1,))
    hist = histogram256(v, w)
    return _otsu_from_hist(hist) / 255.0


def otsu_threshold_patchwise(x: jnp.ndarray, patch: int,
                             mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-patch Otsu thresholds over a (patch x patch) grid.

    Replaces the reference's per-32x32-patch Python loop
    (fingerprint_preprocess.py:60-71). x: (..., H, W) with H, W divisible by
    ``patch``. Returns per-pixel thresholds (..., H, W) (each patch constant).
    """
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    gh, gw = h // patch, w // patch
    v = _to_u8(x).reshape(lead + (gh, patch, gw, patch))
    v = jnp.swapaxes(v, -3, -2).reshape(lead + (gh, gw, patch * patch))
    wts = None
    if mask is not None:
        m = mask.reshape(lead + (gh, patch, gw, patch))
        wts = jnp.swapaxes(m, -3, -2).reshape(lead + (gh, gw, patch * patch))
    hist = histogram256(v, wts)
    thr = _otsu_from_hist(hist) / 255.0  # (..., gh, gw)
    thr = jnp.repeat(jnp.repeat(thr, patch, axis=-1), patch, axis=-2)
    return thr


def equalize_hist(x: jnp.ndarray) -> jnp.ndarray:
    """Global histogram equalization over trailing two dims."""
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    v = _to_u8(x).reshape(lead + (-1,))
    hist = histogram256(v)
    cdf = jnp.cumsum(hist, axis=-1)
    cdf = cdf / jnp.maximum(cdf[..., -1:], 1.0)
    flat = jnp.take_along_axis(cdf, v, axis=-1)
    return flat.reshape(lead + (h, w))


def _clahe_apply_matmul(v: jnp.ndarray, lut: jnp.ndarray, grid: int,
                        wy: jnp.ndarray, wx: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 4-corner LUT application as one-hot bf16 matmuls.

    Per-pixel LUT gathers cost ~450 ms/call at batch 128 on TPU; the same
    selection as (pixels-onehot @ tile-LUT) batched matmuls runs ~36 ms.
    Exact: one-hot picks the entry, and LUT values (integers <= 255) are
    exact in bf16. Pixels are grouped by tile QUADRANT, within which the
    four corner tiles are fixed, so every table is a static slice of the
    edge-padded LUT grid.

    v: (B, H, W) int32; lut: (B, grid, grid, 256); wy: (H,); wx: (W,).
    """
    b, h, w = v.shape
    th, tw = h // grid, w // grid
    th2, tw2 = th // 2, tw // 2
    p2 = th2 * tw2

    lutp = jnp.pad(lut, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    # (B, g, 2, th2, g, 2, tw2) -> (B, g, g, qy, qx, th2, tw2)
    vq = v.reshape(b, grid, 2, th2, grid, 2, tw2).transpose(0, 1, 4, 2, 5, 3, 6)
    wy_q = wy.reshape(grid, 2, th2)
    wx_q = wx.reshape(grid, 2, tw2)

    out_quads = []
    for qy in range(2):
        row_quads = []
        for qx in range(2):
            vqq = vq[:, :, :, qy, qx].reshape(b, grid, grid, p2)
            oh = jax.nn.one_hot(vqq, NBINS, dtype=jnp.bfloat16)
            acc = jnp.zeros((b, grid, grid, p2), jnp.float32)
            for a in range(2):
                w_y = wy_q[:, qy, :] if a == 1 else 1.0 - wy_q[:, qy, :]
                for c in range(2):
                    w_x = wx_q[:, qx, :] if c == 1 else 1.0 - wx_q[:, qx, :]
                    table = lutp[:, qy + a:qy + a + grid,
                                 qx + c:qx + c + grid, :].astype(jnp.bfloat16)
                    mapped = jnp.einsum(
                        "bxypv,bxyv->bxyp", oh, table,
                        preferred_element_type=jnp.float32)
                    # (gy, gx, th2, tw2)
                    wgt = w_y[:, None, :, None] * w_x[None, :, None, :]
                    acc = acc + mapped * wgt.reshape(grid, grid, p2)[None]
            row_quads.append(acc.reshape(b, grid, grid, th2, tw2))
        out_quads.append(row_quads)

    # reassemble quadrants -> (B, H, W)
    top = jnp.stack([out_quads[0][0], out_quads[0][1]], axis=4)
    bot = jnp.stack([out_quads[1][0], out_quads[1][1]], axis=4)
    # dims: (b, gy, gx, th2, qx, tw2) stacked over qy at axis 3
    full = jnp.stack([top, bot], axis=3)  # (b, gy, gx, qy, th2, qx, tw2)
    full = full.transpose(0, 1, 3, 4, 2, 5, 6).reshape(b, h, w)
    return full


def clahe(x: jnp.ndarray, clip_limit: float = 2.5, grid: int = 8) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization.

    On TPU, routes to the VMEM-resident Pallas kernel
    (ops.pallas_kernels.clahe_pallas) when the tile shape allows
    (~1.7x the XLA one-hot form and far cheaper to compile).

    OpenCV-compatible algorithm (cv2.createCLAHE(clipLimit, (grid, grid)),
    fingerprint_preprocess.py:25-29): per-tile 256-bin histogram, clip at
    ``clip_limit * tile_area / 256`` with even redistribution of the excess,
    per-tile CDF LUT, then bilinear interpolation between the four
    neighboring tile LUTs at each pixel.

    x: (..., H, W) float32 in [0,1], H and W divisible by ``grid``.
    """
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    th = h // grid
    tw = w // grid
    tile_area = th * tw

    import jax as _jax
    if (_jax.default_backend() == "tpu" and h % grid == 0 and w % grid == 0
            and th % 8 == 0):
        from .pallas_kernels import clahe_pallas
        return clahe_pallas(x, clip_limit, grid)

    v = _to_u8(x)
    tiles = v.reshape(lead + (grid, th, grid, tw))
    tiles = jnp.swapaxes(tiles, -3, -2).reshape(lead + (grid, grid, tile_area))
    hist = histogram256(tiles)  # (..., grid, grid, 256)

    # OpenCV truncates the clip limit to an integer (clahe.cpp):
    # limit = max(int(clipLimit * tileArea / 256), 1).
    limit = max(float(int(clip_limit * tile_area / NBINS)), 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / NBINS

    cdf = jnp.cumsum(hist, axis=-1)
    scale = (NBINS - 1.0) / tile_area
    lut = jnp.clip(jnp.round(cdf * scale), 0, 255)  # (..., grid, grid, 256)

    # Bilinear blend between tile-center LUTs (OpenCV convention:
    # tile coordinate = pixel / tile_size - 0.5).
    yy = jnp.arange(h, dtype=jnp.float32) / th - 0.5
    xx = jnp.arange(w, dtype=jnp.float32) / tw - 0.5
    wy1 = jnp.clip(yy - jnp.floor(yy), 0.0, 1.0)
    wy1 = jnp.where(yy < 0, 0.0, jnp.where(yy > grid - 1, 1.0, wy1))
    wx1 = jnp.clip(xx - jnp.floor(xx), 0.0, 1.0)
    wx1 = jnp.where(xx < 0, 0.0, jnp.where(xx > grid - 1, 1.0, wx1))

    if th % 2 == 0 and tw % 2 == 0:
        # matmul LUT application (see _clahe_apply_matmul)
        b = 1
        for d_ in lead:
            b *= d_
        out = _clahe_apply_matmul(
            v.reshape((b, h, w)), lut.reshape((b, grid, grid, NBINS)),
            grid, wy1, wx1)
        return jnp.clip(out.reshape(lead + (h, w)) / 255.0, 0.0, 1.0)

    # gather fallback for odd tile sizes
    y0 = jnp.clip(jnp.floor(yy), 0, grid - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xx), 0, grid - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, grid - 1)
    x1 = jnp.minimum(x0 + 1, grid - 1)
    wy = wy1[:, None]
    wx = wx1[None, :]

    lut_flat = lut.reshape(lead + (grid * grid * NBINS,))

    def gather(ty, tx):
        idx = (ty[:, None] * grid + tx[None, :]) * NBINS + v  # (..., H, W)
        return jnp.take_along_axis(
            lut_flat, idx.reshape(lead + (-1,)), axis=-1
        ).reshape(lead + (h, w))

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out / 255.0

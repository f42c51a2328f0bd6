"""Pallas TPU kernels for the enhancement hot path.

These fuse multi-op stages into single VMEM-resident passes — the XLA
versions materialize HBM intermediates between each conv/elementwise step;
here one grid element = one image held in VMEM (~330 KB at 320x256 f32,
far under the ~16 MB/core budget) and every intermediate lives on-chip.

Kernels:
- ``sauvola_binarize_pallas``: CLAHE'd image -> adaptive-Sauvola binary in
  one pass (box mean + box sqmean + k-map threshold,
  fingerprint_preprocess.py:49-57).
- ``nlm_denoise_pallas``: full non-local means (h=10, template 7, search 21,
  fingerprint_preprocess.py:36) — the 441 search offsets loop entirely in
  VMEM instead of 441 scan steps through HBM.

Both take (B, H, W) float32 and accept ``interpret=True`` so CPU tests can
validate numerics against the XLA reference implementations.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
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


def _box_sum_same(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable box sum with symmetric (scipy reflect) borders, on values."""
    r = size // 2
    p = _pad_symmetric(x, r, size - 1 - r, 0)
    acc = jnp.zeros_like(x)
    for dy in range(size):
        acc = acc + p[dy:dy + x.shape[0], :]
    p = _pad_symmetric(acc, r, size - 1 - r, 1)
    acc = jnp.zeros_like(x)
    for dx in range(size):
        acc = acc + p[:, dx:dx + x.shape[1]]
    return acc


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


def _nlm_kernel(img_ref, out_ref, *, h_param: float, template: int,
                search: int):
    x = img_ref[0]
    hh, ww = x.shape
    r = search // 2
    hn2 = (h_param / 255.0) ** 2

    # Static unroll over the search window: Mosaic requires 8/128-aligned
    # dynamic VMEM indices, but static slices at any offset are legal
    # (relayouted in-register). 441 offsets x (slice, SSD, box sum) stay
    # entirely in VMEM.
    pad = _pad_symmetric(_pad_symmetric(x, r, r, 0), r, r, 1)
    acc = jnp.zeros_like(x)
    wacc = jnp.zeros_like(x)
    for dy in range(search):
        for dx in range(search):
            shifted = pad[dy:dy + hh, dx:dx + ww]
            d2 = _box_sum_same((x - shifted) ** 2, template) / float(
                template * template)
            wgt = jnp.exp(-d2 / hn2)
            acc = acc + wgt * shifted
            wacc = wacc + wgt
    out_ref[0] = acc / jnp.maximum(wacc, 1e-8)


def nlm_denoise_pallas(img: jnp.ndarray, h: float = 10.0, template: int = 7,
                       search: int = 21, interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) [0,1] non-local means, all 441 offsets in VMEM."""
    b, hh, ww = img.shape
    kern = functools.partial(_nlm_kernel, h_param=h, template=template,
                             search=search)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, hh, ww), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hh, ww), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=12 * 1024 * 1024),
    )(img.astype(jnp.float32))

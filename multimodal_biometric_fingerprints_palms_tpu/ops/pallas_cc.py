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
    (circular roll + edge mask)."""
    size = x.shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if shift >= 0:
        rolled = pltpu.roll(x, shift, axis)
        return jnp.where(idx < shift, fill, rolled)
    rolled = pltpu.roll(x, size + shift, axis)
    return jnp.where(idx >= size + shift, fill, rolled)


def _seg_min_doubling(v, blocked, axis: int, length: int, reverse: bool):
    """Segmented prefix (or suffix, when reverse) min via log-doubling.
    Reverse scans use negative shifts directly — Mosaic has no `rev`."""
    sgn = -1 if reverse else 1
    shift = 1
    while shift < length:
        v_s = _shift_no_wrap(v, sgn * shift, axis, _INF)
        b_s = _shift_no_wrap(blocked, sgn * shift, axis, 1.0)
        v = jnp.where(blocked > 0.5, v, jnp.minimum(v, v_s))
        blocked = jnp.maximum(blocked, b_s)
        shift *= 2
    return v


def _cc_kernel(mask_ref, label_ref, *, h: int, w: int, connectivity: int,
               max_iters: int):
    fg = mask_ref[0] > 0.5                                   # (h, w) bool
    fgf = fg.astype(jnp.float32)
    not_fg = 1.0 - fgf

    rows = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lin = (rows * w + cols).astype(jnp.float32)
    label0 = jnp.where(fg, lin, _INF)

    def scan_dir(v, axis, reverse):
        out = _seg_min_doubling(v, not_fg, axis, h if axis == 0 else w,
                                reverse)
        return jnp.where(fg, out, _INF)

    def stencil(v):
        vm = jnp.where(fg, v, _INF)
        best = vm
        if connectivity == 2:
            offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                    (1, -1), (1, 0), (1, 1)]
        else:
            offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        for dy, dx in offs:
            s = vm
            if dy != 0:
                s = _shift_no_wrap(s, dy, 0, _INF)
            if dx != 0:
                s = _shift_no_wrap(s, dx, 1, _INF)
            best = jnp.minimum(best, s)
        return jnp.where(fg, jnp.minimum(v, best), _INF)

    def sweep(v):
        v = scan_dir(v, 1, False)
        v = scan_dir(v, 1, True)
        v = scan_dir(v, 0, False)
        v = scan_dir(v, 0, True)
        return stencil(v)

    def cond(state):
        v, prev, i = state
        return jnp.logical_and(i < max_iters, jnp.any(v != prev))

    def body(state):
        v, _, i = state
        return sweep(v), v, i + 1

    first = sweep(label0)
    v, _, _ = lax.while_loop(cond, body, (first, label0, jnp.int32(1)))
    label_ref[0] = jnp.where(fg, v, _INF).astype(jnp.int32)


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
    )(flat)
    return out.reshape(mask.shape)

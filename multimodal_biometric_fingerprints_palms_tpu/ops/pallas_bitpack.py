"""Bit-packed binary raster kernels: 32 images per int32 plane.

Zhang-Suen thinning (fingerprint_preprocess.py:171 `skeletonize`) is pure
0/1 cellular logic, so a batch of binary images can be packed 32-deep into
one int32 bitplane and thinned with bitwise ops: every AND/OR/XOR processes
32 images at once. A packed subpass costs ~130 bitwise vector ops on ONE
(H, W) plane versus ~50 f32 ops on EACH of 32 separate images — an order
of magnitude fewer VPU cycles for the dominant while_loop of the thin
stage. Neighbor counts use carry-save adder trees over the 8 shifted
planes (bit-sliced arithmetic); the A(p)=1 crossing test uses a
prefix-seen exactly-one circuit.

The packed loop runs to the JOINT fixpoint of the 32 packed images (a few
extra no-op iterations for early finishers, each 32x cheaper than before).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_cc import _shift_no_wrap_i


def pack_bits(masks: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) bool/0-1 -> (ceil(B/32), H, W) int32 bitplanes (bit b of
    plane k = image k*32+b). Pads the batch with empty images."""
    b, h, w = masks.shape
    nb = -(-b // 32)
    m = masks.astype(jnp.uint32)
    if nb * 32 != b:
        m = jnp.pad(m, ((0, nb * 32 - b), (0, 0), (0, 0)))
    m = m.reshape(nb, 32, h, w)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    packed = jnp.sum(m * weights[None, :, None, None], axis=1,
                     dtype=jnp.uint32)
    return lax.bitcast_convert_type(packed, jnp.int32)


def unpack_bits(planes: jnp.ndarray, b: int) -> jnp.ndarray:
    """(nb, H, W) int32 -> (b, H, W) bool."""
    nb, h, w = planes.shape
    u = lax.bitcast_convert_type(planes, jnp.uint32)
    bits = (u[:, None, :, :] >> jnp.arange(32, dtype=jnp.uint32)[
        None, :, None, None]) & jnp.uint32(1)
    return bits.reshape(nb * 32, h, w)[:b].astype(bool)


def _ha(a, b):
    """Half adder on bitplanes: (sum, carry)."""
    return a ^ b, a & b


def _fa(a, b, c):
    """Full adder on bitplanes: (sum, carry)."""
    ab = a ^ b
    return ab ^ c, (a & b) | (c & ab)


def _ring(img):
    """8-neighborhood planes [P2..P9] (N, NE, E, SE, S, SW, W, NW), zero
    border fill, same convention as ops.skeleton's neighborhood."""
    def at(dy, dx):
        v = img
        if dy != 0:
            v = _shift_no_wrap_i(v, -dy, 0, 0)
        if dx != 0:
            v = _shift_no_wrap_i(v, -dx, 1, 0)
        return v
    return [at(-1, 0), at(-1, 1), at(0, 1), at(1, 1),
            at(1, 0), at(1, -1), at(0, -1), at(-1, -1)]


def _zs_bit_subpass(img, first: bool):
    """One bit-parallel Zhang-Suen subpass on an int32 plane."""
    p = _ring(img)
    p2, p3, p4, p5, p6, p7, p8, p9 = p

    # B = number of set neighbors, as 4 bitplanes via carry-save adders.
    s_a, c_a = _fa(p2, p3, p4)
    s_b, c_b = _fa(p5, p6, p7)
    s_c, c_c = _ha(p8, p9)
    s0, c_d = _fa(s_a, s_b, s_c)            # bit 0
    s_e, c_e = _fa(c_a, c_b, c_c)           # bit-1 partials
    s1, c_f = _ha(c_d, s_e)                 # bit 1
    s2, c_g = _ha(c_e, c_f)                 # bit 2
    s3 = c_g                                # bit 3 (B == 8)
    b_ge2 = s1 | s2 | s3
    b_le6 = ~(s3 | (s2 & s1 & s0))

    # A(p) == 1: exactly one 0->1 transition around the ring.
    ring = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
    zero = jnp.zeros_like(img)
    seen, more = zero, zero
    for i in range(8):
        t = ~ring[i] & ring[i + 1]
        more = more | (t & seen)
        seen = seen | t
    a_eq1 = seen & ~more

    if first:
        c1 = ~(p2 & p4 & p6)
        c2 = ~(p4 & p6 & p8)
    else:
        c1 = ~(p2 & p4 & p8)
        c2 = ~(p2 & p6 & p8)

    remove = img & b_ge2 & b_le6 & a_eq1 & c1 & c2
    return img & ~remove


def _seg_spread_dir(o, g, shift_sign: int, axis: int, length: int):
    """Packed segmented OR 'spread' along one direction: after the log
    doubling, bit b of o at position i = OR of the initial o bits over the
    maximal transparent run ending at i (directionally). (o, g) is the
    standard segmented-scan carry — g bit = 'window fully transparent' —
    so opaque pixels block propagation exactly like the int32 keyed min
    scans in pallas_cc, but on 32 images per plane."""
    s = 1
    while s < length:
        o = o | (_shift_no_wrap_i(o, shift_sign * s, axis, 0) & g)
        g = g & _shift_no_wrap_i(g, shift_sign * s, axis, 0)
        s *= 2
    return o


def _spread_sweep(v, t, h: int, w: int, connectivity: int):
    """One reachability sweep: sequential fwd/bwd row scans then fwd/bwd
    column scans (each direction sees the previous one's result, like
    pallas_cc._label_relax's dir_pass composition), plus diagonal hops for
    8-connectivity. Edge-adjacent hops are subsumed by the scans."""
    v = _seg_spread_dir(v, t, 1, 1, w)
    v = _seg_spread_dir(v, t, -1, 1, w)
    v = _seg_spread_dir(v, t, 1, 0, h)
    v = _seg_spread_dir(v, t, -1, 0, h)
    if connectivity == 2:
        for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
            v = v | (t & _shift_no_wrap_i(
                _shift_no_wrap_i(v, -dy, 0, 0), -dx, 1, 0))
    return v


def _reach_fixpoint(seed, t, h: int, w: int, connectivity: int,
                    max_iters: int):
    """Iterate _spread_sweep to the joint fixpoint of the 32 packed images:
    bit b of the result = pixel reachable from seed within transparent,
    for image b. Two sweeps per loop iteration (halves the convergence
    reduces, at most one wasted sweep)."""
    v0 = seed & t

    def cond(state):
        v, prev, i = state
        return jnp.logical_and(i < max_iters, jnp.any(v != prev))

    def body(state):
        v, _, i = state
        nxt = _spread_sweep(_spread_sweep(v, t, h, w, connectivity),
                            t, h, w, connectivity)
        return nxt, v, i + 2

    first = _spread_sweep(v0, t, h, w, connectivity)
    v, _, _ = lax.while_loop(cond, body, (first, v0, jnp.int32(1)))
    return v


def _reach_kernel(t_ref, s_ref, s1_ref, r_ref, r1_ref, *, h: int, w: int,
                  connectivity: int, max_iters: int):
    t = t_ref[0]
    r_ref[0] = _reach_fixpoint(s_ref[0], t, h, w, connectivity, max_iters)
    r1_ref[0] = _reach_fixpoint(s1_ref[0], t, h, w, connectivity, max_iters)


def border_reach_packed(transparent: jnp.ndarray, connectivity: int = 1,
                        max_iters: int = 512, interpret: bool = False,
                        packed: bool = False, union: bool = True):
    """Border reachability on (..., H, W) boolean masks, 32 images per
    int32 plane.

    Returns (reach, reach1): pixels of `transparent` connected to ANY
    border pixel of it (= the union of the border-touching components),
    and pixels connected to the single canonical border pixel (minimum
    linear index). With union=False only reach1 is computed (ONE packed
    fixpoint instead of two) and returned alone — the hole-fill split
    (pallas_cc._fill_holes_split_kernel) is exact for any number of
    border components given just the canonical one, so the union pass is
    pure overhead there. Each sweep costs ~4 segmented OR scans on ONE
    plane for 32 images, ~32x less data than the int32 keyed label relax
    it replaces."""
    lead = transparent.shape[:-2]
    h, w = transparent.shape[-2:]
    b = 1
    for d in lead:
        b *= d
    t = transparent.reshape(b, h, w)

    rows = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (rows == 0) | (rows == h - 1) | (cols == 0) | (cols == w - 1)
    seeds = jnp.logical_and(t, border)
    lin = rows * w + cols
    cand = jnp.where(seeds, lin, jnp.int32(h * w))
    first = jnp.min(cand, axis=(-2, -1), keepdims=True)
    seed1 = jnp.logical_and(seeds, lin == first)

    tp = pack_bits(t)
    s1p = pack_bits(seed1)
    nb = tp.shape[0]
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    if not union:
        kern1 = functools.partial(_seed_reach_kernel, h=h, w=w,
                                  connectivity=connectivity,
                                  max_iters=max_iters)
        r1 = pl.pallas_call(
            kern1,
            grid=(nb,),
            in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((nb, h, w), jnp.int32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
        )(tp, s1p)
        if packed:
            return r1
        return unpack_bits(r1, b).reshape(transparent.shape)
    sp = pack_bits(seeds)
    kern = functools.partial(_reach_kernel, h=h, w=w,
                             connectivity=connectivity, max_iters=max_iters)
    r, r1 = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((nb, h, w), jnp.int32),
                   jax.ShapeDtypeStruct((nb, h, w), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(tp, sp, s1p)
    if packed:
        # (nb, H, W) int32 planes — consumers index plane i // 32 via
        # their BlockSpec and test bit i % 32, skipping the f32 unpack
        # round trip through HBM entirely.
        return r, r1
    return (unpack_bits(r, b).reshape(transparent.shape),
            unpack_bits(r1, b).reshape(transparent.shape))


def _seed_reach_kernel(t_ref, s_ref, r_ref, *, h: int, w: int,
                       connectivity: int, max_iters: int):
    r_ref[0] = _reach_fixpoint(s_ref[0], t_ref[0], h, w, connectivity,
                               max_iters)


def reach_packed(mask: jnp.ndarray, seeds: jnp.ndarray,
                 connectivity: int = 1, max_iters: int = 512,
                 interpret: bool = False, packed: bool = False) -> jnp.ndarray:
    """Reachability from an arbitrary per-image seed mask over (..., H, W)
    boolean masks, 32 images per int32 plane: returns the union of the
    components of ``mask`` containing a seed pixel. The packed counterpart
    of `pallas_cc.binary_reconstruct_pallas` — each sweep is ~4 segmented
    OR scans on ONE plane for 32 images.

    packed=True returns the raw (ceil(B/32), H, W) int32 planes —
    consumers index plane i // 32 via their BlockSpec and test bit
    i % 32, skipping the f32 unpack round trip through HBM."""
    lead = mask.shape[:-2]
    h, w = mask.shape[-2:]
    b = 1
    for d in lead:
        b *= d
    tp = pack_bits(mask.reshape(b, h, w))
    sp = pack_bits(seeds.reshape(b, h, w))
    nb = tp.shape[0]
    kern = functools.partial(_seed_reach_kernel, h=h, w=w,
                             connectivity=connectivity, max_iters=max_iters)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    r = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nb, h, w), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(tp, sp)
    if packed:
        return r
    return unpack_bits(r, b).reshape(mask.shape)


def _cross_and(v):
    out = v
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        out = out & _shift_no_wrap_i(
            _shift_no_wrap_i(v, -dy, 0, 0), -dx, 1, 0)
    return out


def _cross_or(v):
    out = v
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        out = out | _shift_no_wrap_i(
            _shift_no_wrap_i(v, -dy, 0, 0), -dx, 1, 0)
    return out


def _open_erode_reconstruct_kernel(in_ref, out_ref, *, h: int, w: int,
                                   max_iters: int):
    """3x3-cross open -> 3x3-cross erode marker -> geodesic reconstruction
    (the binarize tail, fingerprint_preprocess.py:76-81) as pure bitwise
    packed ops: binary erosion = AND of shifted planes, dilation = OR,
    reconstruction = packed reachability from the marker (conn 2)."""
    v = in_ref[0]
    er = _cross_and(v)
    opened = _cross_or(er)
    marker = _cross_and(opened)
    out_ref[0] = _reach_fixpoint(marker, opened, h, w, 2, max_iters)


def open_erode_reconstruct_packed(mask: jnp.ndarray, max_iters: int = 512,
                                  interpret: bool = False) -> jnp.ndarray:
    """enhance.binarize's tail (3x3 ellipse open + erode marker + binary
    reconstruction by dilation) over (..., H, W) boolean masks, 32 images
    per int32 plane."""
    lead = mask.shape[:-2]
    h, w = mask.shape[-2:]
    b = 1
    for d in lead:
        b *= d
    planes = pack_bits(mask.reshape(b, h, w))
    nb = planes.shape[0]
    kern = functools.partial(_open_erode_reconstruct_kernel, h=h, w=w,
                             max_iters=max_iters)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nb, h, w), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(planes)
    return unpack_bits(out, b).reshape(mask.shape)


def _zs_bit_kernel(in_ref, out_ref, *, max_iters: int, prune: bool):
    img0 = in_ref[0]

    def cond(state):
        img, prev, i = state
        return jnp.logical_and(i < max_iters, jnp.any(img != prev))

    def body(state):
        img, _, i = state
        new = _zs_bit_subpass(img, True)
        new = _zs_bit_subpass(new, False)
        return new, img, i + 1

    first = _zs_bit_subpass(_zs_bit_subpass(img0, True), False)
    img, _, _ = lax.while_loop(cond, body, (first, img0, jnp.int32(1)))

    if prune:
        nbr = jnp.zeros_like(img)
        for q in _ring(img):
            nbr = nbr | q
        img = img & nbr
    out_ref[0] = img


def zs_thin_bitpacked(masks: jnp.ndarray, max_iters: int = 128,
                      prune: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """Zhang-Suen thinning over (..., H, W) binary masks, 32 images per
    int32 plane (ops.skeleton.skeletonize semantics; optional isolated-tip
    prune as in enhance.thinning_and_cleaning)."""
    lead = masks.shape[:-2]
    h, w = masks.shape[-2:]
    b = 1
    for d in lead:
        b *= d
    flat = masks.reshape(b, h, w)
    planes = pack_bits(flat)
    nb = planes.shape[0]
    kern = functools.partial(_zs_bit_kernel, max_iters=max_iters,
                             prune=prune)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, h, w), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(planes)
    return unpack_bits(out, b).reshape(masks.shape)

"""Sharded 1:N identification — all-pairs gallery scoring.

The north-star layout (BASELINE.json, SURVEY.md §2.10): the gallery is an
HBM-resident (N, K) MinutiaeSet sharded over the ``gallery`` mesh axis; each
device scores its row shard against the full gallery, obtained with one ICI
`all_gather` of the template block — the same block pattern as ring
attention, applied to template-pair score tiles.

Per device the work is (N/D) x N pair matches; rows are `lax.map`-
sequentialized and columns chunked so the (H, K, K) hypothesis tensors stay
within a bounded VMEM/HBM footprint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

import numpy as np

from ..features.minutiae import MinutiaeSet
from ..matching.ransac import (MatchParams, match_minutiae_pair,
                               match_pairs_batch)


def shard_gallery(gallery: MinutiaeSet, mesh: Mesh,
                  axis_name: str = "gallery") -> MinutiaeSet:
    """Place a (N, K) MinutiaeSet with N sharded across the mesh. N must be
    divisible by the mesh size (pad with invalid templates if needed)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), gallery)


def pad_gallery(gallery: MinutiaeSet, multiple: int) -> MinutiaeSet:
    """Pad the template axis to a multiple (padded templates are invalid,
    so they score 0 against everything)."""
    n = gallery.valid.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return gallery
    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)
    return jax.tree.map(_pad, gallery)


def all_pairs_scores(gallery: MinutiaeSet, mesh: Mesh,
                     params: MatchParams = MatchParams(),
                     axis_name: str = "gallery",
                     col_chunk: int = 64) -> jnp.ndarray:
    """(N, N) final-score matrix of every template against every other.

    DEMO/REFERENCE PATH — kept as the all_gather exposition of the
    north-star layout and as the equality oracle in tests. Production
    all-pairs scoring is `shard_pairs_scores` / `all_pairs_unique` (unique
    pairs, even balance, Pallas matcher, cascade); `dryrun_multichip`
    validates the production path only.

    ``gallery`` is (N, K) with N divisible by the mesh size; the result is
    sharded over rows. Diagonal (self-match) included; callers mask it.
    """
    n = gallery.valid.shape[0]
    n_dev = mesh.devices.size
    assert n % n_dev == 0, f"gallery size {n} not divisible by mesh {n_dev}"
    assert n % col_chunk == 0 or n < col_chunk, (
        f"gallery size {n} not divisible by col_chunk {col_chunk}")
    chunk = min(col_chunk, n)

    spec = P(axis_name)
    in_specs = jax.tree.map(lambda _: spec, gallery)

    def device_fn(local: MinutiaeSet) -> jnp.ndarray:
        # Full gallery via ICI all_gather of every template block.
        full = jax.tree.map(
            lambda x: lax.all_gather(x, axis_name, tiled=True), local)

        def one_row(row: MinutiaeSet) -> jnp.ndarray:
            cols = jax.tree.map(
                lambda x: x.reshape((n // chunk, chunk) + x.shape[1:]), full)

            def one_chunk(cchunk: MinutiaeSet) -> jnp.ndarray:
                return jax.vmap(
                    lambda c: match_minutiae_pair(row, c, params).final_score
                )(cchunk)

            return lax.map(one_chunk, cols).reshape(n)

        return lax.map(one_row, local)

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(in_specs,),
        out_specs=P(axis_name, None),
        check_rep=False,
    )
    return fn(gallery)


def take_templates(gallery: MinutiaeSet, idx: jnp.ndarray) -> MinutiaeSet:
    """Gather template rows by index as a one-hot MXU contraction — row
    gathers are pathologically slow on TPU (docs/PERF.md), a (C, N) one-hot
    matmul is exact (each row has a single 1.0) and runs at MXU speed."""
    n = gallery.valid.shape[0]
    onehot = (idx[:, None] == jnp.arange(n)[None, :]).astype(jnp.float32)

    def take(x):
        flat = x.reshape(n, -1).astype(jnp.float32)
        # HIGHEST precision: the default TPU matmul rounds inputs to
        # bf16, which would perturb coordinates; one-hot @ f32 rows is
        # exact under the bf16x3 decomposition.
        out = jnp.dot(onehot, flat, preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)
        out = out.reshape((idx.shape[0],) + x.shape[1:])
        if x.dtype == jnp.bool_:
            return out > 0.5
        return out.astype(x.dtype)

    return jax.tree.map(take, gallery)


def _batch_matcher(use_pallas: bool):
    if use_pallas:
        from ..matching.pallas_match import match_pairs_batch_pallas
        return match_pairs_batch_pallas
    return lambda a, b, p: match_pairs_batch(a, b, p)


def shard_pairs_scores(gallery: MinutiaeSet, pairs, mesh: Mesh,
                       params: MatchParams = MatchParams(),
                       axis_name: str = "gallery",
                       chunk: int = 2048,
                       use_pallas: bool | None = None):
    """Score an explicit (P, 2) template-index pair list, sharded over the
    mesh: the pair list is split evenly across devices, the (small) gallery
    is replicated, and each device gathers its pair rows and runs the
    batched matcher (grouped Pallas kernel on TPU) in fixed-size chunks.

    This is the work layout of the north-star all-pairs protocol
    (BASELINE.json: full-PolyU 1480-template all-pairs): unique pairs,
    evenly balanced regardless of the triangular structure. Returns
    (scores (P,), n_inliers (P,)) as NumPy arrays.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    pairs = np.asarray(pairs, np.int32)
    p_total = pairs.shape[0]
    n_dev = mesh.devices.size
    per_dev = -(-p_total // (n_dev * chunk)) * chunk
    pad = n_dev * per_dev - p_total
    if pad:
        pairs = np.concatenate([pairs, np.tile(pairs[-1:], (pad, 1))])

    fn = _pairs_scores_jit(mesh, axis_name, params, chunk, use_pallas)
    s, n = fn(jnp.asarray(pairs), gallery)
    return np.asarray(s)[:p_total], np.asarray(n)[:p_total]


@functools.lru_cache(maxsize=32)
def _pairs_scores_jit(mesh: Mesh, axis_name: str, params: MatchParams,
                      chunk: int, use_pallas: bool):
    """Cached jitted program for `shard_pairs_scores`: rebuilding
    jax.jit(shard_map(...)) per call retraces the whole chunked-matcher
    graph every invocation (hundreds of ms of host time per call)."""
    matcher = _batch_matcher(use_pallas)
    spec = P(axis_name)
    rep = MinutiaeSet(*([P()] * len(MinutiaeSet._fields)))

    def device_fn(local_pairs, g: MinutiaeSet):
        chunks = local_pairs.reshape(-1, chunk, 2)

        def one(c):
            a = take_templates(g, c[:, 0])
            b = take_templates(g, c[:, 1])
            r = matcher(a, b, params)
            return r.final_score, r.n_inliers

        s, n = lax.map(one, chunks)
        return s.reshape(-1), n.reshape(-1)

    return jax.jit(shard_map(
        device_fn, mesh=mesh,
        in_specs=(spec, rep),
        out_specs=(spec, spec),
        check_rep=False,
    ))


def shard_pairs_screen(gallery: MinutiaeSet, pairs, mesh: Mesh,
                       params: MatchParams = MatchParams(),
                       axis_name: str = "gallery",
                       chunk: int = 2048,
                       use_pallas: bool | None = None,
                       anchors: bool = True) -> np.ndarray:
    """Cascade screen over an explicit pair list: (P,) bool promotion mask.
    On TPU this skips the matcher's finish stage entirely
    (`screen_pairs_batch_pallas`); the CPU fallback derives the mask from
    the full matcher."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    pairs = np.asarray(pairs, np.int32)
    p_total = pairs.shape[0]
    n_dev = mesh.devices.size
    per_dev = -(-p_total // (n_dev * chunk)) * chunk
    pad = n_dev * per_dev - p_total
    if pad:
        pairs = np.concatenate([pairs, np.tile(pairs[-1:], (pad, 1))])

    fn = _pairs_screen_jit(mesh, axis_name, params, chunk, use_pallas,
                           anchors)
    out = fn(jnp.asarray(pairs), gallery)
    return np.asarray(out)[:p_total]


@functools.lru_cache(maxsize=32)
def _pairs_screen_jit(mesh: Mesh, axis_name: str, params: MatchParams,
                      chunk: int, use_pallas: bool, anchors: bool = True):
    """Cached jitted program for `shard_pairs_screen` (see
    `_pairs_scores_jit` for why)."""
    spec = P(axis_name)
    rep = MinutiaeSet(*([P()] * len(MinutiaeSet._fields)))

    from ..matching.ransac import screen_promote_batch

    def screen(a, b):
        return screen_promote_batch(a, b, params, use_pallas, anchors)

    def device_fn(local_pairs, g: MinutiaeSet):
        chunks = local_pairs.reshape(-1, chunk, 2)

        def one(c):
            a = take_templates(g, c[:, 0])
            b = take_templates(g, c[:, 1])
            return screen(a, b)

        return lax.map(one, chunks).reshape(-1)

    return jax.jit(shard_map(
        device_fn, mesh=mesh,
        in_specs=(spec, rep),
        out_specs=spec,
        check_rep=False,
    ))


def unique_pairs(n: int) -> np.ndarray:
    """(N*(N-1)/2, 2) upper-triangle index pairs (i < j)."""
    iu = np.triu_indices(n, k=1)
    return np.stack(iu, axis=1).astype(np.int32)


def shard_blocks_screen(gallery: MinutiaeSet, mesh: Mesh,
                        params: MatchParams,
                        axis_name: str = "gallery",
                        block: int = 64,
                        use_pallas: bool | None = None,
                        anchors: bool = True):
    """Cascade screen over ALL unique pairs in (block x block) template
    tiles: each device dynamic-slices two ``block``-template rows out of
    the replicated gallery and screens their full cross product — no
    per-pair one-hot template fetch (the pair-list path's fetch cost grows
    with N*chunk; the blocked path's is flat in N).

    Returns (block_pairs (NBP, 2), mask (NBP, block*block)): mask[r, k]
    promotes global pair (bi*block + k//block, bj*block + k%block)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    gpad = pad_gallery(gallery, block)
    npad = gpad.valid.shape[0]
    nb = npad // block
    bi, bj = np.triu_indices(nb, k=0)
    bp = np.stack([bi, bj], axis=1).astype(np.int32)
    nbp = bp.shape[0]
    n_dev = mesh.devices.size
    per_dev = -(-nbp // n_dev)
    pad = n_dev * per_dev - nbp
    if pad:
        bp = np.concatenate([bp, np.tile(bp[-1:], (pad, 1))])
    fn = _blocks_screen_jit(mesh, axis_name, params, block, use_pallas,
                            anchors)
    mask = np.asarray(fn(jnp.asarray(bp), gpad))[:nbp]
    return bp[:nbp], mask


@functools.lru_cache(maxsize=32)
def _blocks_screen_jit(mesh: Mesh, axis_name: str, params: MatchParams,
                       block: int, use_pallas: bool, anchors: bool = True):
    spec = P(axis_name)
    rep = MinutiaeSet(*([P()] * len(MinutiaeSet._fields)))

    from ..matching.ransac import screen_promote_batch

    def screen(a, b):
        return screen_promote_batch(a, b, params, use_pallas, anchors)

    # The block cross product is screened in standard 512-pair chunks
    # (block*block = 4096 pairs as one matcher batch made the CPU-mesh
    # XLA compile explode; 512 also matches the shape every other call
    # site compiles).
    inner = min(512, block * block)
    rows = inner // block                       # a-rows per inner chunk

    def device_fn(local_bp, g: MinutiaeSet):
        def one(c):
            blk_a = jax.tree.map(
                lambda x: lax.dynamic_slice_in_dim(x, c[0] * block, block, 0),
                g)
            blk_b = jax.tree.map(
                lambda x: lax.dynamic_slice_in_dim(x, c[1] * block, block, 0),
                g)
            b = jax.tree.map(
                lambda x: jnp.tile(x, (rows,) + (1,) * (x.ndim - 1)), blk_b)

            def sub(r0):
                a = jax.tree.map(
                    lambda x: jnp.repeat(
                        lax.dynamic_slice_in_dim(x, r0 * rows, rows, 0),
                        block, axis=0), blk_a)
                return screen(a, b)

            parts = lax.map(sub, jnp.arange(block // rows))
            return parts.reshape(block * block)

        return lax.map(one, local_bp)

    return jax.jit(shard_map(
        device_fn, mesh=mesh,
        in_specs=(spec, rep),
        out_specs=spec,
        check_rep=False,
    ))


def all_pairs_unique(gallery: MinutiaeSet, mesh: Mesh,
                     params: MatchParams = MatchParams(),
                     axis_name: str = "gallery",
                     chunk: int = 2048,
                     cascade: bool = True,
                     screen_iters: int = 32,
                     use_pallas: bool | None = None,
                     anchors: bool = True) -> np.ndarray:
    """All unique template pairs of a gallery, scored with the two-phase
    cascade (host-orchestrated): a cheap ``screen_iters``-hypothesis pass
    over every pair, then the full ``params.ransac_iter`` pass only on the
    pairs the screen did not hard-reject (impostors overwhelmingly fail the
    spatial-std reject or find no inliers under any hypothesis).

    Returns (P,) final scores aligned with `unique_pairs(N)`.
    """
    n = gallery.valid.shape[0]
    pairs = unique_pairs(n)
    if not (cascade and params.ransac_iter > screen_iters):
        s, _ = shard_pairs_scores(gallery, pairs, mesh, params,
                                  axis_name, chunk, use_pallas)
        return s
    screen_p = params._replace(
        ransac_iter=screen_iters,
        full_iters=params.ransac_iter,
        min_inliers=max(3, params.min_inliers - 2))
    block = 64
    bp, mask = shard_blocks_screen(gallery, mesh, screen_p, axis_name,
                                   block, use_pallas, anchors)
    # Map promoted (block-pair, local-k) entries back to unique-pair slots:
    # a-side is repeat-major, b-side tile-minor, so k = i_local*B + j_local.
    il, jl = np.divmod(np.arange(block * block), block)
    gi = bp[:, :1] * block + il[None, :]
    gj = bp[:, 1:] * block + jl[None, :]
    keep = mask & (gi < gj) & (gj < n)
    ii, jj = gi[keep].astype(np.int64), gj[keep].astype(np.int64)
    out = np.zeros(pairs.shape[0], np.float64)
    if ii.size:
        pos = ii * (2 * n - ii - 1) // 2 + (jj - ii - 1)
        s1, _ = shard_pairs_scores(
            gallery, np.stack([ii, jj], axis=1).astype(np.int32), mesh,
            params, axis_name, chunk, use_pallas)
        out[pos] = s1
    return out


def identify(probe: MinutiaeSet, gallery: MinutiaeSet, mesh: Mesh,
             params: MatchParams = MatchParams(),
             axis_name: str = "gallery",
             chunk: int = 1024,
             use_pallas: bool | None = None) -> jnp.ndarray:
    """1:N identification: score one probe against a sharded gallery with
    the batched matcher (grouped Pallas kernel on TPU), chunked so the
    per-chunk buffers stay bounded. Returns (N,) scores (row sharded)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    matcher = _batch_matcher(use_pallas)

    n = gallery.valid.shape[0]
    n_dev = mesh.devices.size
    n_local = n // n_dev
    chunk = min(chunk, n_local)
    assert n_local % chunk == 0, (n_local, chunk)

    fn = _identify_jit(mesh, axis_name, params, chunk, n_local, use_pallas)
    return fn(probe, gallery)


def identify_batch(probes: MinutiaeSet, gallery: MinutiaeSet, mesh: Mesh,
                   params: MatchParams = MatchParams(),
                   axis_name: str = "gallery",
                   chunk: int = 1024,
                   use_pallas: bool | None = None) -> jnp.ndarray:
    """Batched 1:N identification: (P, K) probes against a sharded (N, K)
    gallery -> (P, N) scores. The realistic identification workload: one
    dispatch amortizes over the probe batch instead of paying the
    per-probe launch of `identify` (~40 ms/probe single-probe on the TPU
    relay). Per device the work is P x N_local pair matches, walked in
    (chunk)-pair column chunks per probe row via lax.map."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n = gallery.valid.shape[0]
    n_dev = mesh.devices.size
    n_local = n // n_dev
    chunk = min(chunk, n_local)
    assert n_local % chunk == 0, (n_local, chunk)
    p_num = probes.valid.shape[0]
    fn = _identify_batch_jit(mesh, axis_name, params, chunk, n_local,
                             p_num, use_pallas)
    return fn(probes, gallery)


@functools.lru_cache(maxsize=32)
def _identify_batch_jit(mesh: Mesh, axis_name: str, params: MatchParams,
                        chunk: int, n_local: int, p_num: int,
                        use_pallas: bool):
    matcher = _batch_matcher(use_pallas)
    spec = P(axis_name)

    def device_fn(probes: MinutiaeSet, local: MinutiaeSet) -> jnp.ndarray:
        chunks = jax.tree.map(
            lambda x: x.reshape((n_local // chunk, chunk) + x.shape[1:]),
            local)

        def one_chunk(c):
            # flatten (P probes x chunk gallery) into one (P*chunk,) pair
            # batch — a single matcher dispatch, no vmap over pallas_call
            a = jax.tree.map(
                lambda x: jnp.broadcast_to(
                    x[:, None], (p_num, chunk) + x.shape[1:]
                ).reshape((p_num * chunk,) + x.shape[1:]), probes)
            b = jax.tree.map(
                lambda x: jnp.broadcast_to(
                    x[None], (p_num,) + x.shape
                ).reshape((p_num * chunk,) + x.shape[1:]), c)
            return matcher(a, b, params).final_score.reshape(p_num, chunk)

        out = lax.map(one_chunk, chunks)                # (n_chunks, P, chunk)
        return jnp.moveaxis(out, 0, 1).reshape(p_num, n_local)

    return jax.jit(shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), spec),
        out_specs=P(None, axis_name),
        check_rep=False,
    ))


@functools.lru_cache(maxsize=32)
def _identify_jit(mesh: Mesh, axis_name: str, params: MatchParams,
                  chunk: int, n_local: int, use_pallas: bool):
    """Cached jitted sharded identify — an unjitted shard_map re-traces and
    eager-dispatches every op per call (~33 ms relay latency each)."""
    matcher = _batch_matcher(use_pallas)
    spec = P(axis_name)

    def device_fn(p: MinutiaeSet, local: MinutiaeSet) -> jnp.ndarray:
        chunks = jax.tree.map(
            lambda x: x.reshape((n_local // chunk, chunk) + x.shape[1:]),
            local)

        def one(c):
            a = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (chunk,) + x.shape), p)
            return matcher(a, c, params).final_score

        return lax.map(one, chunks).reshape(-1)

    # prefix-pytree specs: one spec covers every MinutiaeSet leaf
    return jax.jit(shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), spec),
        out_specs=P(axis_name),
        check_rep=False,
    ))

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

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..features.minutiae import MinutiaeSet
from ..matching.ransac import MatchParams, match_minutiae_pair


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


def identify(probe: MinutiaeSet, gallery: MinutiaeSet, mesh: Mesh,
             params: MatchParams = MatchParams(),
             axis_name: str = "gallery") -> jnp.ndarray:
    """1:N identification: score one probe against a sharded gallery.
    Returns (N,) scores (row sharded across devices)."""
    spec = P(axis_name)
    in_specs_g = jax.tree.map(lambda _: spec, gallery)
    in_specs_p = jax.tree.map(lambda _: P(), probe)

    def device_fn(p: MinutiaeSet, local: MinutiaeSet) -> jnp.ndarray:
        return jax.vmap(
            lambda c: match_minutiae_pair(p, c, params).final_score)(local)

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(in_specs_p, in_specs_g),
        out_specs=P(axis_name),
        check_rep=False,
    )
    return fn(probe, gallery)

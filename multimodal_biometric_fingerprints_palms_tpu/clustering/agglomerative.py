"""Two-stage agglomerative clustering.

Rebuild of cluster_embeddings.py:105-161: KMeans down to <=512 centers, then
average-linkage agglomerative merging of the centers under cosine distance,
then nearest-center assignment. The O(C^2) hierarchical merge runs on device
as a `lax.fori_loop` over merges with an active-mask — C<=512 keeps every
step a small (C, C) reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .kmeans import kmeans


def _cosine_dist(a, b):
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return 1.0 - an @ bn.T


@partial(jax.jit, static_argnums=(1,))
def _merge_centers(centers: jnp.ndarray, n_clusters: int) -> jnp.ndarray:
    """Average-linkage agglomeration of C centers down to n_clusters groups.
    Returns group id per center."""
    c = centers.shape[0]
    group = jnp.arange(c)
    active = jnp.ones((c,), bool)
    # Running weighted centroid per group (average linkage on centroids).
    cent = centers
    weight = jnp.ones((c,), jnp.float32)

    def body(_, state):
        group, active, cent, weight = state
        d = _cosine_dist(cent, cent)
        d = jnp.where(active[:, None] & active[None, :], d, jnp.inf)
        d = jnp.where(jnp.eye(c, dtype=bool), jnp.inf, d)
        flat = jnp.argmin(d)
        i, j = flat // c, flat % c
        i, j = jnp.minimum(i, j), jnp.maximum(i, j)
        # merge j into i
        wi, wj = weight[i], weight[j]
        new_c = (cent[i] * wi + cent[j] * wj) / (wi + wj)
        cent = cent.at[i].set(new_c)
        weight = weight.at[i].set(wi + wj)
        active = active.at[j].set(False)
        group = jnp.where(group == group[j], group[i], group)
        return group, active, cent, weight

    group, active, _, _ = lax.fori_loop(
        0, c - n_clusters, body, (group, active, cent, weight))
    # Relabel groups to 0..n_clusters-1 by rank of their root index.
    roots = jnp.unique(group, size=n_clusters, fill_value=c + 1)
    label = jnp.argmax(group[:, None] == roots[None, :], axis=-1)
    return label


def agglomerative_fast(key, x: jnp.ndarray, n_clusters: int,
                       max_centers: int = 512,
                       kmeans_iters: int = 50) -> jnp.ndarray:
    """Two-stage agglomerative labels for (N, D) embeddings."""
    n = x.shape[0]
    c = min(max_centers, n)
    if c <= n_clusters:
        labels, _, _ = kmeans(key, x, n_clusters, kmeans_iters)
        return labels
    coarse_labels, centers, _ = kmeans(key, x, c, kmeans_iters)
    center_group = _merge_centers(centers, n_clusters)
    return center_group[coarse_labels]

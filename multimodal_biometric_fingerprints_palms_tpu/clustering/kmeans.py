"""jit'd KMeans (kmeans++ init + Lloyd iterations).

TPU-native replacement for sklearn MiniBatchKMeans
(classifier/utils/cluster_embeddings.py:81-103). Full-batch Lloyd on device:
the assignment step is one (N, C) distance matmul per iteration; the whole
optimization is a `lax.scan` — appropriate at this scale (thousands of
embeddings, up to a few hundred centers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _pairwise_sqdist(x, c):
    # ||x||^2 - 2 x c^T + ||c||^2, the matmul form (MXU-friendly).
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    cc = jnp.sum(c * c, axis=-1)
    return xx - 2.0 * (x @ c.T) + cc[None, :]


def kmeans_plus_plus_init(key, x: jnp.ndarray, n_clusters: int) -> jnp.ndarray:
    """kmeans++ seeding (D^2-weighted sampling)."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers0 = jnp.zeros((n_clusters, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(carry, i):
        centers, key = carry
        d2 = _pairwise_sqdist(x, centers)
        # distance to the nearest chosen center (unchosen slots are zeros:
        # mask them out by only taking the first i columns via where)
        col = jnp.arange(n_clusters)[None, :]
        d2 = jnp.where(col < i, d2, jnp.inf)
        dmin = jnp.min(d2, axis=-1)
        key, sub = jax.random.split(key)
        probs = dmin / jnp.maximum(jnp.sum(dmin), 1e-12)
        idx = jax.random.categorical(sub, jnp.log(jnp.maximum(probs, 1e-30)))
        centers = centers.at[i].set(x[idx])
        return (centers, key), None

    (centers, _), _ = lax.scan(body, (centers0, key),
                               jnp.arange(1, n_clusters))
    return centers


@partial(jax.jit, static_argnums=(2, 3))
def kmeans(key, x: jnp.ndarray, n_clusters: int, n_iters: int = 50
           ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (labels (N,), centers (C, D), inertia scalar)."""
    x = x.astype(jnp.float32)
    centers = kmeans_plus_plus_init(key, x, n_clusters)

    def lloyd(centers, _):
        d2 = _pairwise_sqdist(x, centers)
        labels = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(labels, n_clusters, dtype=x.dtype)  # (N, C)
        sums = onehot.T @ x                                          # (C, D)
        counts = jnp.sum(onehot, axis=0)[:, None]
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0),
                                centers)
        return new_centers, None

    centers, _ = lax.scan(lloyd, centers, None, length=n_iters)
    d2 = _pairwise_sqdist(x, centers)
    labels = jnp.argmin(d2, axis=-1)
    inertia = jnp.sum(jnp.min(d2, axis=-1))
    return labels, centers, inertia

"""Clustering quality metrics on device.

TPU-native replacements for sklearn's silhouette / Davies-Bouldin /
Calinski-Harabasz (cluster_embeddings.py:26-55, sorted.py:108-125) —
pairwise-distance reductions in jit. The reference subsamples to <=5000
points for the silhouette; callers should do the same.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _cosine_dist_matrix(x):
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    return jnp.clip(1.0 - xn @ xn.T, 0.0, 2.0)


@partial(jax.jit, static_argnums=(2,))
def silhouette_score_cosine(x: jnp.ndarray, labels: jnp.ndarray,
                            n_clusters: int) -> jnp.ndarray:
    d = _cosine_dist_matrix(x.astype(jnp.float32))
    n = x.shape[0]
    onehot = jax.nn.one_hot(labels, n_clusters)                # (N, C)
    counts = jnp.sum(onehot, axis=0)                           # (C,)
    sums = d @ onehot                                          # (N, C)
    own = counts[labels]
    a = jnp.take_along_axis(sums, labels[:, None], axis=1)[:, 0] / jnp.maximum(own - 1, 1)
    mean_other = sums / jnp.maximum(counts[None, :], 1)
    mean_other = jnp.where(onehot > 0, jnp.inf, mean_other)
    b = jnp.min(mean_other, axis=1)
    s = (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-12)
    s = jnp.where(own > 1, s, 0.0)
    return jnp.mean(s)


@partial(jax.jit, static_argnums=(2,))
def davies_bouldin_index(x: jnp.ndarray, labels: jnp.ndarray,
                         n_clusters: int) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, n_clusters)
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
    centroids = (onehot.T @ x) / counts[:, None]
    dev = jnp.linalg.norm(x - centroids[labels], axis=-1)
    scatter = (onehot.T @ dev) / counts                         # (C,)
    cd = jnp.linalg.norm(centroids[:, None] - centroids[None, :], axis=-1)
    ratio = (scatter[:, None] + scatter[None, :]) / jnp.maximum(cd, 1e-12)
    ratio = jnp.where(jnp.eye(n_clusters, dtype=bool), -jnp.inf, ratio)
    return jnp.mean(jnp.max(ratio, axis=-1))


@partial(jax.jit, static_argnums=(2,))
def calinski_harabasz_index(x: jnp.ndarray, labels: jnp.ndarray,
                            n_clusters: int) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    n = x.shape[0]
    onehot = jax.nn.one_hot(labels, n_clusters)
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
    centroids = (onehot.T @ x) / counts[:, None]
    overall = jnp.mean(x, axis=0)
    between = jnp.sum(counts * jnp.sum((centroids - overall) ** 2, axis=-1))
    within = jnp.sum((x - centroids[labels]) ** 2)
    return (between / jnp.maximum(within, 1e-12)
            * (n - n_clusters) / jnp.maximum(n_clusters - 1, 1))


def evaluate_clustering(x, labels, n_clusters: int,
                        max_points: int = 5000, seed: int = 0) -> dict:
    """Clustering report (cluster_embeddings.py:26-55): metrics on a
    <=max_points subsample, cluster sizes, embedding summary stats."""
    x = np.asarray(x)
    labels = np.asarray(labels)
    n = x.shape[0]
    if n > max_points:
        idx = np.random.default_rng(seed).choice(n, max_points, replace=False)
        xs, ls = x[idx], labels[idx]
    else:
        xs, ls = x, labels
    sizes = np.bincount(labels, minlength=n_clusters).tolist()
    return {
        "silhouette_cosine": float(silhouette_score_cosine(
            jnp.asarray(xs), jnp.asarray(ls), n_clusters)),
        "davies_bouldin": float(davies_bouldin_index(
            jnp.asarray(xs), jnp.asarray(ls), n_clusters)),
        "calinski_harabasz": float(calinski_harabasz_index(
            jnp.asarray(xs), jnp.asarray(ls), n_clusters)),
        "cluster_sizes": sizes,
        "n_samples": int(n),
        "embedding_stats": {
            "mean": float(x.mean()), "std": float(x.std()),
            "min": float(x.min()), "max": float(x.max()),
        },
    }

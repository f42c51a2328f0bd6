"""PCA via eigendecomposition of the covariance.

TPU-native replacement for sklearn PCA/IncrementalPCA
(cluster_embeddings.py:57-79): one (D, D) eigh on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1,))
def pca_reduce(x: jnp.ndarray, n_components: int
               ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (reduced (N, C), components (C, D), explained_variance (C,))."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mean
    cov = (xc.T @ xc) / jnp.maximum(x.shape[0] - 1, 1)
    evals, evecs = jnp.linalg.eigh(cov)            # ascending
    comp = evecs[:, ::-1][:, :n_components].T      # (C, D), descending
    var = evals[::-1][:n_components]
    return xc @ comp.T, comp, var

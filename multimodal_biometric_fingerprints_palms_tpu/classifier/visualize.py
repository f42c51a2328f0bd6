"""Embedding visualization (t-SNE / UMAP / PCA scatter PNGs).

Rebuild of classifier/utils/cluster_embeddings.py:168-216: subsample to
max_points, PCA to 50 dims, t-SNE (adaptive perplexity) or UMAP to 2-D,
scatter colored by cluster label. Host-side matplotlib/sklearn —
visualization only, not on the TPU hot path (SURVEY.md §2.9). The UMAP
option (cluster_embeddings.py:189-193) uses umap-learn when installed and
otherwise falls back to a spectral embedding of the same kNN neighbor graph
UMAP would build (documented degradation, not a silent skip).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _umap_2d(x: np.ndarray, seed: int) -> np.ndarray:
    """UMAP reduction (cluster_embeddings.py:189-193). Uses umap-learn when
    available; otherwise a spectral embedding of the kNN graph (the manifold
    skeleton UMAP optimizes over) — same inputs, deterministic, no extra
    dependency."""
    try:
        import umap  # not in this image; gate, don't require

        return umap.UMAP(n_components=2, random_state=seed).fit_transform(x)
    except ImportError:
        from sklearn.manifold import SpectralEmbedding
        from sklearn.neighbors import kneighbors_graph

        nn = max(2, min(15, x.shape[0] - 1))
        graph = kneighbors_graph(x, nn, mode="connectivity",
                                 include_self=False)
        affinity = 0.5 * (graph + graph.T)  # symmetrize, fuzzy-union style
        emb = SpectralEmbedding(n_components=2, affinity="precomputed",
                                random_state=seed)
        return emb.fit_transform(affinity.toarray())


def visualize_embeddings(embeddings, labels, out_path: str | Path,
                         method: str = "tsne", max_points: int = 3000,
                         seed: int = 42) -> Path:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(embeddings)
    y = np.asarray(labels)
    n = x.shape[0]
    if n > max_points:
        idx = np.random.default_rng(seed).choice(n, max_points, replace=False)
        x, y = x[idx], y[idx]

    if method == "tsne" and n > 5:
        from sklearn.decomposition import PCA
        from sklearn.manifold import TSNE
        if x.shape[1] > 50:
            x = PCA(n_components=50, random_state=seed).fit_transform(x)
        perplexity = max(2, min(30, (x.shape[0] - 1) // 3))
        pts = TSNE(n_components=2, perplexity=perplexity,
                   random_state=seed, init="pca").fit_transform(x)
    elif method == "umap" and n > 5:
        pts = _umap_2d(x, seed)
    else:
        from sklearn.decomposition import PCA
        pts = PCA(n_components=2, random_state=seed).fit_transform(x)

    fig, ax = plt.subplots(figsize=(7, 6))
    sc = ax.scatter(pts[:, 0], pts[:, 1], c=y, s=8, cmap="tab10", alpha=0.8)
    fig.colorbar(sc, ax=ax, label="cluster")
    ax.set_title(f"Embeddings ({method})")
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path

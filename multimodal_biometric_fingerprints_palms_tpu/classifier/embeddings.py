"""Embedding extraction with npz cache.

Rebuild of classifier/utils/extract_embeddings.py:14-98: batched no-grad
forward using the projection-head output when a head exists (:72-76),
L2-normalization (:89-91), .npz cache keyed by path (:41-45, :96).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models.ssl_model import SSLModel
from .data import preprocess_image


def extract_embeddings(model: SSLModel, variables: dict,
                       paths: Sequence[str | Path],
                       batch_size: int = 32,
                       image_size: int = 256,
                       cache_file: str | Path | None = None,
                       overwrite: bool = False,
                       use_projection: bool = True,
                       l2_normalize: bool = True
                       ) -> tuple[np.ndarray, list[str]]:
    """Returns (embeddings (N, D), paths). Cached to ``cache_file`` npz."""
    if cache_file is not None:
        cache_file = Path(cache_file)
        if cache_file.exists() and not overwrite:
            data = np.load(cache_file, allow_pickle=True)
            return data["embeddings"], list(data["paths"])

    @jax.jit
    def forward(batch):
        proj, emb = model.apply(variables, batch, train=False,
                                return_embedding=True)
        return proj if use_projection else emb

    out, kept_paths = [], []
    batch_buf: list[np.ndarray] = []

    def flush():
        if not batch_buf:
            return
        real = len(batch_buf)
        arr = np.stack(batch_buf)
        if real < batch_size:  # pad to one static shape
            arr = np.concatenate(
                [arr, np.zeros((batch_size - real,) + arr.shape[1:], arr.dtype)])
        embs = np.asarray(forward(jnp.asarray(arr)))[:real]
        out.append(embs)
        batch_buf.clear()

    for p in paths:
        try:
            img = preprocess_image(p, resize=(image_size, image_size))
        except Exception:
            continue  # per-item fail-soft (extract_embeddings.py:80-82)
        batch_buf.append(img)
        kept_paths.append(str(p))
        if len(batch_buf) == batch_size:
            flush()
    flush()

    embeddings = (np.concatenate(out) if out
                  else np.zeros((0, model.proj_output_dim), np.float32))
    if l2_normalize and embeddings.size:
        norms = np.maximum(np.linalg.norm(embeddings, axis=1, keepdims=True),
                           1e-12)
        embeddings = embeddings / norms

    if cache_file is not None:
        cache_file.parent.mkdir(parents=True, exist_ok=True)
        np.savez(cache_file, embeddings=embeddings,
                 paths=np.asarray(kept_paths, dtype=object))
    return embeddings, kept_paths

"""Batch minutiae extraction driver.

Rebuild of src/features/extract_features.py:74-159: walks
``<input>/cluster_*/*_skeleton.jpg``, extracts + postprocesses minutiae in
device batches, and writes per image (schema-compatible with the reference,
extract_features.py:98-105):

  <out>/<cluster>/<base>_minutiae.json
  <out>/<cluster>/<base>_minutiae.jpg   (overlay: red=ending, green=bifurcation)
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.io import (
    read_image_grayscale, write_image, minutiae_to_json, save_minutiae_json,
)
from ..utils.logging import console_step, get_file_logger
from ..utils.transfer import device_unpackbits, host_packbits
from .minutiae import extract_minutiae
from .quality import postprocess_minutiae

logger = get_file_logger(__name__, "dataset/processed/minutiae/minutiae_extraction.log")


def _extract_batch(skels_packed: jnp.ndarray):
    """Skeletons arrive bit-packed (8 px/byte — the relay link is the
    transfer bottleneck, utils/transfer.py); unpack on device, extract."""
    skels = device_unpackbits(skels_packed).astype(jnp.float32)
    ms = extract_minutiae(skels)
    return postprocess_minutiae(ms, skels)


# Module-level jit: a fresh jax.jit wrapper per process_directory call would
# re-trace and re-compile each call (see preprocessing/runner.py note).
_EXTRACT_JIT = jax.jit(_extract_batch)


def _overlay(skel: np.ndarray, records: list[dict]) -> np.ndarray:
    vis = np.stack([(skel > 0.5).astype(np.uint8) * 255] * 3, axis=-1)
    for m in records:
        color = (255, 0, 0) if m["type"] == "ending" else (0, 255, 0)
        y, x = m["y"], m["x"]
        vis[max(0, y - 3):y + 4, max(0, x - 3):x + 4] = color
    return vis


def process_directory(input_base: str | Path = "dataset/processed/enhanced",
                      output_base: str | Path = "dataset/processed/minutiae",
                      batch_size: int = 32) -> dict:
    input_base, output_base = Path(input_base), Path(output_base)
    if not input_base.exists():
        raise FileNotFoundError(f"input base not found: {input_base}")

    skel_paths = sorted(input_base.rglob("*_skeleton.jpg"))
    if not skel_paths:
        logger.warning("no skeleton images under %s", input_base)
        return {"num_images": 0}

    console_step(f"Minutiae extraction: {len(skel_paths)} skeletons")

    images, metas = [], []
    for p in skel_paths:
        try:
            img = read_image_grayscale(p) > 127
        except Exception as e:
            logger.error("corrupt skeleton %s: %s", p, e)
            continue
        images.append(img)
        metas.append((p, img.shape))

    shape_h = max(m[1][0] for m in metas)
    shape_w = max(m[1][1] for m in metas)
    shape = (shape_h + (-shape_h) % 32, shape_w + (-shape_w) % 32)
    fn = _EXTRACT_JIT

    def _enqueue(i):
        chunk = images[i:i + batch_size]
        batch = np.zeros((batch_size, shape[0], shape[1]), bool)
        for j, img in enumerate(chunk):
            batch[j, :img.shape[0], :img.shape[1]] = img
        return fn(jnp.asarray(host_packbits(batch))), len(chunk)

    t_start = time.time()
    n_done = 0
    starts = list(range(0, len(images), batch_size))
    pending = _enqueue(starts[0]) if starts else None
    for bi, i in enumerate(starts):
        res, real = pending
        pending = _enqueue(starts[bi + 1]) if bi + 1 < len(starts) else None
        ms = jax.tree.map(np.asarray, res)

        for j in range(real):
            path, _ = metas[i + j]
            rel = path.parent.relative_to(input_base)
            out_dir = output_base / rel
            base = path.name.replace("_skeleton.jpg", "")
            records = minutiae_to_json(
                ms.xy[j], ms.minutia_type[j], ms.orientation[j],
                ms.quality[j], ms.coherence[j], ms.angular_stability[j],
                ms.valid[j])
            save_minutiae_json(out_dir / f"{base}_minutiae.json", records)
            write_image(out_dir / f"{base}_minutiae.jpg",
                        _overlay(images[i + j], records))
            logger.info("extracted %d minutiae from %s", len(records), path.name)
        n_done += real

    total = time.time() - t_start
    stats = {"num_images": n_done, "total_seconds": total,
             "images_per_second": n_done / max(total, 1e-9)}
    console_step(f"Done: {n_done} skeletons in {total:.1f}s")
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser(description="Batch minutiae extraction")
    ap.add_argument("--input", default="dataset/processed/enhanced")
    ap.add_argument("--output", default="dataset/processed/minutiae")
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args(argv)
    process_directory(args.input, args.output, batch_size=args.batch_size)


if __name__ == "__main__":
    main()

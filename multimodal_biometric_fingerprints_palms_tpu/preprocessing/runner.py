"""Batch preprocessing driver.

Rebuild of src/preprocessing/run_preprocessing.py:71-183. The reference
fans out one host thread per image (ThreadPoolExecutor(4), :154); here
images are padded to one canonical shape, stacked into device batches, and
the whole enhancement chain runs as one jit program per batch — files exist
only at the boundaries.

Outputs per image, preserving cluster subdirs (run_preprocessing.py:120-140):
  <out>/enhanced/<cluster>/<base>_enhanced.jpg   (segmented gray; the
      reference writes the raw input here due to a missing-key quirk,
      run_preprocessing.py:132 ``results.get("enhanced", img)``)
  <out>/enhanced/<cluster>/<base>_skeleton.jpg
  <out>/debug/<cluster>/<base>_{normalized,denoised,segmented,binary}.jpg
"""

from __future__ import annotations

import argparse
import functools
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.io import read_image_grayscale, write_image
from ..utils.logging import console_step, get_file_logger
from ..utils.transfer import device_packbits, device_to_u8, host_unpackbits
from .enhance import preprocess_fingerprint

_IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}

logger = get_file_logger(__name__, "data/metadata/preprocessing.log")


def _find_images(input_dir: Path) -> list[Path]:
    out = []
    for p in sorted(input_dir.rglob("*")):
        if (p.is_file() and p.suffix.lower() in _IMAGE_EXTS
                and not p.stem.endswith(("_enhanced", "_skeleton", "_minutiae"))):
            out.append(p)
    return out


def _canonical_shape(shapes, multiple: int = 32) -> tuple[int, int]:
    h = max(s[0] for s in shapes)
    w = max(s[1] for s in shapes)
    return h + (-h) % multiple, w + (-w) % multiple


@functools.lru_cache(maxsize=8)
def _packed_pipeline_fn(gabor: bool, gabor_items: tuple | None, debug: bool):
    """One jitted pipeline per (gabor, params, debug) config, cached at
    module level: a fresh jax.jit closure per run_preprocessing call would
    re-trace AND re-compile every call (the in-process pjit cache is keyed
    by wrapper identity, and the persistent cache does not hit under the
    axon relay backend — a 25+ s compile per call, measured).

    Only what gets written leaves the device, quantized: grays as uint8,
    masks bit-packed 8 px/byte (utils/transfer.py)."""
    gabor_params = dict(gabor_items) if gabor_items else None

    def _run_packed(batch_u8):
        x = batch_u8.astype(jnp.float32) / 255.0
        res = preprocess_fingerprint(x, gabor=gabor, gabor_params=gabor_params)
        out = {"enhanced": device_to_u8(res.segmented),
               "skeleton": device_packbits(res.skeleton)}
        if debug:
            out.update(normalized=device_to_u8(res.normalized),
                       denoised=device_to_u8(res.denoised),
                       binary=device_packbits(res.binary),
                       mask=device_packbits(res.mask))
        return out

    return jax.jit(_run_packed)


def run_preprocessing(input_dir: str | Path,
                      output_dir: str | Path = "dataset/processed",
                      batch_size: int = 32,
                      debug: bool = True,
                      small: bool = False,
                      use_native_loader: bool | None = None,
                      gabor: bool | None = None) -> dict:
    """Enhance every image under ``input_dir`` (recursively; cluster_*
    subdirs preserved). Returns per-stage timing stats.

    use_native_loader: None = auto (use the C++ thread-pool decoder when
    the host has multiple cores), True/False to force.
    """
    input_dir, output_dir = Path(input_dir), Path(output_dir)
    enhanced_dir = output_dir / "enhanced"
    debug_dir = output_dir / "debug"

    paths = _find_images(input_dir)
    if small:  # reference --small: first 10 images (run_preprocessing.py:93-95)
        paths = paths[:10]
    if not paths:
        logger.warning("no images under %s", input_dir)
        return {"num_images": 0}

    console_step(f"Preprocessing {len(paths)} images from {input_dir}")

    if use_native_loader is None:
        import os
        use_native_loader = (os.cpu_count() or 1) > 2
    native = None
    if use_native_loader:
        from ..utils.native_loader import native_available
        native = native_available()

    # Host staging is uint8: the device casts to f32/255 itself, so the
    # upload link carries 4x fewer bytes (utils/transfer.py rationale).
    images, metas = [], []
    if native:
        from ..utils.native_loader import batch_load_u8
        # chunked decode into a bounded staging buffer, cropped per image;
        # the u8 path decodes JPEG rows straight into the batch buffer —
        # no host-side float roundtrip (the device casts to f32/255)
        cap = 1024
        for i0 in range(0, len(paths), batch_size):
            chunk = paths[i0:i0 + batch_size]
            staged, status, ws, hs = batch_load_u8(chunk, cap, cap)
            for j, p in enumerate(chunk):
                if status[j] != 0:
                    logger.error("unreadable image %s", p)
                    continue
                images.append(staged[j, :hs[j], :ws[j]])
                metas.append((p, (int(hs[j]), int(ws[j]))))
    else:
        for p in paths:
            try:
                img = read_image_grayscale(p)
            except Exception as e:
                logger.error("unreadable image %s: %s", p, e)
                continue
            images.append(img)
            metas.append((p, img.shape))
    if not images:
        return {"num_images": 0}

    shape = _canonical_shape([m[1] for m in metas])
    # Config-gated (preprocessing.gabor.enabled); the configured params
    # (n_orientations, block_size, kernel_size, ...) apply whether gabor was
    # requested explicitly or via config, and the gate key itself is
    # stripped before reaching preprocess_fingerprint.
    if gabor is None or gabor:
        from ..config import load_fingerprint_config
        gcfg = load_fingerprint_config().get("preprocessing.gabor", {}) or {}
        gcfg = dict(gcfg) if hasattr(gcfg, "get") else {}
        if gabor is None:
            gabor = bool(gcfg.get("enabled", False))
        gcfg.pop("enabled", None)
        gabor_params = gcfg if gabor else None
    else:
        gabor_params = None
    fn = _packed_pipeline_fn(
        gabor,
        tuple(sorted(gabor_params.items())) if gabor_params else None,
        debug)

    def _enqueue(i):
        chunk = images[i:i + batch_size]
        batch = np.zeros((batch_size,) + shape, np.uint8)
        for j, img in enumerate(chunk):  # last chunk stays padded to size
            batch[j, :img.shape[0], :img.shape[1]] = img
        return fn(jnp.asarray(batch)), len(chunk)

    t_start = time.time()
    n_done = 0
    starts = list(range(0, len(images), batch_size))
    # One-batch lookahead: batch i+1 computes while batch i's outputs are
    # fetched and written (the device stream is in-order).
    pending = _enqueue(starts[0]) if starts else None
    for bi, i in enumerate(starts):
        res, real = pending
        pending = _enqueue(starts[bi + 1]) if bi + 1 < len(starts) else None
        res = jax.tree.map(np.asarray, res)
        skeleton = host_unpackbits(res["skeleton"], shape[1])
        if debug:
            binary = host_unpackbits(res["binary"], shape[1])
            fgmask = host_unpackbits(res["mask"], shape[1])

        for j in range(real):
            path, (ih, iw) = metas[i + j]
            rel = path.parent.relative_to(input_dir)
            out_sub = enhanced_dir / rel
            base = path.stem
            write_image(out_sub / f"{base}_enhanced.jpg",
                        res["enhanced"][j][:ih, :iw])
            write_image(out_sub / f"{base}_skeleton.jpg",
                        skeleton[j][:ih, :iw].astype(np.uint8) * 255)
            if debug:
                dbg = debug_dir / rel
                write_image(dbg / f"{base}_normalized.jpg",
                            res["normalized"][j][:ih, :iw])
                write_image(dbg / f"{base}_denoised.jpg",
                            res["denoised"][j][:ih, :iw])
                write_image(dbg / f"{base}_segmented.jpg",
                            res["enhanced"][j][:ih, :iw])
                write_image(dbg / f"{base}_binary.jpg",
                            binary[j][:ih, :iw].astype(np.uint8) * 255)
                mask_dir = dbg / "mask"
                write_image(mask_dir / path.name,
                            fgmask[j][:ih, :iw].astype(np.uint8) * 255)
            logger.info("processed %s", path.name)
        n_done += real

    total = time.time() - t_start
    stats = {
        "num_images": n_done,
        "total_seconds": total,
        "images_per_second": n_done / max(total, 1e-9),
        "canonical_shape": shape,
    }
    console_step(f"Done: {n_done} images in {total:.1f}s "
                 f"({stats['images_per_second']:.1f} img/s)")
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser(description="Batch fingerprint preprocessing")
    ap.add_argument("--input", default="dataset/sorted_dataset")
    ap.add_argument("--output", default="dataset/processed")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--no-debug", action="store_true")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args(argv)
    run_preprocessing(args.input, args.output, batch_size=args.batch_size,
                      debug=not args.no_debug, small=args.small)


if __name__ == "__main__":
    main()

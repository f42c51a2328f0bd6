"""Host-side-only costs of the file pipeline: decode and result writes.

The file->minutiae number from bench_file_pipeline.py is TUNNEL-bound in
this environment (the axon relay's ~12 MB/s host link dominates); this
companion isolates what the HOST actually has to do per image — JPEG decode
(native C++ batch loader and cv2), minutiae-JSON writes, and skeleton-JPEG
writes — with no device in the loop. On a real PCIe-attached TPU host these
run on CPU threads overlapped with device compute by the double-buffered
runner (preprocessing/runner.py), so the pipeline rate is
min(host rate here, device rate from bench.py). Reference workload:
run_preprocessing.py:71-183 decode + extract_features.py:98-105 writes.

    python benchmarks/bench_host_side.py [--n 512]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()

    import cv2
    from bench import make_batch
    from multimodal_biometric_fingerprints_palms_tpu.utils import native_loader

    root = Path(tempfile.mkdtemp(prefix="mbfp_hostbench_"))
    src = root / "imgs"
    src.mkdir(parents=True)
    imgs = make_batch(min(args.n, 128))
    paths = []
    for i in range(args.n):
        u8 = (imgs[i % len(imgs)] * 255).astype(np.uint8)
        p = src / f"{i // 10}_{1}_{i % 10}.jpg"
        cv2.imwrite(str(p), u8)
        paths.append(str(p))

    out = {"n_images": args.n, "cpus": None}
    try:
        out["cpus"] = __import__("os").cpu_count()
    except Exception:
        pass

    # -- JPEG decode: native threaded batch loader --------------------------
    # u8 path = what the runner actually stages (decode rows land directly
    # in the padded uint8 batch buffer; no host float roundtrip). The old
    # float path is kept for comparison — its 2x penalty vs u8 was the
    # round-4 "native slower than cv2" finding.
    if native_loader.native_available():
        native_loader.batch_load_u8(paths[:8], 320, 256)  # warm
        t0 = time.perf_counter()
        native_loader.batch_load_u8(paths, 320, 256)
        dt = time.perf_counter() - t0
        out["decode_native_u8_img_per_sec"] = round(args.n / dt, 1)
        t0 = time.perf_counter()
        native_loader.batch_load(paths, 320, 256)
        dt = time.perf_counter() - t0
        out["decode_native_f32_img_per_sec"] = round(args.n / dt, 1)

    # -- JPEG decode: cv2 + pack (the reference's load_image + batch pad) ---
    # Fair arm: cv2.imread returns a bare uint8 array; the pipeline still
    # has to place it in the padded batch, so the pack is timed too.
    t0 = time.perf_counter()
    batch = np.zeros((args.n, 320, 256), np.uint8)
    for i, p in enumerate(paths):
        im = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        batch[i, :im.shape[0], :im.shape[1]] = im
    dt = time.perf_counter() - t0
    out["decode_cv2_img_per_sec"] = round(args.n / dt, 1)

    # -- minutiae JSON writes (60 records each, the per-image cap) ----------
    recs = [{"x": 10 + i, "y": 20 + i, "type": "ending",
             "orientation": 0.31, "quality": 0.7, "coherence": 0.6,
             "angular_stability": 0.8} for i in range(60)]
    jdir = root / "json"
    jdir.mkdir()
    t0 = time.perf_counter()
    for i in range(args.n):
        with open(jdir / f"{i}_minutiae.json", "w") as f:
            json.dump(recs, f)
    dt = time.perf_counter() - t0
    out["json_write_img_per_sec"] = round(args.n / dt, 1)

    # -- skeleton + enhanced JPEG writes (2 per image) -----------------------
    u8 = (imgs[0] * 255).astype(np.uint8)
    sdir = root / "out"
    sdir.mkdir()
    t0 = time.perf_counter()
    for i in range(args.n):
        cv2.imwrite(str(sdir / f"{i}_enhanced.jpg"), u8)
        cv2.imwrite(str(sdir / f"{i}_skeleton.jpg"), u8)
    dt = time.perf_counter() - t0
    out["jpeg_write_pairs_per_sec"] = round(args.n / dt, 1)

    # serial composition = everything the host does per image, one thread,
    # with the decode arm the runner actually deploys (native u8 if built)
    dec = out.get("decode_native_u8_img_per_sec",
                  out["decode_cv2_img_per_sec"])
    serial = (1.0 / dec
              + 1.0 / out["json_write_img_per_sec"]
              + 1.0 / out["jpeg_write_pairs_per_sec"])
    out["metric"] = "host-side serial img/sec (decode + JSON + 2 JPEG writes)"
    out["value"] = round(1.0 / serial, 1)
    out["unit"] = "images/sec"
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""File-to-minutiae throughput: the reference's ACTUAL workload.

disk JPEG -> (native C++ batch loader | cv2) -> device batches ->
enhance+extract -> minutiae JSON files — i.e. the composition of
run_preprocessing.py:71-183 and extract_features.py:113-159, end to end
through the filesystem, so host decode and I/O can't silently hide behind
the device-only number reported by bench.py.

Writes N synthetic PolyU-like JPEGs to a temp dir, runs
preprocessing.runner.run_preprocessing + features.runner.process_directory,
and reports images/sec for the whole file->file pipeline.

    python benchmarks/bench_file_pipeline.py [--n 512] [--batch 128]
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


def _setup_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mbfp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    _setup_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import cv2
    from bench import make_batch
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing.runner import (
        run_preprocessing,
    )
    from multimodal_biometric_fingerprints_palms_tpu.features.runner import (
        process_directory,
    )

    root = Path(tempfile.mkdtemp(prefix="mbfp_filebench_"))
    src = root / "dataset" / "cluster_0"
    src.mkdir(parents=True)
    imgs = make_batch(min(args.n, 128))
    for i in range(args.n):
        u8 = (imgs[i % len(imgs)] * 255).astype(np.uint8)
        cv2.imwrite(str(src / f"{i // 10}_{1}_{i % 10}.jpg"), u8)

    enhanced = root / "processed" / "enhanced"
    minutiae = root / "processed" / "minutiae"

    # warm-up on a copy of the first few files (compile)
    warm = root / "warm"
    (warm / "cluster_0").mkdir(parents=True)
    for f in sorted(src.glob("*.jpg"))[:args.batch]:
        shutil.copy(f, warm / "cluster_0" / f.name)
    run_preprocessing(warm, root / "warm_out", batch_size=args.batch,
                      debug=False)
    process_directory(root / "warm_out", root / "warm_min")

    t0 = time.perf_counter()
    run_preprocessing(root / "dataset", enhanced, batch_size=args.batch,
                      debug=False)
    t_pre = time.perf_counter() - t0
    t0 = time.perf_counter()
    process_directory(enhanced, minutiae)
    t_feat = time.perf_counter() - t0

    n_json = len(list(minutiae.rglob("*_minutiae.json")))
    dt = t_pre + t_feat
    print(json.dumps({
        "metric": "file->minutiae-JSON images/sec (disk JPEG in, JSON out)",
        "value": round(args.n / dt, 2),
        "unit": "images/sec",
        "n_images": args.n,
        "n_json": n_json,
        "seconds_preprocess": round(t_pre, 2),
        "seconds_features": round(t_feat, 2),
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

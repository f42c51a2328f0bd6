"""Measure the Gabor extension's EER effect (VERDICT r2 item 9 /
r3 item 5).

The Gabor enhancement stage (ops/gabor.py) is the config-gated extension
the reference chain does not have (preprocessing.gabor.enabled). This
script runs a hard-impostor protocol (N users x 2 sessions, every print
sharing the global ridge field) twice — gabor OFF and gabor ON — and
records EER, score-distribution separation, and minutiae counts for both,
so the default can be chosen from data.

Round-3 measured EER = 0 in BOTH arms (floor effect: all genuine pairs
scored ~0.78, all impostors 0), so the round-4 protocol degrades the
second session NIST-style — random rigid transform, heavy sensor noise,
blur, contrast loss, occlusion smudges — until a fraction of genuine pairs
genuinely fails (baseline EER > 0) and the Gabor arm has signal to recover.

    python benchmarks/gabor_eer.py [--users 32] [--out docs/artifacts]
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


def _print(seed, phase=0.0, h=320, w=256):
    """Same generator as tests/test_end_to_end_eer.py: shared global ridge
    geometry; only blob constellations (the minutiae sources) differ."""
    g = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = np.sqrt(((yy - h / 2) / 1.1) ** 2 + (xx - w / 2) ** 2)
    ang = np.arctan2(yy - h / 2, xx - w / 2)
    ridges = 0.5 + 0.5 * np.cos(r / 4.5 + 2.0 * np.sin(3 * ang) + phase)
    blobs = np.zeros((h, w), np.float32)
    for _ in range(110):
        by, bx = g.integers(40, h - 40), g.integers(40, w - 40)
        rr = g.integers(2, 6)
        blobs[by - rr:by + rr, bx - rr:bx + rr] = 1.0
    ell = (((yy - h / 2) / (0.42 * h)) ** 2 + ((xx - w / 2) / (0.40 * w)) ** 2) < 1
    img = np.where(ell, 1.0 - 0.8 * ridges * (1 - 0.9 * blobs), 0.95)
    return (np.clip(img + g.normal(0, 0.02, (h, w)), 0, 1) * 255).astype(np.uint8)


def _degrade(img: np.ndarray, seed: int, severity: float = 1.0) -> np.ndarray:
    """NIST-style second-session degradation (README.md:80-91 'stress-test'
    difficulty): random rigid placement, heavy zero-mean sensor noise, optic
    blur, contrast loss, and occlusion smudges. ``severity`` scales every
    knob: the round-4 full-strength protocol (severity=1.0) measured EER 0.5
    in BOTH arms (genuine matching destroyed outright — the opposite failure
    of the round-3 floor), so the round-5 artifact sweeps severity for an
    off-arm EER strictly inside (0, 0.5) where the comparison has signal."""
    import cv2
    g = np.random.default_rng(1000 + seed)
    s = float(severity)
    h, w = img.shape
    theta = g.uniform(-12, 12) * s
    tx, ty = g.uniform(-10, 10, 2) * s
    M = cv2.getRotationMatrix2D((w / 2, h / 2), theta, 1.0)
    M[:, 2] += (tx, ty)
    out = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=242)
    f = out.astype(np.float32) / 255.0
    if s > 0.2:
        f = cv2.GaussianBlur(f, (5, 5), max(1e-3, 1.0 * s))
    f = 0.5 + (1.0 - 0.45 * s) * (f - 0.5)         # contrast loss
    for _ in range(int(round(6 * s))):             # smudges
        cy, cx = g.integers(30, h - 30), g.integers(30, w - 30)
        ax_, ay_ = int(g.integers(8, 26)), int(g.integers(6, 18))
        cv2.ellipse(f, (int(cx), int(cy)), (ax_, ay_), float(g.uniform(0, 180)),
                    0, 360, float(g.uniform(0.55, 0.8)), -1)
    f = f + g.normal(0, 0.10 * s, (h, w)).astype(np.float32)
    return (np.clip(f, 0, 1) * 255).astype(np.uint8)


def run_once(root: Path, gabor: bool, n_users: int, batch: int,
             severity: float = 1.0) -> dict:
    import cv2
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing.runner import (
        run_preprocessing)
    from multimodal_biometric_fingerprints_palms_tpu.features.runner import (
        process_directory)
    from multimodal_biometric_fingerprints_palms_tpu.matching import runner as mrun

    cluster = root / "sorted" / "cluster_0"
    cluster.mkdir(parents=True)
    for user in range(1, n_users + 1):
        base = _print(10 + user)
        cv2.imwrite(str(cluster / f"{user}_1_1.jpg"), base)
        cv2.imwrite(str(cluster / f"{user}_1_2.jpg"),
                    _degrade(_print(10 + user, 0.06), 10 + user, severity))

    t0 = time.time()
    run_preprocessing(root / "sorted", root / "processed", batch_size=batch,
                      debug=False, gabor=gabor)
    process_directory(root / "processed" / "enhanced",
                      root / "processed" / "minutiae", batch_size=batch)
    res = mrun.main(demo=False,
                    minutiae_base=str(root / "processed" / "minutiae"),
                    logs_dir=str(root / "logs"))
    n_min = [m.shape[0] for m in res.get("minutiae_counts", [])] \
        if "minutiae_counts" in res else None
    return {
        "gabor": gabor,
        "severity": severity,
        "eer": float(res["eer"]),
        "genuine_mean": float(res["genuine_scores"].mean()),
        "genuine_std": float(res["genuine_scores"].std()),
        "impostor_mean": float(res["impostor_scores"].mean()),
        "impostor_q99": float(np.quantile(res["impostor_scores"], 0.99)),
        "genuine_pairs": int(res["genuine_pairs"]),
        "impostor_pairs": int(res["impostor_pairs"]),
        "seconds": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=32)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="docs/artifacts")
    ap.add_argument("--severity", type=float, default=1.0)
    ap.add_argument("--sweep", action="store_true",
                    help="off-arm severity sweep only (protocol tuning)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mbfp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.sweep:
        for sev in (0.35, 0.5, 0.65, 0.8):
            root = Path(tempfile.mkdtemp(prefix="mbfp_gaborsweep_"))
            try:
                r = run_once(root, False, args.users, args.batch, sev)
                print(json.dumps(r), flush=True)
            finally:
                shutil.rmtree(root, ignore_errors=True)
        return

    results = []
    for gabor in (False, True):
        root = Path(tempfile.mkdtemp(prefix=f"mbfp_gabor{int(gabor)}_"))
        try:
            results.append(run_once(root, gabor, args.users, args.batch,
                                    args.severity))
            print(json.dumps(results[-1]), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    artifact = {
        "protocol": f"hard-impostor shared-ridge-field, {args.users} users"
                    f" x 2, NIST-style degraded second session"
                    f" (severity {args.severity})",
        "device": str(jax.devices()[0]),
        "off": results[0], "on": results[1],
        "eer_delta_on_minus_off": results[1]["eer"] - results[0]["eer"],
    }
    (out_dir / "gabor_eer_r5.json").write_text(json.dumps(artifact, indent=2))
    print(json.dumps({"eer_off": results[0]["eer"],
                      "eer_on": results[1]["eer"]}))


if __name__ == "__main__":
    main()

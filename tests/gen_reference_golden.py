"""Generate the committed full-protocol golden artifact from the REFERENCE.

Drives /root/reference's own evaluation stack end-to-end — FRR.compute_frr
(FRR.py:67), FAR.compute_far (FAR.py:35) with the full-mode settings of
match_features.main (match_features.py:102-109,126-151: max_per_user 2,
ransac 300, FRR dist 30/orient 30/min_inliers 6, FAR dist 15/orient 10/
min_inliers 12, stop 0.15, 50 threshold points) — on the committed
tests/fixtures/parity_full set, and writes the resulting 50-point FRR/FAR
curves + EER + raw scores to tests/fixtures/parity_full_golden.json.

The reference samples FAR peers with the UNSEEDED `random` module
(FAR.py:30); with 40 fixture users and sample_size=100 every user draws all
39 others, so the draw is moot and the protocol is deterministic up to the
reference's own RANSAC threading races (which full-mode avoids:
thread_workers defaults inside compute_frr/far workers use 1 thread for FAR
and the FRR executor is max_workers=1).

    python tests/gen_reference_golden.py
"""

from __future__ import annotations

import json
import os
import sys
import random
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
REFERENCE = Path("/root/reference")
FIXTURES = HERE / "fixtures" / "parity_full"
OUT = HERE / "fixtures" / "parity_full_golden.json"


def main():
    sys.path.insert(0, str(REFERENCE))
    os.makedirs("logs", exist_ok=True)  # FRR.py writes logs/ relative to cwd
    from src.matching.match_features import load_dataset
    from src.matching.FRR import compute_frr
    from src.matching.FAR import compute_far
    from src.matching.utils import (
        evaluate_frr_across_thresholds, evaluate_far_across_thresholds)

    np.random.seed(42)
    random.seed(42)  # FAR sampling (moot at 40 users, but pinned anyway)

    dataset = load_dataset(str(FIXTURES), max_per_user=2)
    print(f"users: {len(dataset)}")

    genuine = compute_frr(
        dataset, dist_thresh=30, orient_thresh_deg=30, use_type=True,
        ransac_iter=300, min_inliers=6)
    print(f"genuine: n={len(genuine)} mean={np.mean(genuine):.4f}")

    impostor = compute_far(
        dataset, dist_thresh=15, orient_thresh_deg=10, use_type=True,
        ransac_iter=300, min_inliers=12)
    print(f"impostor: n={len(impostor)} mean={np.mean(impostor):.4f}")

    th, frr = evaluate_frr_across_thresholds(genuine, num_points=50)
    _, far = evaluate_far_across_thresholds(impostor, num_points=50)
    frr = np.asarray(frr, float)
    far = np.asarray(far, float)
    # EER: crossing of the two curves over the same threshold grid
    d = frr - far
    k = int(np.argmin(np.abs(d)))
    eer = float((frr[k] + far[k]) / 2.0)

    OUT.write_text(json.dumps({
        "protocol": {
            "max_per_user": 2, "ransac_iter": 300,
            "frr": {"dist": 30, "orient_deg": 30, "min_inliers": 6},
            "far": {"dist": 15, "orient_deg": 10, "min_inliers": 12},
            "stop_inlier_ratio": 0.15, "num_points": 50,
        },
        "thresholds": np.linspace(0, 1, 50).tolist(),
        "frr": frr.tolist(),
        "far": far.tolist(),
        "eer": eer,
        "genuine_scores": [float(s) for s in genuine],
        "impostor_scores": [float(s) for s in impostor],
    }, indent=1))
    print(f"wrote {OUT} (EER {eer:.4f})")


if __name__ == "__main__":
    main()

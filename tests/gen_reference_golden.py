"""Generate the committed full-protocol golden artifact from the REFERENCE.

Drives /root/reference's own evaluation stack end-to-end — FRR.compute_frr
(FRR.py:67), FAR.compute_far (FAR.py:35) with the full-mode settings of
match_features.main (match_features.py:102-109,126-151: ransac 300,
FRR dist 30/orient 30/min_inliers 6, FAR dist 15/orient 10/min_inliers 12,
stop 0.15, 50 threshold points) — on the committed
tests/fixtures/parity_full set, and writes the resulting 50-point FRR/FAR
curves + EER + raw scores to tests/fixtures/parity_full_golden.json.

TWO deviations from full mode, both aimed at making tight parity
MEANINGFUL (VERDICT round-3 item 6):

1. max_per_user raised 2 -> 4 (all four committed impressions per user),
   growing the genuine-pair count from 32 to 32*C(4,2) = 192 so pointwise
   curve tolerances can be cut ~6x.
2. stop_inlier_ratio raised 0.15 -> 2.0 (early stop disabled, best-of-300
   hypotheses by score). Measured justification: with the stock 0.15 the
   reference's OWN genuine scores are nondeterministic run-to-run — the
   early stop fires on the first `as_completed` future over a 4-thread
   pool (match.py:156-166), so WHICH hypothesis wins is a thread-
   scheduling race; two same-protocol reference runs agree only at
   per-pair corr 0.68 (max |score diff| 0.46, 17/84 high-cluster pairs
   flip), and two different hypothesis seed streams agree at corr ~0.06 —
   i.e. pointwise parity tighter than the reference's own reproducibility
   is unmeasurable. With the stop disabled, two DIFFERENT reference seed
   streams agree at per-pair corr 0.997, max |score diff| 0.011, FRR-curve
   max diff 0.005: the protocol becomes a stream-independent function of
   the pair, so a second implementation (ours) can be held to ~2.5/192
   pointwise. Both stacks run the identical no-stop protocol.

The reference samples FAR peers with the UNSEEDED `random` module
(FAR.py:30); with 40 fixture users and sample_size=100 every user draws all
39 others, so the draw is moot. With the early stop disabled the remaining
thread-pool nondeterminism (inner RANSAC pool, match.py:143-166) cannot
change the result either: best-of-300 by score is order-independent.

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

    dataset = load_dataset(str(FIXTURES), max_per_user=4)
    print(f"users: {len(dataset)}")

    genuine = compute_frr(
        dataset, dist_thresh=30, orient_thresh_deg=30, use_type=True,
        ransac_iter=300, min_inliers=6, stop_inlier_ratio=2.0)
    print(f"genuine: n={len(genuine)} mean={np.mean(genuine):.4f}")

    impostor = compute_far(
        dataset, dist_thresh=15, orient_thresh_deg=10, use_type=True,
        ransac_iter=300, min_inliers=12, stop_inlier_ratio=2.0)
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
            "max_per_user": 4, "ransac_iter": 300,
            "frr": {"dist": 30, "orient_deg": 30, "min_inliers": 6},
            "far": {"dist": 15, "orient_deg": 10, "min_inliers": 12},
            "stop_inlier_ratio": 2.0, "num_points": 50,
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

"""Evaluation metrics: FRR/FAR threshold sweeps, EER, score reports.

Rebuild of src/matching/utils.py:29-122. The reference's per-threshold
Python loops become one broadcast comparison; conventions preserved:
FRR(t) = mean(genuine < t), FAR(t) = mean(impostor >= t) over
linspace(0, 1, num_points) (utils.py:41-86).
"""

from __future__ import annotations

import csv
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def evaluate_frr_across_thresholds(genuine_scores, num_points: int = 50,
                                   verbose: bool = False):
    thresholds = np.linspace(0.0, 1.0, num_points)
    g = np.asarray(genuine_scores, dtype=np.float64)
    frr = (g[None, :] < thresholds[:, None]).mean(axis=1) if g.size else np.zeros(num_points)
    if verbose:
        for t, v in zip(thresholds, frr):
            print(f"{t:8.3f} | {v:8.3f}")
    return thresholds, frr


def evaluate_far_across_thresholds(impostor_scores, num_points: int = 50,
                                   verbose: bool = False):
    thresholds = np.linspace(0.0, 1.0, num_points)
    s = np.asarray(impostor_scores, dtype=np.float64)
    far = (s[None, :] >= thresholds[:, None]).mean(axis=1) if s.size else np.zeros(num_points)
    if verbose:
        for t, v in zip(thresholds, far):
            print(f"{t:8.3f} | {v:8.3f}")
    return thresholds, far


def compute_eer(thresholds, frr, far) -> tuple[float, float]:
    """Equal-error rate: the crossing of FRR (rising) and FAR (falling),
    linearly interpolated. Returns (eer, threshold_at_eer)."""
    frr = np.asarray(frr, dtype=np.float64)
    far = np.asarray(far, dtype=np.float64)
    diff = frr - far
    idx = np.where(np.diff(np.sign(diff)) != 0)[0]
    if len(idx) == 0:
        i = int(np.argmin(np.abs(diff)))
        return float((frr[i] + far[i]) / 2.0), float(thresholds[i])
    i = int(idx[0])
    d0, d1 = diff[i], diff[i + 1]
    w = 0.0 if d1 == d0 else -d0 / (d1 - d0)
    eer = float(frr[i] + w * (frr[i + 1] - frr[i]))
    far_i = float(far[i] + w * (far[i + 1] - far[i]))
    thr = float(thresholds[i] + w * (thresholds[i + 1] - thresholds[i]))
    return (eer + far_i) / 2.0, thr


def report_scores(title: str, scores) -> dict:
    """Count/mean/min/max/std report (utils.py:29-39)."""
    s = np.asarray(scores, dtype=np.float64)
    stats = {"title": title, "count": int(s.size)}
    if s.size:
        stats.update(mean=float(s.mean()), min=float(s.min()),
                     max=float(s.max()), std=float(s.std()))
    print(f"\n=== {title} ===")
    for k, v in stats.items():
        if k != "title":
            print(f"{k}: {v}")
    return stats


def compute_minutiae_statistics(dataset: dict,
                                output_file: str | Path = "logs/minutiae_stats.csv"):
    """Per-sample minutiae stats CSV with the reference's exact header
    (utils.py:88-122). ``dataset``: {user_id: [(N,7) arrays]}."""
    output_file = Path(output_file)
    output_file.parent.mkdir(parents=True, exist_ok=True)
    header = [
        "user_id", "sample_index", "num_minutiae",
        "mean_quality", "std_quality",
        "mean_orientation", "std_orientation",
        "mean_stability", "std_stability",
        "min_x", "max_x", "min_y", "max_y",
    ]
    with open(output_file, "w", newline="") as fout:
        writer = csv.writer(fout)
        writer.writerow(header)
        for user_id, samples in dataset.items():
            for idx, m in enumerate(samples):
                m = np.asarray(m)
                if m.shape[0] == 0:
                    continue
                writer.writerow([
                    user_id, idx, m.shape[0],
                    np.mean(m[:, 4]), np.std(m[:, 4]),
                    np.mean(m[:, 3]), np.std(m[:, 3]),
                    np.mean(m[:, 6]), np.std(m[:, 6]),
                    np.min(m[:, 0]), np.max(m[:, 0]),
                    np.min(m[:, 1]), np.max(m[:, 1]),
                ])
    logger.info("minutiae statistics saved to %s", output_file)
    return output_file

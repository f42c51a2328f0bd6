"""Matching & evaluation orchestrator.

Rebuild of src/matching/match_features.py:75-173 + FRR.py + FAR.py. The
reference matches pairs one per thread/process (FRR.py:105,
FAR.py:73-76); here genuine and impostor pairs are index arrays into one
(S, K) gallery tensor, matched in fixed-size device chunks via
`match_pairs_batch` — the chunk is one vmapped jit call.

Config is read with live nested keys (the reference's flat reads dead-ended
config_matching.yml, match_features.py:81-84); demo mode mirrors the
reference's --demo (max 3 genuine pairs/user, 50 RANSAC iters, min_inliers
3, 5 impostor peers: match_features.py:93-100, FRR.py:114-115, FAR.py:49-51).
"""

from __future__ import annotations

import argparse
import csv
import math
import time
from pathlib import Path

import numpy as np
import jax

from ..config import load_matching_config
from ..evaluation import (
    evaluate_frr_across_thresholds, evaluate_far_across_thresholds,
    compute_eer, report_scores, compute_minutiae_statistics, plot_roc,
)
from ..utils.logging import console_step, get_file_logger
from .dataset import load_dataset, genuine_pairs, impostor_pairs, MinutiaeDataset
from .ransac import MatchParams, match_pairs_batch

import functools


@functools.partial(jax.jit, static_argnums=(2,))
def _jit_pallas_batch(a, b, params):
    from .pallas_match import match_pairs_batch_pallas
    return match_pairs_batch_pallas(a, b, params)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _jit_screen_batch(a, b, params, use_pallas=True):
    from .ransac import screen_promote_batch
    return screen_promote_batch(a, b, params, use_pallas)

import logging

# File handler + level are attached in main() from logging.* config keys;
# library use of this module never writes files on import.
logger = logging.getLogger(__name__)


def match_pair_indices(ds: MinutiaeDataset, pairs: np.ndarray,
                       params: MatchParams, chunk: int = 512,
                       cascade: bool = False,
                       screen_iters: int = 32) -> dict:
    """Match (P, 2) sample-index pairs in fixed-size device chunks.
    Returns arrays of final_score / n_inliers / theta / t per pair.

    cascade=True runs a two-phase screen: a cheap pass with
    ``screen_iters`` RANSAC hypotheses for every pair, then the full
    ``params.ransac_iter`` pass only for pairs the screen didn't hard-
    reject. Impostor pairs overwhelmingly fail the screen (spatial-std
    reject or zero inliers under any hypothesis), so the expensive pass
    runs on a small fraction of the workload.
    """
    n = pairs.shape[0]
    if n == 0:
        return {"final_score": np.zeros(0), "n_inliers": np.zeros(0, np.int32),
                "theta": np.zeros(0), "t": np.zeros((0, 2))}

    if cascade and params.ransac_iter > screen_iters:
        # full_iters makes the screen's hypotheses a true prefix of the
        # full pass's uniform sequence (same seed, sliced draw).
        screen_p = params._replace(ransac_iter=screen_iters,
                                   full_iters=params.ransac_iter,
                                   min_inliers=max(3, params.min_inliers - 2))
        # shared screen (finish-free Pallas kernel on TPU, full matcher on
        # CPU, + deterministic recall anchors); chunks enqueued before any
        # mask is fetched
        use_pallas = jax.default_backend() == "tpu"
        pending = []
        for i in range(0, n, chunk):
            idx = pairs[i:i + chunk]
            real = idx.shape[0]
            if real < chunk:
                idx = np.concatenate(
                    [idx, np.tile(idx[-1:], (chunk - real, 1))])
            a = jax.tree.map(lambda x: x[idx[:, 0]], ds.stacked)
            b = jax.tree.map(lambda x: x[idx[:, 1]], ds.stacked)
            pending.append(
                (_jit_screen_batch(a, b, screen_p, use_pallas), real))
        promising = np.concatenate(
            [np.asarray(m)[:real] for m, real in pending])
        out = {
            "final_score": np.zeros(n), "n_inliers": np.zeros(n, np.int32),
            "theta": np.zeros(n), "t": np.zeros((n, 2)),
        }
        idx = np.nonzero(promising)[0]
        if idx.size:
            full = match_pair_indices(ds, pairs[idx], params, chunk=chunk)
            for key in out:
                out[key][idx] = full[key]
        return out
    # Enqueue every chunk before fetching any result: the device stream is
    # in-order and dispatch through the TPU relay costs ~33 ms per synced
    # call, so fetch-per-chunk would serialize latency with compute.
    pending = []
    for i in range(0, n, chunk):
        idx = pairs[i:i + chunk]
        real = idx.shape[0]
        if real < chunk:  # pad to fixed chunk shape (single compilation)
            idx = np.concatenate([idx, np.tile(idx[-1:], (chunk - real, 1))])
        a = jax.tree.map(lambda x: x[idx[:, 0]], ds.stacked)
        b = jax.tree.map(lambda x: x[idx[:, 1]], ds.stacked)
        if jax.default_backend() == "tpu":
            res = _jit_pallas_batch(a, b, params)
        else:
            res = match_pairs_batch(a, b, params)
        pending.append((res, real))
    out_scores = [np.asarray(r.final_score)[:real] for r, real in pending]
    out_inl = [np.asarray(r.n_inliers)[:real] for r, real in pending]
    out_theta = [np.asarray(r.theta)[:real] for r, real in pending]
    out_t = [np.asarray(r.t)[:real] for r, real in pending]
    return {
        "final_score": np.concatenate(out_scores),
        "n_inliers": np.concatenate(out_inl),
        "theta": np.concatenate(out_theta),
        "t": np.concatenate(out_t),
    }


def _log_pair_scores(ds: MinutiaeDataset, pairs: np.ndarray, res: dict,
                     kind: str):
    """Per-pair DEBUG audit trail into matching.log — the reference logged
    every comparison's score and transform (FRR.py:33-60,
    match_features.py:17-22). Gated behind logging.debug_pairs: the Python
    loop and log size grow with the pair count (1M+ lines on full
    all-pairs runs)."""
    if not logger.isEnabledFor(logging.DEBUG):
        return
    for p, (i, j) in enumerate(pairs):
        logger.debug(
            "%s pair %s[%d] vs %s[%d]: score=%.6f inliers=%d "
            "theta=%.2fdeg t=(%.1f, %.1f)",
            kind,
            ds.users[ds.user_index[i]], int(ds.sample_index[i]),
            ds.users[ds.user_index[j]], int(ds.sample_index[j]),
            float(res["final_score"][p]), int(res["n_inliers"][p]),
            math.degrees(float(res["theta"][p])),
            float(res["t"][p, 0]), float(res["t"][p, 1]))


def _write_genuine_stats(ds: MinutiaeDataset, pairs: np.ndarray, res: dict,
                         out_csv: Path):
    """genuine_match_stats.csv with the reference header (FRR.py:93-104) —
    with the metadata actually populated (the reference wrote N/A
    placeholders, FRR.py:125-135)."""
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["user_id", "idx1", "idx2", "score", "num_inliers",
                    "num_outliers", "rotation_deg", "translation_x",
                    "translation_y"])
        for p, (i, j) in enumerate(pairs):
            user = ds.users[ds.user_index[i]]
            n_in = int(res["n_inliers"][p])
            n_total = min(ds.matrices[i].shape[0], ds.matrices[j].shape[0])
            w.writerow([
                user, int(ds.sample_index[i]), int(ds.sample_index[j]),
                float(res["final_score"][p]), n_in, max(0, n_total - n_in),
                math.degrees(float(res["theta"][p])),
                float(res["t"][p, 0]), float(res["t"][p, 1]),
            ])


def main(config_path: str | None = None, demo: bool = False,
         minutiae_base: str | None = None, logs_dir: str = "logs") -> dict:
    cfg = load_matching_config(config_path)
    base = minutiae_base or cfg.get("data.minutiae_base",
                                    "dataset/processed/minutiae")
    logs = Path(logs_dir)
    # Audit log lives under the run's logs dir by default (the reference
    # wrote data/metadata/matching.log, match_features.py:17-22 — a
    # git-trackable location); per-pair DEBUG lines are opt-in.
    debug_pairs = bool(cfg.get("logging.debug_pairs", False))
    get_file_logger(__name__,
                    cfg.get("logging.logfile", str(logs / "matching.log")),
                    level=logging.DEBUG if debug_pairs else logging.INFO)

    if cfg.get("system.deterministic", True):
        np.random.seed(cfg.get("ransac.seed", 42))

    console_step("Loading minutiae dataset")
    max_per_user = cfg.get("evaluation.max_per_user", 2)
    ds = load_dataset(base, max_per_user=max_per_user,
                      k=cfg.get("matching.pad_k", 64))
    print(f"users: {len(ds.users)}  samples: {len(ds.matrices)}")
    if not ds.matrices:
        raise FileNotFoundError(f"no *_minutiae.json under {base}")

    compute_minutiae_statistics(ds.as_dict(), logs / "minutiae_stats.csv")

    ransac_iter = cfg.get("ransac.max_iterations", 300)
    if demo:
        ransac_iter = cfg.get("evaluation.demo.ransac_iterations", 50)

    def make_params(min_inliers, phase):
        """Phase-specific gates: the reference's full protocol passes
        dist 30/orient 30 to FRR and dist 15/orient 10 to FAR
        (match_features.py:126-133,146-151), not the pair-matcher
        defaults; stop ratio 0.15 (FRR.py:74, FAR.py:41)."""
        dist = float(cfg.get(f"evaluation.{phase}.max_distance",
                             cfg.get("matching.max_distance", 10.0)))
        orient = float(cfg.get(
            f"evaluation.{phase}.max_orientation_diff_deg",
            cfg.get("matching.max_orientation_diff_deg", 12.0)))
        return MatchParams(
            dist_thresh=dist,
            orient_thresh=math.radians(orient),
            use_type=bool(cfg.get("matching.use_type", True)),
            ransac_iter=int(ransac_iter),
            min_inliers=int(min_inliers),
            stop_inlier_ratio=float(cfg.get("ransac.stop_inlier_ratio", 0.15)),
            cross_check=bool(cfg.get("matching.cross_check", True)),
            seed=int(cfg.get("ransac.seed", 42)),
        )

    # Two-phase cascade (screen with few hypotheses, full pass on survivors).
    cascade = bool(cfg.get("matching.cascade", True)) and not demo
    screen_iters = int(cfg.get("matching.screen_iters", 32))

    # ---- FRR (genuine pairs) ----
    console_step("FRR: genuine pairs")
    mi_frr = (cfg.get("evaluation.demo.min_inliers", 3) if demo
              else cfg.get("evaluation.min_inliers_frr", 6))
    g_pairs = genuine_pairs(
        ds, max_pairs_per_user=(
            cfg.get("evaluation.demo.genuine_pairs_per_user", 3) if demo else None))
    t0 = time.time()
    g_res = match_pair_indices(ds, g_pairs, make_params(mi_frr, "frr"),
                               cascade=cascade, screen_iters=screen_iters)
    genuine_scores = g_res["final_score"]
    t_frr = time.time() - t0
    print(f"{len(g_pairs)} genuine pairs in {t_frr:.2f}s")
    _log_pair_scores(ds, g_pairs, g_res, kind="genuine")
    _write_genuine_stats(ds, g_pairs, g_res, logs / "genuine_match_stats.csv")
    report_scores("GENUINE SCORES", genuine_scores)

    # ---- FAR (impostor pairs) ----
    console_step("FAR: impostor pairs")
    mi_far = (cfg.get("evaluation.demo.min_inliers", 3) if demo
              else cfg.get("evaluation.min_inliers_far", 12))
    peers = (cfg.get("evaluation.demo.impostor_peers_per_user", 5) if demo
             else cfg.get("evaluation.impostor_peers_per_user", 100))
    i_pairs = impostor_pairs(ds, peers_per_user=peers,
                             seed=cfg.get("ransac.seed", 42))
    t0 = time.time()
    i_res = match_pair_indices(ds, i_pairs, make_params(mi_far, "far"),
                               cascade=cascade, screen_iters=screen_iters)
    impostor_scores = i_res["final_score"]
    t_far = time.time() - t0
    print(f"{len(i_pairs)} impostor pairs in {t_far:.2f}s")
    _log_pair_scores(ds, i_pairs, i_res, kind="impostor")
    report_scores("IMPOSTOR SCORES", impostor_scores)

    # ---- Threshold sweeps + EER + ROC ----
    num_points = cfg.get("evaluation.num_threshold_points", 50)
    thr, frr = evaluate_frr_across_thresholds(genuine_scores, num_points)
    _, far = evaluate_far_across_thresholds(impostor_scores, num_points)
    eer, eer_thr = compute_eer(thr, frr, far)
    print(f"EER = {eer:.4f} @ threshold {eer_thr:.3f}")
    plot_roc(far, frr, logs / "roc.png")

    return {
        "num_users": len(ds.users),
        "num_samples": len(ds.matrices),
        "genuine_pairs": int(len(g_pairs)),
        "impostor_pairs": int(len(i_pairs)),
        "genuine_scores": genuine_scores,
        "impostor_scores": impostor_scores,
        "frr": frr, "far": far, "thresholds": thr,
        "eer": eer, "eer_threshold": eer_thr,
        "seconds_frr": t_frr, "seconds_far": t_far,
        "pairs_per_second": (len(g_pairs) + len(i_pairs))
                            / max(t_frr + t_far, 1e-9),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description="Minutiae matching evaluation")
    ap.add_argument("--config", default=None)
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--minutiae-base", default=None)
    args = ap.parse_args()
    main(args.config, demo=args.demo, minutiae_base=args.minutiae_base)

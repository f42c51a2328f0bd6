"""Matching throughput benchmark: 1:1 pairs/sec and sharded 1:N all-pairs.

Not the driver headline (that's bench.py); run manually:
    python benchmarks/bench_matching.py [--pairs 512] [--iters 300]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.features.minutiae import MinutiaeSet
from multimodal_biometric_fingerprints_palms_tpu.matching import (
    MatchParams, match_pairs_batch,
)


def synth_gallery(n: int, k: int = 64, n_min: int = 40, seed: int = 0) -> MinutiaeSet:
    g = np.random.default_rng(seed)
    xy = np.zeros((n, k, 2), np.float32)
    xy[:, :n_min] = g.random((n, n_min, 2), dtype=np.float32) * 180 + 40
    ori = np.zeros((n, k), np.float32)
    ori[:, :n_min] = (g.random((n, n_min), dtype=np.float32) - 0.5) * np.pi
    ty = np.zeros((n, k), np.int32)
    ty[:, :n_min] = (g.random((n, n_min)) > 0.5).astype(np.int32)
    q = np.zeros((n, k), np.float32)
    q[:, :n_min] = 0.4 + 0.6 * g.random((n, n_min), dtype=np.float32)
    valid = np.zeros((n, k), bool)
    valid[:, :n_min] = True
    return MinutiaeSet(
        xy=jnp.asarray(xy), minutia_type=jnp.asarray(ty),
        orientation=jnp.asarray(ori), quality=jnp.asarray(q),
        coherence=jnp.asarray(q), angular_stability=jnp.asarray(q),
        valid=jnp.asarray(valid))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=512)
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args()

    p = MatchParams(ransac_iter=args.iters)
    a = synth_gallery(args.pairs, seed=0)
    b = synth_gallery(args.pairs, seed=1)

    # value round-trip per rep: block_until_ready is async on the axon relay
    float(match_pairs_batch(a, b, p).final_score.sum())

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(match_pairs_batch(a, b, p).final_score.sum())
    dt = (time.perf_counter() - t0) / reps

    pairs_per_sec = args.pairs / dt
    print(json.dumps({
        "metric": f"1:1 match pairs/sec (ransac_iter={args.iters}, K=64)",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec",
        "batch_ms": round(dt * 1000, 1),
        "polyu_allpairs_est_sec": round(1480 * 1479 / 2 / pairs_per_sec, 2),
    }))


if __name__ == "__main__":
    main()

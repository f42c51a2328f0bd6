"""Matching throughput benchmark: 1:1 pairs/sec and sharded 1:N all-pairs.

Not the driver headline (that's bench.py); run manually:
    python benchmarks/bench_matching.py [--pairs 512] [--iters 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Bootstrap the repo root WITHOUT PYTHONPATH: setting PYTHONPATH (to any
# value) prevents the axon TPU plugin from registering in this environment.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def synth_users_gallery(n_users: int, samples_per_user: int, k: int = 64,
                        n_min: int = 40, seed: int = 0) -> MinutiaeSet:
    """PolyU-structured gallery: each user is a random constellation,
    samples are jittered copies (genuine pairs really match)."""
    g = np.random.default_rng(seed)
    n = n_users * samples_per_user
    xy = np.zeros((n, k, 2), np.float32)
    ori = np.zeros((n, k), np.float32)
    ty = np.zeros((n, k), np.int32)
    q = np.zeros((n, k), np.float32)
    valid = np.zeros((n, k), bool)
    i = 0
    for u in range(n_users):
        base_xy = g.random((n_min, 2), dtype=np.float32) * 180 + 40
        base_ori = (g.random(n_min, dtype=np.float32) - 0.5) * np.pi
        base_ty = (g.random(n_min) > 0.5).astype(np.int32)
        base_q = 0.4 + 0.6 * g.random(n_min, dtype=np.float32)
        for _ in range(samples_per_user):
            xy[i, :n_min] = base_xy + g.normal(0, 1.0, (n_min, 2))
            ori[i, :n_min] = base_ori
            ty[i, :n_min] = base_ty
            q[i, :n_min] = base_q
            valid[i, :n_min] = True
            i += 1
    return MinutiaeSet(
        xy=jnp.asarray(xy), minutia_type=jnp.asarray(ty),
        orientation=jnp.asarray(ori), quality=jnp.asarray(q),
        coherence=jnp.asarray(q), angular_stability=jnp.asarray(q),
        valid=jnp.asarray(valid))


def bench_allpairs(iters: int, cascade: bool, n_users: int = 148,
                   samples: int = 10, anchors: bool = True):
    """Full-gallery all-unique-pairs (the BASELINE.json north star:
    1480-template PolyU all-pairs)."""
    from multimodal_biometric_fingerprints_palms_tpu.parallel import (
        create_mesh, all_pairs_unique, unique_pairs)

    n = n_users * samples
    gallery = synth_users_gallery(n_users, samples)
    mesh = create_mesh(len(jax.devices()))
    p = MatchParams(ransac_iter=iters)

    # warm-up compiles (screen + full phase)
    all_pairs_unique(jax.tree.map(lambda x: x[:256], gallery), mesh, p,
                     chunk=2048, cascade=cascade, anchors=anchors)

    t0 = time.perf_counter()
    scores = all_pairs_unique(gallery, mesh, p, chunk=2048, cascade=cascade,
                              anchors=anchors)
    dt = time.perf_counter() - t0

    pairs = unique_pairs(n)
    labels = np.repeat(np.arange(n_users), samples)
    same = labels[pairs[:, 0]] == labels[pairs[:, 1]]
    print(json.dumps({
        "metric": f"all-pairs {n} templates (iters={iters}, "
                  f"cascade={cascade}, anchors={anchors}, "
                  f"{len(jax.devices())} dev)",
        "value": round(pairs.shape[0] / dt, 1),
        "unit": "pairs/sec",
        "seconds": round(dt, 2),
        "unique_pairs": int(pairs.shape[0]),
        "genuine_mean": round(float(scores[same].mean()), 4),
        "impostor_mean": round(float(scores[~same].mean()), 6),
        "impostor_q999": round(float(np.quantile(scores[~same], 0.999)), 4),
    }))


def bench_identify(iters: int, n_users: int = 148, samples: int = 10,
                   chunk: int = 512):
    """1:N identification probe against a sharded PolyU-sized gallery."""
    from multimodal_biometric_fingerprints_palms_tpu.parallel import (
        create_mesh, pad_gallery, shard_gallery)
    from multimodal_biometric_fingerprints_palms_tpu.parallel.gallery import (
        identify)

    mesh = create_mesh(len(jax.devices()))
    gallery = pad_gallery(synth_users_gallery(n_users, samples), chunk)
    n = gallery.valid.shape[0]
    sharded = shard_gallery(gallery, mesh)
    probe = jax.tree.map(lambda x: x[3], gallery)
    p = MatchParams(ransac_iter=iters)

    s = identify(probe, sharded, mesh, p, chunk=chunk)
    top = int(np.argmax(np.asarray(s)))
    reps = 10
    t0 = time.perf_counter()
    outs = [identify(probe, sharded, mesh, p, chunk=chunk)
            for _ in range(reps)]
    float(jnp.sum(outs[-1]))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": f"1:N identify, N={n} (iters={iters}, "
                  f"{len(jax.devices())} dev)",
        "value": round(dt * 1000, 1),
        "unit": "ms/probe",
        "top_match": top,
        "top_correct": bool(top == 3),
    }))


def bench_identify_batch(iters: int, n_users: int = 148, samples: int = 10,
                         p_num: int = 64, chunk: int = 512):
    """Batched 1:N identification: P probes x sharded N gallery in one
    dispatch (the realistic identification workload)."""
    from multimodal_biometric_fingerprints_palms_tpu.parallel import (
        create_mesh, pad_gallery, shard_gallery)
    from multimodal_biometric_fingerprints_palms_tpu.parallel.gallery import (
        identify_batch)

    mesh = create_mesh(len(jax.devices()))
    gallery = pad_gallery(synth_users_gallery(n_users, samples), chunk)
    n = gallery.valid.shape[0]
    sharded = shard_gallery(gallery, mesh)
    probes = jax.tree.map(lambda x: x[:p_num], gallery)
    p = MatchParams(ransac_iter=iters)

    s = identify_batch(probes, sharded, mesh, p, chunk=chunk)
    top = np.argmax(np.asarray(s), axis=1)
    reps = 3
    t0 = time.perf_counter()
    outs = [identify_batch(probes, sharded, mesh, p, chunk=chunk)
            for _ in range(reps)]
    float(jnp.sum(outs[-1]))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": f"batched 1:N identify, P={p_num}, N={n} (iters={iters}, "
                  f"{len(jax.devices())} dev)",
        "value": round(dt * 1000 / p_num, 2),
        "unit": "ms/probe",
        "batch_ms": round(dt * 1000, 1),
        "top_correct": int((top == np.arange(p_num)).sum()),
    }))


def _setup_cache():
    """Persistent compilation cache: Mosaic/XLA compiles of the big kernels
    are minutes through the remote compile helper; cache them across runs."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mbfp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    _setup_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=512)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--allpairs", action="store_true")
    ap.add_argument("--identify", action="store_true")
    ap.add_argument("--identify-batch", action="store_true")
    ap.add_argument("--no-cascade", action="store_true")
    ap.add_argument("--no-anchors", action="store_true")
    args = ap.parse_args()

    if args.allpairs:
        bench_allpairs(args.iters, cascade=not args.no_cascade,
                       anchors=not args.no_anchors)
        return
    if args.identify:
        bench_identify(args.iters)
        return
    if args.identify_batch:
        bench_identify_batch(args.iters)
        return

    p = MatchParams(ransac_iter=args.iters)
    a = synth_gallery(args.pairs, seed=0)
    b = synth_gallery(args.pairs, seed=1)

    # production matcher (grouped Pallas kernel on TPU), jitted once
    from multimodal_biometric_fingerprints_palms_tpu.parallel.gallery import (
        _batch_matcher)
    matcher = jax.jit(lambda x, y: _batch_matcher(
        jax.default_backend() == "tpu")(x, y, p).final_score)

    # value round-trip per rep: block_until_ready is async on the axon relay
    float(matcher(a, b).sum())

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(matcher(a, b).sum())
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

"""One consolidated TPU measurement session.

Run after the axon tunnel recovers; does everything in one process, cheapest
first, printing progress lines (unbuffered) so partial results survive a
wedge: health check → Pallas CC parity/timing → pipeline with XLA vs Pallas
CC → matching throughput.
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import scipy.ndimage as ndi
    sys.path.insert(0, "/root/repo")
    from bench import make_batch

    t0 = time.perf_counter()
    x_small = jnp.ones((64, 64))
    log("health:", float((x_small @ x_small).sum()), f"{time.perf_counter()-t0:.1f}s")

    # --- Pallas CC: tiny parity ---
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
        connected_components_pallas,
    )
    xs = np.random.default_rng(0).random((2, 64, 128)) > 0.55
    t0 = time.perf_counter()
    lab = np.asarray(connected_components_pallas(jnp.asarray(xs), 1))
    ref, n = ndi.label(xs[0])
    ok = len(np.unique(lab[0][xs[0]])) == n
    log(f"pallas CC tiny: parity={ok} compile+run {time.perf_counter()-t0:.1f}s")

    # --- Pallas CC: full-size timing ---
    xb = jnp.asarray(make_batch(32)) < 0.5
    f = jax.jit(lambda m: connected_components_pallas(m, 1))
    t0 = time.perf_counter()
    f(xb).block_until_ready()
    log(f"pallas CC batch32 compile+run {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(5):
        f(xb).block_until_ready()
    log(f"pallas CC batch32 run {(time.perf_counter()-t0)/5*1000:.1f} ms")

    # --- pipeline: XLA CC vs Pallas CC ---
    from multimodal_biometric_fingerprints_palms_tpu.ops import components
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing import (
        preprocess_fingerprint,
    )
    from multimodal_biometric_fingerprints_palms_tpu.features import (
        extract_minutiae, postprocess_minutiae,
    )

    def full(x):
        res = preprocess_fingerprint(x)
        ms = extract_minutiae(res.skeleton)
        ms = postprocess_minutiae(ms, res.skeleton)
        return ms.count

    xb128 = jnp.asarray(make_batch(128))
    for impl in ("xla", "pallas"):
        components.set_cc_impl(impl)
        fn = jax.jit(full)
        t0 = time.perf_counter()
        counts = fn(xb128)
        counts.block_until_ready()
        log(f"pipeline[{impl}] compile+run {time.perf_counter()-t0:.1f}s "
            f"counts mean {float(counts.mean()):.1f}")
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            fn(xb128).block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        log(f"pipeline[{impl}] {128/dt:.1f} img/s ({dt*1000:.0f} ms/batch128)")

    # --- matching throughput ---
    from benchmarks.bench_matching import synth_gallery
    from multimodal_biometric_fingerprints_palms_tpu.matching import (
        MatchParams, match_pairs_batch,
    )
    p = MatchParams(ransac_iter=300)
    a = synth_gallery(256, seed=0)
    b = synth_gallery(256, seed=1)
    t0 = time.perf_counter()
    match_pairs_batch(a, b, p).final_score.sum().item()
    log(f"match compile+run {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(3):
        match_pairs_batch(a, b, p).final_score.sum().item()
    dt = (time.perf_counter() - t0) / 3
    pps = 256 / dt
    log(f"match 1:1 {pps:.0f} pairs/s (300 iters) | "
        f"PolyU all-pairs est {1480*1479/2/pps:.1f}s single-chip")
    log("SESSION DONE")


if __name__ == "__main__":
    main()

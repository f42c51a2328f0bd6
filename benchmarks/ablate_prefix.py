"""Cumulative-prefix ablation of the enhancement+extract pipeline: each
prefix is ONE jit program; stage cost = delta between consecutive prefixes,
so per-call relay overhead cancels (docs/PERF.md timing discipline)."""

import sys, os, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=128, iters=5):
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mbfp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import make_batch
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing import enhance
    from multimodal_biometric_fingerprints_palms_tpu.ops.orientation import (
        compute_orientation_field)
    from multimodal_biometric_fingerprints_palms_tpu.features import (
        extract_minutiae, postprocess_minutiae)

    x = jnp.asarray(make_batch(batch))

    def stage_orient(segmented, mask):
        return compute_orientation_field(
            segmented, mask=mask, block_size=16, smooth_sigma=3.0,
            smooth_orientation_sigma=3.0)

    def prefix(n):
        # Every computed stage output is returned (as a scalar sum), so XLA
        # cannot dead-code-eliminate earlier stages a later prefix doesn't
        # consume (e.g. the orientation field before thin) — deltas are then
        # true cumulative stage costs.
        def f(x):
            outs = []
            norm = enhance.normalize_image(x)
            outs.append(norm.sum())
            if n > 1:
                den = enhance.denoise_image(norm)
                outs.append(den.sum())
            if n > 2:
                seg, mask = enhance.segment_fingerprint(den)
                outs.append(seg.sum())
            if n > 3:
                field = stage_orient(seg, mask)
                outs.append(field.orientation.sum()
                            + field.reliability.sum())
            if n > 4:
                binary = enhance.binarize(seg)
                outs.append(binary.sum())
            if n > 5:
                bsm = enhance.smooth_fingerprint_skeleton(
                    binary.astype(jnp.float32))
                outs.append(bsm.sum())
            if n > 6:
                skel = enhance.thinning_and_cleaning(bsm, field.reliability)
                outs.append(skel.sum())
            if n > 7:
                ms = extract_minutiae(skel)
                outs.append(ms.count.sum())
            if n > 8:
                ms = postprocess_minutiae(ms, skel)
                outs.append(ms.count.sum())
            return jnp.stack(outs).sum()
        return f

    names = ["normalize", "denoise", "segment", "orient", "binarize",
             "smooth", "thin", "extract", "post"]
    prev = 0.0
    for n in range(1, 10):
        f = jax.jit(prefix(n))
        out = f(x)
        jax.tree.leaves(out)[0].sum().item()
        t0 = time.perf_counter()
        outs = [f(x) for _ in range(iters)]
        jax.tree.leaves(outs[-1])[0].sum().item()
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"prefix<={names[n-1]:10s} {dt:8.1f} ms  (+{dt-prev:6.1f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

"""Per-stage value-synced timings of the enhancement+extract pipeline on the
current default device. Pipelined: each stage timed by enqueueing `iters`
calls and syncing one value (docs/PERF.md timing discipline)."""

import sys, time
import numpy as np

def main(batch=128, iters=5):
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mbfp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, "/root/repo")
    from bench import make_batch
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing import enhance
    from multimodal_biometric_fingerprints_palms_tpu.ops.orientation import compute_orientation_field
    from multimodal_biometric_fingerprints_palms_tpu.features import extract_minutiae, postprocess_minutiae

    x = jnp.asarray(make_batch(batch))

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.tree.leaves(out)[0].sum().item()   # compile+run
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        jax.tree.leaves(outs[-1])[0].sum().item()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s} {dt*1000:8.1f} ms/batch{batch}", flush=True)
        return out

    norm = timed("normalize", enhance.normalize_image, x)
    den = timed("denoise", enhance.denoise_image, norm)
    seg, mask = timed("segment", enhance.segment_fingerprint, den)
    field = timed("orientation", lambda s, m: compute_orientation_field(
        s, mask=m, block_size=16, smooth_sigma=3.0,
        smooth_orientation_sigma=3.0), seg, mask)
    binary = timed("binarize", enhance.binarize, seg)
    bsm = timed("smooth", lambda b: enhance.smooth_fingerprint_skeleton(
        b.astype(jnp.float32)), binary)
    skel = timed("thin", enhance.thinning_and_cleaning, bsm, field.reliability)
    ms = timed("extract", extract_minutiae, skel)
    timed("postprocess", postprocess_minutiae, ms, skel)
    timed("FULL enhance", enhance.preprocess_fingerprint, x)

    def full(x):
        res = enhance.preprocess_fingerprint(x)
        m = extract_minutiae(res.skeleton)
        m = postprocess_minutiae(m, res.skeleton)
        return m.count
    timed("FULL enhance+extract", full, x)

if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    main(b)

"""Micro-op timings: the individual kernels the enhancement stages call.
Standalone jit per op, pipelined iters, one value sync (each figure thus
carries a few ms of relay overhead — compare ops, don't sum them)."""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=128, iters=5):
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mbfp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import make_batch
    from multimodal_biometric_fingerprints_palms_tpu.ops import histogram as H
    from multimodal_biometric_fingerprints_palms_tpu.ops import filters as F
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_kernels import (
        nlm_denoise_pallas_blocked, binarize_fused_split_pallas, clahe_pallas)
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
        clean_mask_split)
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_bitpack import (
        zs_thin_bitpacked)
    from multimodal_biometric_fingerprints_palms_tpu.ops.components import (
        largest_component, convex_hull_mask)
    from multimodal_biometric_fingerprints_palms_tpu.ops.morphology import (
        binary_close_open_packed)
    from multimodal_biometric_fingerprints_palms_tpu.ops.orientation import (
        compute_orientation_field)

    x = jnp.asarray(make_batch(batch))
    mask = x > 0.5

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.tree.leaves(out)[0].sum().item()
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        jax.tree.leaves(outs[-1])[0].sum().item()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt*1000:8.1f} ms", flush=True)
        return out

    timed("clahe (pallas)", lambda a: clahe_pallas(a, 2.5, 8), x)
    timed("percentile_stretch", H.percentile_stretch, x)
    timed("nlm_pallas", nlm_denoise_pallas_blocked, x)
    timed("gauss3 sigma0.6", lambda a: F.gaussian_blur_cv(a, 3, 0.6), x)
    timed("gauss5", lambda a: F.gaussian_blur_cv(a, 5, 0.0), x)
    timed("gauss sigma3", lambda a: F.gaussian_blur(a, 3.0), x)
    timed("otsu_global", H.otsu_threshold, x)
    timed("close_open_packed 15", lambda m: binary_close_open_packed(
        m, 15, shape="ellipse"), mask)
    timed("largest_component", largest_component, mask)
    timed("convex_hull_mask", convex_hull_mask, mask)
    timed("binarize_fused_split", lambda a: binarize_fused_split_pallas(
        a, 25, 0.25), x)
    timed("clean_mask_split 64/80", lambda m: clean_mask_split(
        m, min_size=64, max_size=80, connectivity=1), mask)
    timed("zs_thin_bitpacked", lambda m: zs_thin_bitpacked(m, prune=True), mask)
    timed("orientation_field(+mask)", lambda s, m: compute_orientation_field(
        s, mask=m, block_size=16, smooth_sigma=3.0,
        smooth_orientation_sigma=3.0), x, mask)
    timed("orientation_field(nomask)", lambda s: compute_orientation_field(s), x)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

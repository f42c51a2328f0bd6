"""Sub-stage cumulative-prefix ablation INSIDE binarize and thin (the two
biggest round-5 stage deltas). Same discipline as ablate_prefix.py: each
prefix is one jit program ending in a value round-trip, cost = delta, relay
overhead cancels. Input = the real upstream tensor for each stage (the
pipeline is run up to the stage once, host-side, so every prefix sees
realistic ridge masks, not synthetic noise)."""

import sys, os, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, x, iters=5):
    fn(x).block_until_ready()
    float(np.asarray(fn(x)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    float(np.asarray(r).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(batch=128):
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mbfp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import make_batch
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing import enhance
    from multimodal_biometric_fingerprints_palms_tpu.ops.orientation import (
        compute_orientation_field)
    from multimodal_biometric_fingerprints_palms_tpu.ops.histogram import clahe
    from multimodal_biometric_fingerprints_palms_tpu.ops import pallas_kernels as pk
    from multimodal_biometric_fingerprints_palms_tpu.ops import pallas_cc as pc
    from multimodal_biometric_fingerprints_palms_tpu.ops import pallas_bitpack as pb

    x = jnp.asarray(make_batch(batch))

    # host-side staging: run the pipeline up to each stage once
    up = jax.jit(lambda v: enhance.segment_fingerprint(
        enhance.denoise_image(enhance.normalize_image(v)))[0])
    seg = up(x)
    seg.block_until_ready()
    seg = jnp.asarray(np.asarray(seg))

    h, w = 320, 256
    win, k, patch = 25, 0.25, 32

    # ---- binarize sub-prefixes ----
    def p0(v):
        return enhance._quantize_u8(v).sum()

    def p1(v):
        return clahe(enhance._quantize_u8(v), clip_limit=2.5, grid=8).sum()

    def fg_of(v):
        img_eq = clahe(enhance._quantize_u8(v), clip_limit=2.5, grid=8)
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        b = v.shape[0]
        np_tiles = (h // patch) * (w // patch)
        npt = -(-np_tiles // 8) * 8
        spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        k1 = functools.partial(pk._binarize_fg_kernel, h=h, w=w, win=win,
                               k=k, patch=patch)
        return pl.pallas_call(
            k1, grid=(b,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            scratch_shapes=[pltpu.VMEM((h, w), jnp.float32),
                            pltpu.VMEM((npt, 256), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(img_eq.astype(jnp.float32))

    def p2(v):
        return fg_of(v).sum()

    def p3(v):
        fg = fg_of(v)
        return pc.remove_small_split_pallas(fg > 0.5, 80, connectivity=1
                                            ).astype(jnp.float32).sum()

    def p3a(v):  # just the packed reach of p3 (seed + reach)
        fg = fg_of(v) > 0.5
        r = pb.reach_packed(fg, pc.center_seed(fg), connectivity=1,
                            max_iters=512, packed=True)
        return r.sum()

    def p4(v):
        fg = fg_of(v)
        kept = pc.remove_small_split_pallas(fg > 0.5, 80, connectivity=1)
        inv = jnp.logical_not(kept)
        r1 = pb.border_reach_packed(inv, connectivity=1, max_iters=512,
                                    packed=True, union=False)
        return r1.sum()

    def p5(v):
        return enhance.binarize(v).astype(jnp.float32).sum()

    labels = ["quantize", "+clahe", "+fgkernel", "+rm_small(reach only)",
              "+rm_small(full)", "+border_reach", "full binarize"]
    fns = [p0, p1, p2, p3a, p3, p4, p5]
    prev = 0.0
    for lab, fn in zip(labels, fns):
        jf = jax.jit(fn)
        ms = timeit(jf, seg)
        print(f"bin {lab:26s} {ms:7.1f} ms  (+{ms - prev:6.1f})")
        prev = ms

    # ---- thin sub-prefixes (input: binary_smooth + reliability) ----
    up2 = jax.jit(lambda v: (
        enhance.smooth_fingerprint_skeleton(
            enhance.binarize(v).astype(jnp.float32)),
        compute_orientation_field(v, mask=v > -1, block_size=16,
                                  smooth_sigma=3.0,
                                  smooth_orientation_sigma=3.0).reliability))
    bsm, rel = up2(seg)
    bsm = jnp.asarray(np.asarray(bsm))
    rel = jnp.asarray(np.asarray(rel))

    def t0(v):
        return pc.remove_small_split_pallas(v, 64, connectivity=1
                                            ).astype(jnp.float32).sum()

    def t1(v):
        return pc.clean_mask_split(v, 64, 80, connectivity=1
                                   ).astype(jnp.float32).sum()

    def t2(v):
        from multimodal_biometric_fingerprints_palms_tpu.ops.filters import (
            gaussian_blur)
        cleaned = pc.clean_mask_split(v, 64, 80, connectivity=1)
        gated = jnp.logical_and(cleaned, gaussian_blur(rel, 2.0) > 0.1)
        return pb.zs_thin_bitpacked(gated, prune=True).astype(jnp.float32).sum()

    prev = 0.0
    for lab, fn in zip(["rm_small", "+hole(clean)", "+gate+zsthin"],
                       [t0, t1, t2]):
        jf = jax.jit(fn)
        ms = timeit(jf, bsm)
        print(f"thin {lab:25s} {ms:7.1f} ms  (+{ms - prev:6.1f})")
        prev = ms


if __name__ == "__main__":
    main()

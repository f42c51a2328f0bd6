"""Phase attribution inside the fused CC filter kernel: time variants that
stop after run-ids / relax / hist / lookup, on realistic binarized ridge
masks.  Standalone jit per variant; compare deltas (relay overhead
cancels between variants)."""

import sys, os, time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=128, iters=5):
    import jax, jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mbfp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import make_batch
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing import enhance
    from multimodal_biometric_fingerprints_palms_tpu.ops import pallas_cc as C

    x = jnp.asarray(make_batch(batch))
    # realistic mask: the binarized image before clean
    norm = enhance.normalize_image(x)
    den = enhance.denoise_image(norm)
    seg, segmask = enhance.segment_fingerprint(den)
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_kernels import (
        binarize_fused_split_pallas)
    binary = binarize_fused_split_pallas(seg, 25, 0.25)
    mask = jax.device_get(binary > 0.5)
    mask = jnp.asarray(mask)

    h, w = mask.shape[-2:]
    nhi = C._rle_nhi(h, w)

    def make_kernel(phase):
        def kern(mask_ref, out_ref, count_ref, lab_ref, sizes_ref):
            fg = mask_ref[0] > 0.5
            if phase == "noop":
                out_ref[0] = fg.astype(jnp.float32)
                return
            if phase == "scan8":
                # 8 roll+min steps along lanes (one directional pass worth)
                v = mask_ref[0]
                s = 1
                while s < w:
                    v = jnp.minimum(v, C._shift_no_wrap(v, s, 1, C._INF))
                    s *= 2
                out_ref[0] = v
                return
            if phase == "runids":
                ids = C._run_ids(fg, h, w)
                out_ref[0] = ids.astype(jnp.float32)
                return
            ids = C._run_ids(fg, h, w)
            spc = {"relax": 2, "relax4": 4, "relax8": 8}.get(phase, 2)
            label = C._label_relax(fg, h, w, 1, 512, label0=ids,
                                   sweeps_per_check=spc)
            if phase.startswith("relax"):
                out_ref[0] = label
                return
            C._runid_hist(label, fg, h, w, count_ref, lab_ref)
            if phase == "hist":
                out_ref[0] = label + count_ref[0, 0]
                return
            sizes = C._runid_lookup(h, w, count_ref, lab_ref, sizes_ref)
            out_ref[0] = sizes
        return kern

    def run(phase):
        b = mask.shape[0]
        kern = make_kernel(phase)
        spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        f = jax.jit(lambda m: pl.pallas_call(
            kern, grid=(b,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            scratch_shapes=[pltpu.VMEM((nhi, C._RLE_LO), jnp.float32),
                            pltpu.VMEM((h, w), jnp.float32),
                            pltpu.VMEM((h, w), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
        )(m.astype(jnp.float32)))
        out = f(mask)
        out.sum().item()
        t0 = time.perf_counter()
        outs = [f(mask) for _ in range(iters)]
        outs[-1].sum().item()
        dt = (time.perf_counter() - t0) / iters
        print(f"{phase:10s} {dt*1000:8.1f} ms", flush=True)

    import sys as _sys
    phases = (_sys.argv[2].split(",") if len(_sys.argv) > 2 else
              ("noop", "scan8", "runids", "relax", "hist", "lookup"))
    for phase in phases:
        run(phase)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

"""Headline benchmark: enhance+extract images/sec on PolyU-sized inputs.

Runs the full enhancement chain (normalize → denoise → segment → binarize →
orientation → smooth → thin) plus crossing-number minutiae extraction and
quality postprocessing as one jit program over a (B, 320, 256) batch on the
default device (TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
measured against the BASELINE.json north-star target of 10,000 img/s on a
v5e-8 slice, pro-rated to the number of local devices
(target = 10000 * n_devices / 8).
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_batch(batch: int, h: int = 320, w: int = 256) -> np.ndarray:
    """Synthetic PolyU-like ridge images (deterministic)."""
    g = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = np.empty((batch, h, w), np.float32)
    for b in range(batch):
        cy, cx = h / 2 + g.uniform(-20, 20), w / 2 + g.uniform(-20, 20)
        r = np.sqrt(((yy - cy) / 1.1) ** 2 + (xx - cx) ** 2)
        ang = np.arctan2(yy - cy, xx - cx)
        ridges = 0.5 + 0.5 * np.cos(r / 4.5 + 2.0 * np.sin(3 * ang)
                                    + g.uniform(0, 6.28))
        ell = (((yy - cy) / (0.42 * h)) ** 2 + ((xx - cx) / (0.40 * w)) ** 2) < 1
        img = np.where(ell, 1.0 - 0.8 * ridges, 0.95)
        out[b] = np.clip(img + g.normal(0, 0.02, (h, w)), 0, 1)
    return out


def _setup_cache():
    """Persistent compilation cache: Mosaic/XLA compiles of the big kernels
    are minutes through the remote compile helper; cache them across runs."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mbfp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    _setup_cache()
    import jax
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing import (
        preprocess_fingerprint,
    )
    from multimodal_biometric_fingerprints_palms_tpu.features import (
        extract_minutiae, postprocess_minutiae,
    )

    n_dev = len(jax.devices())
    batch = 128

    @jax.jit
    def pipeline(x):
        res = preprocess_fingerprint(x)
        ms = extract_minutiae(res.skeleton)
        ms = postprocess_minutiae(ms, res.skeleton)
        return ms.count.sum()

    x = jnp.asarray(make_batch(batch))

    # Warmup / compile; one retry on transient TPU-tunnel errors.
    # NOTE: timing pulls the scalar to the host (float()) — on the axon
    # relay, block_until_ready returns before execution finishes, so only a
    # value round-trip gives honest timings (docs/PERF.md).
    for attempt in range(2):
        try:
            float(pipeline(x))
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(30)

    # Enqueue all iterations, then sync once: the device stream is in-order,
    # so fetching the last value waits for all of them — total wall time for
    # iters*batch images is honest, without paying the relay's ~33 ms
    # dispatch latency once per iteration (docs/PERF.md).
    iters = 5
    t0 = time.perf_counter()
    outs = [pipeline(x) for _ in range(iters)]
    float(outs[-1])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    target = 10000.0 * n_dev / 8.0
    print(json.dumps({
        "metric": "enhance+extract images/sec (PolyU 320x256)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / target, 4),
    }))


if __name__ == "__main__":
    main()

"""Interpret-mode numerics tests for the Pallas kernels vs XLA references."""

import numpy as np
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_kernels import (
    sauvola_binarize_pallas,
)
from multimodal_biometric_fingerprints_palms_tpu.ops.filters import box_filter
from multimodal_biometric_fingerprints_palms_tpu.ops.denoise import nlm_denoise


def _sauvola_xla(x, win=25, k=0.25):
    mean = box_filter(x, win)
    sqmean = box_filter(x * x, win)
    std = jnp.sqrt(jnp.clip(sqmean - mean * mean, 0.0, None))
    std_n = std / (jnp.max(std, axis=(-2, -1), keepdims=True) + 1e-6)
    k_map = k * (1.0 - 0.5 * std_n)
    sauv = mean * (1.0 - k_map * (1.0 - std / (mean + 1e-6)))
    return (x < sauv).astype(jnp.float32)


def test_sauvola_pallas_matches_xla(rng):
    x = jnp.asarray(rng.random((2, 64, 128)).astype(np.float32))
    ours = np.asarray(sauvola_binarize_pallas(x, interpret=True))
    ref = np.asarray(_sauvola_xla(x))
    assert (ours == ref).mean() > 0.999


def test_nlm_pallas_blocked_matches_xla(rng):
    """Offset-blocked NLM kernel (the TPU default path) vs the XLA form,
    both precisions."""
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_kernels import (
        nlm_denoise_pallas_blocked,
    )
    x = jnp.asarray(rng.random((1, 16, 32)).astype(np.float32))
    for prec in ("f32", "bf16"):
        ours = np.asarray(nlm_denoise_pallas_blocked(x, precision=prec,
                                                     interpret=True))
        ref = np.asarray(nlm_denoise(x, precision=prec))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_clahe_pallas_matches_xla(rng):
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_kernels import (
        clahe_pallas,
    )
    from multimodal_biometric_fingerprints_palms_tpu.ops.histogram import clahe
    x = jnp.asarray(rng.random((1, 64, 64)).astype(np.float32))
    ours = np.asarray(clahe_pallas(x, 2.5, 8, interpret=True))
    ref = np.asarray(clahe(x, 2.5, 8))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_cc_filter_pallas_modes(rng):
    """Fused CC size filtering matches the XLA wrapper compositions."""
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
        cc_filter_pallas,
    )
    from multimodal_biometric_fingerprints_palms_tpu.ops import components as C

    old = C.CC_IMPL
    C.set_cc_impl("xla")
    try:
        x = jnp.asarray(rng.random((1, 24, 128)) > 0.55)
        for conn in (1, 2):
            a = np.asarray(cc_filter_pallas(x, "remove_small", conn,
                                            min_size=10, interpret=True))
            b = np.asarray(C.remove_small_objects(x, 10, conn))
            np.testing.assert_array_equal(a, b)
            a = np.asarray(cc_filter_pallas(x, "fill_holes", conn,
                                            max_size=20, interpret=True))
            b = np.asarray(C.remove_small_holes(x, 20, conn))
            np.testing.assert_array_equal(a, b)
        a = np.asarray(cc_filter_pallas(x, "clean", 1, min_size=10,
                                        max_size=20, interpret=True))
        b = np.asarray(C.remove_small_holes(
            C.remove_small_objects(x, 10, 1), 20, 1))
        np.testing.assert_array_equal(a, b)
        a = np.asarray(cc_filter_pallas(x, "largest", 2, interpret=True))
        b = np.asarray(C.largest_component(x, 2))
        np.testing.assert_array_equal(a, b)
    finally:
        C.set_cc_impl(old)


def test_skeletonize_bitpacked_matches_xla(rng):
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_bitpack import (
        zs_thin_bitpacked,
    )
    from multimodal_biometric_fingerprints_palms_tpu.ops.skeleton import (
        skeletonize,
    )
    h, w = 32, 64
    yy, xx = np.mgrid[0:h, 0:w]
    ridge = (np.cos(np.sqrt((yy - 16) ** 2 + (xx - 32) ** 2) / 3.0) > -0.2) \
        & (((yy - 16) / 14.0) ** 2 + ((xx - 32) / 30.0) ** 2 < 1)
    x = jnp.asarray(ridge[None])
    a = np.asarray(zs_thin_bitpacked(x, interpret=True))
    b = np.asarray(skeletonize(x))
    np.testing.assert_array_equal(a, b)


def test_binarize_fused_matches_xla(rng):
    """Fused post-CLAHE binarize kernel vs the XLA composition."""
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_kernels import (
        binarize_fused_pallas,
    )
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing import enhance

    # ridge-like image on the u8 grid
    yy, xx = np.mgrid[0:64, 0:128].astype(np.float32)
    img = 0.5 + 0.4 * np.cos(np.hypot(yy - 30, xx - 60) / 3.0)
    img += rng.normal(0, 0.05, img.shape)
    img = np.round(np.clip(img, 0, 1) * 255) / 255
    x = jnp.asarray(img.astype(np.float32))[None]

    ours = np.asarray(binarize_fused_pallas(x, interpret=True))

    # Composition reference: same tree-box Sauvola kernel (so borderline
    # x < sauv comparisons see identical FP rounding), XLA for the rest.
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_kernels import (
        sauvola_binarize_pallas,
    )
    from multimodal_biometric_fingerprints_palms_tpu.ops.histogram import (
        otsu_threshold_patchwise,
    )
    from multimodal_biometric_fingerprints_palms_tpu.ops.components import clean_mask
    from multimodal_biometric_fingerprints_palms_tpu.ops.morphology import (
        binary_opening, binary_erode, binary_reconstruction_by_dilation,
    )
    win, k, patch = 25, 0.25, 32
    binary = sauvola_binarize_pallas(x, win, k, interpret=True) > 0.5
    thr = otsu_threshold_patchwise(x, patch)
    h, w = x.shape[-2:]
    blocks = x.reshape((1, h // patch, patch, w // patch, patch))
    p_std = jnp.std(blocks, axis=(-3, -1))
    p_std = jnp.repeat(jnp.repeat(p_std, patch, axis=-1), patch, axis=-2)
    binary = jnp.logical_or(binary,
                            jnp.logical_and(x < thr, p_std >= 3.0 / 255.0))
    cleaned = clean_mask(binary, 80, 150, connectivity=1)
    opened = binary_opening(cleaned, 3, shape="ellipse")
    marker = binary_erode(opened, 3, shape="ellipse")
    ref = np.asarray(binary_reconstruction_by_dilation(marker, opened))

    # The in-kernel Otsu builds its CDF as a triangular matmul; FP summation
    # order vs XLA's cumsum can flip argmax ties by a bin, and a flipped
    # borderline pixel can cascade through a component keep decision —
    # intra-implementation noise well below the stage's own quantization.
    agree = (ours == ref).mean()
    assert agree > 0.99, agree


def test_nlm_pallas_sym_matches_xla(rng):
    """Symmetric-pair NLM (mirror SSD reuse + border-ring recompute) is
    bit-identical to the canonical XLA form on all-ring and
    interior-containing shapes, both precisions."""
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_kernels import (
        nlm_denoise_pallas_sym,
    )
    for shape in [(1, 16, 32), (2, 40, 128)]:
        x = jnp.asarray(rng.random(shape).astype(np.float32))
        for prec in ("f32", "bf16"):
            ours = np.asarray(nlm_denoise_pallas_sym(x, precision=prec,
                                                     interpret=True))
            ref = np.asarray(nlm_denoise(x, precision=prec))
            np.testing.assert_allclose(ours, ref, atol=1e-6)

"""The enhancement chain — normalize → denoise → segment → binarize →
orientation → anisotropic smooth → thin.

TPU-native rebuild of src/preprocessing/fingerprint_preprocess.py:182-225.
Every stage consumes and produces batched (..., H, W) float32 tensors in
[0, 1]; the whole chain is one jit program (XLA fuses the elementwise work
into the convs), and batches process in lockstep — replacing the reference's
per-image ThreadPoolExecutor (run_preprocessing.py:154).

Stage semantics track the reference exactly (values noted per stage); images
stay full-frame with a foreground mask instead of the reference's per-image
bbox crop (static shapes are what makes the batch jit-able — SURVEY.md §7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.filters import gaussian_blur, gaussian_blur_cv, box_filter, sobel
from ..ops.histogram import (
    percentile_stretch, clahe, otsu_threshold, otsu_threshold_patchwise,
)
from ..ops.denoise import nlm_denoise
from ..ops.morphology import (
    binary_opening, binary_closing, binary_erode,
    binary_reconstruction_by_dilation,
)
from ..ops.components import (
    remove_small_objects, remove_small_holes, largest_component,
    convex_hull_mask, clean_mask,
)
from ..ops.skeleton import skeletonize, prune_isolated
from ..ops.orientation import compute_orientation_field, OrientationField


class EnhancementResult(NamedTuple):
    """Stage images, mirroring the reference's returned dict
    (fingerprint_preprocess.py:214-222)."""
    normalized: jnp.ndarray   # [0,1]
    denoised: jnp.ndarray     # [0,1]
    segmented: jnp.ndarray    # [0,1], masked gray
    mask: jnp.ndarray         # bool foreground
    binary: jnp.ndarray       # bool ridges
    skeleton: jnp.ndarray     # bool 1-px skeleton
    orientation: jnp.ndarray  # [-pi/2, pi/2) pixel field
    reliability: jnp.ndarray  # [0,1] upsampled block reliability


def _quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Round through the uint8 grid, staying float (the reference converts
    to uint8 between stages; quantization affects thresholds)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """Percentile stretch (0.5/99.5) + CLAHE clip 2.5 tile 8
    (fingerprint_preprocess.py:13-29)."""
    f = percentile_stretch(img, 0.5, 99.5)
    return clahe(_quantize_u8(f), clip_limit=2.5, grid=8)


def _auto_pallas(use_pallas: bool | None) -> bool:
    """None -> use the Pallas kernels on TPU, XLA elsewhere."""
    if use_pallas is None:
        import jax
        return jax.default_backend() == "tpu"
    return use_pallas


def denoise_image(img: jnp.ndarray,
                  use_pallas: bool | None = None) -> jnp.ndarray:
    """NLM (h=10, template 7, search 21) + 3x3 Gaussian sigma 0.6
    (fingerprint_preprocess.py:34-38)."""
    if _auto_pallas(use_pallas):
        # symmetric-pair kernel: mirror SSD reuse halves the banded-matmul
        # wall; the border ring is recomputed in-kernel (32.0 vs 38.9 ms
        # blocked at batch 128, parity < 5e-6)
        from ..ops.pallas_kernels import nlm_denoise_pallas_sym
        lead = img.shape[:-2]
        flat = img.reshape((-1,) + img.shape[-2:])
        d = nlm_denoise_pallas_sym(flat).reshape(lead + img.shape[-2:])
    else:
        d = nlm_denoise(img, h=10.0, template_window=7, search_window=21)
    return gaussian_blur_cv(d, ksize=3, sigma=0.6)


def segment_fingerprint(img: jnp.ndarray, hull_directions: int = 90
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Classical segmentation: CLAHE 2.0 → 5x5 Gaussian → Otsu → polarity
    fix → 15x15 ellipse close/open → largest component → convex hull
    (fingerprint_preprocess.py:86-136).

    Returns (segmented_gray, hull_mask). Full-frame (no bbox crop); the mask
    carries the reference's crop information instead.
    """
    stab = clahe(_quantize_u8(img), clip_limit=2.0, grid=8)
    blur = gaussian_blur_cv(stab, ksize=5, sigma=0.0)
    thr = otsu_threshold(blur)[..., None, None]
    mask = blur > thr

    # Foreground should be the darker side (ridges are dark) (:103-104).
    mf = mask.astype(jnp.float32)
    mean_fg = jnp.sum(img * mf, axis=(-2, -1)) / jnp.maximum(
        jnp.sum(mf, axis=(-2, -1)), 1.0)
    mean_bg = jnp.sum(img * (1 - mf), axis=(-2, -1)) / jnp.maximum(
        jnp.sum(1 - mf, axis=(-2, -1)), 1.0)
    flip = (mean_fg > mean_bg)[..., None, None]
    mask = jnp.where(flip, jnp.logical_not(mask), mask)

    # closing+opening bit-packed 32 masks/plane (exact, pure XLA; identical
    # to binary_closing + binary_opening at 1/32nd the data touched)
    from ..ops.morphology import binary_close_open_packed
    m = binary_close_open_packed(mask, 15, shape="ellipse")
    m = largest_component(m)
    hull = convex_hull_mask(m, n_directions=hull_directions)
    # Empty mask -> all-ones (reference :113-118).
    empty = jnp.logical_not(jnp.any(m, axis=(-2, -1), keepdims=True))
    hull = jnp.logical_or(hull, empty)
    return img * hull.astype(img.dtype), hull


def binarize(img: jnp.ndarray, use_pallas: bool | None = None) -> jnp.ndarray:
    """Hybrid Sauvola + per-patch-Otsu binarization
    (fingerprint_preprocess.py:43-81).

    CLAHE 2.5 → adaptive Sauvola with spatially varying k-map
    k·(1 − 0.5·std_n) → per-32x32 Otsu OR-refinement (patch std gate 3/255)
    → small-object/hole cleanup → 3x3 ellipse open → erode-marker geodesic
    reconstruction. The formula T = m·(1 − k_map·(1 − s/m)) is
    scale-invariant, so it transfers unchanged to [0,1].
    """
    img_eq = clahe(_quantize_u8(img), clip_limit=2.5, grid=8)

    win, k = 25, 0.25
    if _auto_pallas(use_pallas):
        h, w = img_eq.shape[-2:]
        if h % 8 == 0 and h % 32 == 0 and w % 32 == 0:
            # post-CLAHE stage as fused VMEM kernels, split around a
            # bit-packed border-reachability pass (32 images per int32
            # plane) so the valley background's slow CC relaxation — mean
            # 27/max 58 sweeps — runs at 1/32nd the data volume.
            from ..ops.pallas_kernels import binarize_fused_split_pallas
            return binarize_fused_split_pallas(img_eq, win, k)
    if _auto_pallas(use_pallas):
        from ..ops.pallas_kernels import sauvola_binarize_pallas
        lead = img_eq.shape[:-2]
        flat = img_eq.reshape((-1,) + img_eq.shape[-2:])
        binary = sauvola_binarize_pallas(flat, win, k).reshape(img_eq.shape) > 0.5
    else:
        mean = box_filter(img_eq, win)
        sqmean = box_filter(img_eq * img_eq, win)
        std = jnp.sqrt(jnp.clip(sqmean - mean * mean, 0.0, None))
        std_n = std / (jnp.max(std, axis=(-2, -1), keepdims=True) + 1e-6)
        k_map = k * (1.0 - 0.5 * std_n)
        sauv = mean * (1.0 - k_map * (1.0 - std / (mean + 1e-6)))
        binary = img_eq < sauv

    # Per-patch Otsu OR-refinement; skip near-flat patches (std < 3/255).
    patch = 32
    thr = otsu_threshold_patchwise(img_eq, patch)
    lead = img_eq.shape[:-2]
    h, w = img_eq.shape[-2:]
    blocks = img_eq.reshape(lead + (h // patch, patch, w // patch, patch))
    p_std = jnp.std(blocks, axis=(-3, -1))
    p_std = jnp.repeat(jnp.repeat(p_std, patch, axis=-1), patch, axis=-2)
    refine = jnp.logical_and(img_eq < thr, p_std >= 3.0 / 255.0)
    binary = jnp.logical_or(binary, refine)

    cleaned = clean_mask(binary, 80, 150, connectivity=1)

    opened = binary_opening(cleaned, 3, shape="ellipse")
    marker = binary_erode(opened, 3, shape="ellipse")
    return binary_reconstruction_by_dilation(marker, opened)


def smooth_fingerprint_skeleton(binary: jnp.ndarray, sigma: float = 1.4,
                                diffusion_iter: int = 3,
                                contrast_boost: float = 1.25,
                                threshold: float = 0.35) -> jnp.ndarray:
    """Anisotropic (tangential) smoothing of the binary ridge map
    (fingerprint_preprocess.py:141-159). Normal field is computed once from
    the input; each iteration adds sigma * (tangential gradient projection).
    """
    img = binary.astype(jnp.float32)
    gx, gy = sobel(img)
    mag = jnp.sqrt(gx * gx + gy * gy) + 1e-6
    nx, ny = gx / mag, gy / mag

    smoothed = img
    for _ in range(diffusion_iter):
        dx, dy = sobel(smoothed)
        grad_proj = dx * ny - dy * nx
        smoothed = smoothed + sigma * grad_proj

    smoothed = gaussian_blur(smoothed, 0.6)
    smoothed = jnp.clip(smoothed * contrast_boost, 0.0, 1.0)
    return smoothed > threshold


def thinning_and_cleaning(binary_smooth: jnp.ndarray, reliability: jnp.ndarray,
                          rel_thresh: float = 0.1,
                          use_pallas: bool | None = None) -> jnp.ndarray:
    """Reliability-gated skeletonization (fingerprint_preprocess.py:161-177):
    small-object/hole cleanup → mask by smoothed reliability → thin →
    prune isolated tips. On TPU the cleanup runs as the fused CC kernel and
    the Zhang-Suen while_loop runs bit-packed, 32 images per int32 plane
    (`pallas_bitpack.zs_thin_bitpacked`) — an order of magnitude fewer VPU
    ops than per-image f32 thinning."""
    rel_smooth = gaussian_blur(reliability, 2.0)
    if _auto_pallas(use_pallas):
        from ..ops.pallas_cc import clean_mask_split
        from ..ops.pallas_bitpack import zs_thin_bitpacked
        # clean_mask_split: the slowly converging border-connected valley
        # network (mean 27 / max 58 sweeps) relaxes bit-packed, 32 images
        # per int32 plane; the per-image relax only sees interior holes
        # and non-canonical border nubs (exact for any border-component
        # count — the earlier one-border-component witness failed on
        # valley networks and made the split cost 53 vs 25 ms here).
        cleaned = clean_mask_split(binary_smooth, 64, 80, connectivity=1)
        gated = jnp.logical_and(cleaned, rel_smooth > rel_thresh)
        return zs_thin_bitpacked(gated, prune=True)
    mask = clean_mask(binary_smooth, 64, 80, connectivity=1)
    mask = jnp.logical_and(mask, rel_smooth > rel_thresh)
    skel = skeletonize(mask)
    return prune_isolated(skel)


def preprocess_fingerprint(img: jnp.ndarray,
                           block_size: int = 16,
                           orientation_sigma: float = 3.0,
                           hull_directions: int = 90,
                           use_pallas: bool | None = None,
                           gabor: bool = False,
                           gabor_params: dict | None = None
                           ) -> EnhancementResult:
    """Full enhancement chain over (..., H, W) float32 in [0,1]
    (fingerprint_preprocess.py:182-225). H, W must be multiples of 32.

    jit/vmap-able; typical use is ``jax.jit(preprocess_fingerprint)`` on a
    (B, H, W) batch.

    gabor=True inserts the north-star extension stage (BASELINE.json;
    the reference chain has no Gabor bank, SURVEY.md §2.3 note): after the
    orientation field, a per-block ridge-frequency estimate drives an
    orientation/frequency-quantized Gabor bank, and binarization runs on
    the enhanced image. Config key: preprocessing.gabor.*.
    """
    normalized = normalize_image(img)
    denoised = denoise_image(normalized, use_pallas=use_pallas)
    segmented, mask = segment_fingerprint(denoised, hull_directions)

    field: OrientationField = compute_orientation_field(
        segmented, mask=mask, block_size=block_size,
        smooth_sigma=orientation_sigma,
        smooth_orientation_sigma=orientation_sigma,
    )

    if gabor:
        from ..ops.gabor import (estimate_ridge_frequency_blockwise,
                                 gabor_enhance_blockfreq)
        gp = gabor_params or {}
        freq_map = estimate_ridge_frequency_blockwise(
            segmented, mask=mask,
            block_size=gp.get("block_size", 32))
        resp = gabor_enhance_blockfreq(
            segmented, field.orientation, freq_map, mask=mask,
            n_orientations=gp.get("n_orientations", 12),
            n_frequencies=gp.get("n_frequencies", 4),
            size=gp.get("kernel_size", 11))
        # map back to [0,1] with ridges dark (ridge centers correlate
        # negatively with the even cos kernel on dark-ridge images)
        amp = jnp.max(jnp.abs(resp), axis=(-2, -1), keepdims=True)
        to_binarize = jnp.clip(
            0.5 + 0.5 * resp / jnp.maximum(amp, 1e-6), 0.0, 1.0)
        to_binarize = jnp.where(mask, to_binarize, segmented)
    else:
        to_binarize = segmented

    binary = binarize(to_binarize, use_pallas=use_pallas)

    binary_smooth = smooth_fingerprint_skeleton(binary.astype(jnp.float32))
    skeleton = thinning_and_cleaning(binary_smooth, field.reliability)

    return EnhancementResult(
        normalized=normalized,
        denoised=denoised,
        segmented=segmented,
        mask=mask,
        binary=binary,
        skeleton=skeleton,
        orientation=field.orientation,
        reliability=field.reliability,
    )

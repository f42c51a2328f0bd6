"""TPU-native image/compute ops.

Each module replaces one family of the reference's out-of-repo C/C++ kernels
(SURVEY.md §2.9) with jit-able JAX/XLA (and, for the hot fused paths, Pallas)
implementations over batched (..., H, W) tensors.
"""

from .filters import (
    conv2d_same, gaussian_kernel1d, gaussian_blur, box_filter, sobel, blur_mean
)
from .histogram import (
    percentile_stretch, clahe, otsu_threshold, otsu_threshold_patchwise, equalize_hist
)
from .morphology import (
    erode, dilate, opening, closing, reconstruction_by_dilation,
    binary_dilate, binary_erode, binary_opening, binary_closing,
    binary_reconstruction_by_dilation,
)
from .components import (
    connected_components, remove_small_objects, remove_small_holes,
    largest_component, convex_hull_mask
)
from .skeleton import skeletonize, neighbor_count
from .denoise import nlm_denoise, bilateral_filter
from .orientation import compute_orientation_field
from .geometry import rotate_points, angle_diff, resize_bilinear

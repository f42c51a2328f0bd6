from .enhance import (
    normalize_image, denoise_image, segment_fingerprint, binarize,
    smooth_fingerprint_skeleton, thinning_and_cleaning,
    preprocess_fingerprint, EnhancementResult,
)

from .data import (
    FingerprintAugmentations, collect_image_paths, two_view_batches,
    preprocess_image, extract_id,
)
from .embeddings import extract_embeddings

from .ransac import (
    MatchParams, MatchResult, compute_descriptor_weights, match_minutiae_pair,
    match_pairs_batch,
)

from .metrics import (
    evaluate_frr_across_thresholds, evaluate_far_across_thresholds,
    compute_eer, report_scores, compute_minutiae_statistics,
)
from .roc import plot_roc

from .segment import (
    assignment_f1,
    assignment_ari,
    assignment_accuracy,
    cluster_purity,
    segmentation_report,
)

__all__ = [
    "assignment_f1",
    "assignment_ari",
    "assignment_accuracy",
    "cluster_purity",
    "segmentation_report",
]

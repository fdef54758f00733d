from .contamination import (
    get_neighbor_frequencies,
    calculate_contamination,
    contamination_flow,
    group_reference,
    expression_summary_from_anndata,
)

__all__ = [
    "get_neighbor_frequencies",
    "calculate_contamination",
    "contamination_flow",
    "group_reference",
    "expression_summary_from_anndata",
]

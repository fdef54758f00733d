from .padded_csr import (
    PaddedCSR,
    coo_to_padded_csr,
    padded_csr_to_coo,
    transpose_csr,
    pad_rows,
)
from .gather_agg import (
    csr_gather,
    row_gather_1d,
    csr_gather_t,
    csr_spmm,
    csr_sddmm,
    csr_softmax,
    csr_max,
    score_candidates,
    segment_sum,
    segment_max,
    segment_softmax,
)

__all__ = [
    "PaddedCSR",
    "row_gather_1d",
    "coo_to_padded_csr",
    "padded_csr_to_coo",
    "transpose_csr",
    "pad_rows",
    "csr_gather",
    "csr_gather_t",
    "csr_spmm",
    "csr_sddmm",
    "csr_softmax",
    "csr_max",
    "score_candidates",
    "segment_sum",
    "segment_max",
    "segment_softmax",
]

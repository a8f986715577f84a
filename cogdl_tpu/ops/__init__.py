from .segment import (
    gather,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
    scatter_max_with_argmax,
)
from .spmm import (
    aggregate,
    cache_propagation,
    edge_softmax,
    mh_sddmm,
    mh_spmm,
    s_add_e_mean,
    s_add_e_sum,
    s_dot_t,
    s_mul_e_mean,
    s_mul_e_sum,
    s_sub_e_sum,
    sddmm,
    spmm,
    spmm_coo,
)

__all__ = [
    "gather", "segment_sum", "segment_mean", "segment_max", "segment_min",
    "segment_softmax", "scatter_max_with_argmax",
    "spmm", "spmm_coo", "sddmm", "mh_spmm", "mh_sddmm", "edge_softmax",
    "cache_propagation",
    "s_add_e_sum", "s_mul_e_sum", "s_sub_e_sum", "s_add_e_mean",
    "s_mul_e_mean", "s_dot_t", "aggregate",
]

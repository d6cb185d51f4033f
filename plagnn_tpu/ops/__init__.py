from .graph_format import (  # noqa: F401
    EllBlock,
    Graph,
    MultiEll,
    build_graph,
    build_multi_ell,
    from_scipy_coo,
    pad_features,
)
from .spmm import (  # noqa: F401
    gcn_propagate,
    sddmm_dot,
    segment_spmm_max,
    segment_spmm_sum,
    spmm_max,
    spmm_mean,
    spmm_sum,
)

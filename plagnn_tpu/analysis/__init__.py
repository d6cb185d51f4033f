from .performance import (  # noqa: F401
    mat_merge as performance_mat_merge,
    performance,
    performances_record,
    random_pred,
)
from .score import mat_merge, misloc_protein_record, score_all  # noqa: F401
from .statistics import topology_statistics  # noqa: F401

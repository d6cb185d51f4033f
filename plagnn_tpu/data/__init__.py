from .synthetic import (  # noqa: F401
    powerlaw_ppi,
    synthetic_dataset,
    synthetic_features,
    synthetic_loc_matrix,
)


def data_normalize(mat):
    """Per-column z-score (port of utils.py:11-25).  NOTE: defined but never
    called by the reference's main paths — kept for API completeness."""
    import numpy as np

    mat_normalize = np.array(mat, copy=True, dtype=np.float64)
    p_mean = mat_normalize.mean(0)
    p_std = mat_normalize.std(0)
    for j in range(mat_normalize.shape[1]):
        mat_normalize[:, j] = (mat_normalize[:, j] - p_mean[j]) / p_std[j]
    return mat_normalize

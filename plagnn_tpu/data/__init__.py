from .synthetic import (  # noqa: F401
    powerlaw_ppi,
    synthetic_dataset,
    synthetic_features,
    synthetic_loc_matrix,
)

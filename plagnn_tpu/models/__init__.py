from . import layers  # noqa: F401
from .gnn32 import (  # noqa: F401
    MODEL_REGISTRY,
    gcn2_apply,
    gnn32_activations,
    gnn32_apply,
    init_gcn2,
    init_gnn32,
)

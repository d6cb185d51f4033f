from .partition import (  # noqa: F401
    PartitionedGraph,
    partition_graph,
    shard_features,
    unshard_rows,
)
from .sharded import (  # noqa: F401
    FOLD_AXIS,
    GRAPH_AXIS,
    halo_exchange,
    make_mesh,
    make_sharded_forward,
    make_sharded_pallas_agg,
    make_sharded_pallas_train_step,
    make_sharded_train_step,
    sharded_gcn_propagate,
    sharded_gnn32_apply,
    sharded_sage_conv,
)

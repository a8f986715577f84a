from .mesh import make_mesh, shard_graph, replicate, shard_expert_params
from .multihost import initialize_distributed, make_hybrid_mesh
from .feature_shard import (
    gather_sharded_rows,
    gather_sharded_rows_dp,
    sample_blocks_device_sharded,
    shard_rows,
    sharded_frame_features,
)

__all__ = ["make_mesh", "shard_graph", "replicate", "shard_expert_params",
           "initialize_distributed", "make_hybrid_mesh",
           "shard_rows", "gather_sharded_rows", "gather_sharded_rows_dp",
           "sample_blocks_device_sharded", "sharded_frame_features"]

from .mesh import make_mesh, shard_graph, replicate, shard_expert_params
from .multihost import initialize_distributed, make_hybrid_mesh

__all__ = ["make_mesh", "shard_graph", "replicate", "shard_expert_params",
           "initialize_distributed", "make_hybrid_mesh"]

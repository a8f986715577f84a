from .mesh import make_mesh, shard_graph, replicate, shard_expert_params

__all__ = ["make_mesh", "shard_graph", "replicate", "shard_expert_params"]

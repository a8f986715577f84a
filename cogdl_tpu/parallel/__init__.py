from .mesh import make_mesh, shard_graph, replicate

__all__ = ["make_mesh", "shard_graph", "replicate"]

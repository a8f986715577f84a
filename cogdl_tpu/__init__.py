"""cogdl_tpu — a TPU-native graph deep learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of THUDM/CogDL
(graph neural networks, graph embeddings, knowledge-graph completion,
heterogeneous graphs, self-supervised graph pretraining) designed for TPU:
statically-shaped CSR graphs, MXU block-sparse SpMM, jit-compiled training
steps, and mesh-parallel scaling via shard_map.
"""

__version__ = "0.1.0"

from .data import Graph, from_coo  # noqa: F401


def experiment(*args, **kwargs):
    from .experiments import experiment as _experiment

    return _experiment(*args, **kwargs)

"""GraphSAINT — GCN trained on sampled subgraphs with normalisation
coefficients (reference cogdl/models/nn/graphsaint.py + saint_layer).
The sampler lives in cogdl_tpu.data.sampling (random-node/edge/walk
subgraphs with static shapes); this backbone consumes them directly."""

from __future__ import annotations

from .gcn import GCN


class GraphSAINT(GCN):
    """GCN backbone over SAINT-sampled subgraph batches."""

"""Task wrappers — the rebuild of the reference's DataWrapper/ModelWrapper
abstraction (cogdl/wrappers/). A wrapper owns the task-specific pieces:
loss, evaluation, data preparation; the Trainer stays task-agnostic.
"""

from __future__ import annotations

from typing import Dict

SUPPORTED_WRAPPERS: Dict[str, str] = {
    "node_classification": "cogdl_tpu.wrappers.node_classification.NodeClfWrapper",
    "gcnmix": "cogdl_tpu.wrappers.node_classification.GCNMixWrapper",
    "neighbor_sampling": "cogdl_tpu.wrappers.sampled_node_classification.SampledNodeClfWrapper",
    "neighbor_sampling_device": "cogdl_tpu.wrappers.sampled_node_classification.DeviceSampledNodeClfWrapper",
    "cluster": "cogdl_tpu.wrappers.sampled_node_classification.ClusterNodeClfWrapper",
    "graphsaint": "cogdl_tpu.wrappers.sampled_node_classification.GraphSAINTWrapper",
    "graph_classification": "cogdl_tpu.wrappers.graph_classification.GraphClfWrapper",
    "infograph": "cogdl_tpu.wrappers.graph_classification.InfoGraphWrapper",
    "patchy_san": "cogdl_tpu.wrappers.graph_classification.PatchySANWrapper",
    "link_prediction": "cogdl_tpu.wrappers.link_prediction.LinkPredictionWrapper",
    "kg_link_prediction": "cogdl_tpu.wrappers.kg_link_prediction.KGLinkPredictionWrapper",
    "network_embedding": "cogdl_tpu.wrappers.network_embedding.NetworkEmbeddingWrapper",
    "triple_link_prediction": "cogdl_tpu.wrappers.triple_link_prediction.TripleLinkPredictionWrapper",
    "dgi": "cogdl_tpu.wrappers.self_supervised.DGIWrapper",
    "grace": "cogdl_tpu.wrappers.self_supervised.GRACEWrapper",
    "graphmae": "cogdl_tpu.wrappers.self_supervised.GraphMAEWrapper",
    "bgrl": "cogdl_tpu.wrappers.self_supervised.BGRLWrapper",
    "graphmae2": "cogdl_tpu.wrappers.self_supervised.GraphMAE2Wrapper",
    "self_auxiliary": "cogdl_tpu.wrappers.self_supervised.SelfAuxiliaryWrapper",
    "unsup_graphsage": "cogdl_tpu.wrappers.self_supervised.UnsupGraphSAGEWrapper",
    "clustering": "cogdl_tpu.wrappers.clustering.ClusteringWrapper",
    "recommendation": "cogdl_tpu.wrappers.recommendation.RecommendationWrapper",
    "heterogeneous_gnn": "cogdl_tpu.wrappers.heterogeneous.HeterogeneousGNNWrapper",
    "multiplex_embedding": "cogdl_tpu.wrappers.heterogeneous.MultiplexEmbeddingWrapper",
    "graph_embedding": "cogdl_tpu.wrappers.heterogeneous.GraphEmbeddingWrapper",
    "traffic_prediction": "cogdl_tpu.wrappers.traffic_prediction.TrafficPredictionWrapper",
    "distributed": "cogdl_tpu.wrappers.distributed.DistributedNodeClfWrapper",
    "gcc": "cogdl_tpu.wrappers.pretraining.GCCWrapper",
    "sagn_staged": "cogdl_tpu.wrappers.staged.SAGNWrapper",
    "m3s_staged": "cogdl_tpu.wrappers.staged.M3SWrapper",
    "correct_smooth": "cogdl_tpu.wrappers.staged.CorrectSmoothWrapper",
}

# model name → default wrapper (reference cogdl/wrappers/default_match.py:9)
DEFAULT_WRAPPER = {
    "gcn": "node_classification", "gat": "node_classification",
    "graphsage": "node_classification", "sage": "node_classification",
    "sgc": "node_classification", "sign": "node_classification",
    "appnp": "node_classification", "ppnp": "node_classification",
    "gcnii": "node_classification", "mixhop": "node_classification",
    "grand": "node_classification", "mlp": "node_classification",
    "deepergcn": "node_classification", "dropedge_gcn": "node_classification",
    "revgcn": "node_classification", "graphsaint": "graphsaint",
    "pprgo": "node_classification", "sagn": "sagn_staged",
    "m3s": "m3s_staged", "moe_gcn": "node_classification",
    "correct_smooth_mlp": "correct_smooth",
    "gcc": "gcc",
    "gcnmix": "gcnmix", "drgcn": "node_classification",
    "robustgcn": "node_classification", "gnnguard_gcn": "node_classification",
    "drgat": "node_classification", "autognn": "node_classification",
    "prone++": "network_embedding",
    "gin": "graph_classification", "diffpool": "graph_classification",
    "sortpool": "graph_classification", "patchy_san": "patchy_san",
    "infograph": "infograph",
    "dgi": "dgi", "grace": "grace", "mvgrl": "dgi", "graphmae": "graphmae",
    "bgrl": "bgrl", "graphmae2": "graphmae2",
    "unsup_graphsage": "unsup_graphsage",
    "lightgcn": "recommendation", "stgcn": "traffic_prediction",
    "stgat": "traffic_prediction",
    "han": "heterogeneous_gnn", "gtn": "heterogeneous_gnn",
    "simple_hgn": "heterogeneous_gnn",
    "rgcn": "heterogeneous_gnn", "compgcn": "heterogeneous_gnn",
    "gatne": "multiplex_embedding",
    "graph2vec": "graph_embedding", "dgk": "graph_embedding",
    "gae": "clustering", "vgae": "clustering", "agc": "clustering",
    "daegc": "clustering",
    "deepwalk": "network_embedding", "node2vec": "network_embedding",
    "line": "network_embedding", "netmf": "network_embedding",
    "netsmf": "network_embedding", "prone": "network_embedding",
    "hope": "network_embedding", "grarep": "network_embedding",
    "spectral": "network_embedding", "sdne": "network_embedding",
    "dngr": "network_embedding", "metapath2vec": "network_embedding",
    "pte": "network_embedding", "hin2vec": "network_embedding",
    "transe": "triple_link_prediction", "distmult": "triple_link_prediction",
    "rotate": "triple_link_prediction", "complex": "triple_link_prediction",
}


def fetch_wrapper(name: str):
    import importlib

    try:
        path = SUPPORTED_WRAPPERS[name]
    except KeyError:
        raise ValueError(
            f"unknown wrapper {name!r}; known: {sorted(SUPPORTED_WRAPPERS)}"
        ) from None
    module_path, cls_name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module_path), cls_name)


def default_wrapper_for(model_name: str) -> str:
    return DEFAULT_WRAPPER.get(model_name, "node_classification")

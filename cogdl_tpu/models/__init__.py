"""Model registry — lazy name → class resolution like the reference
(cogdl/models/__init__.py:33-121), but with typed constructor kwargs instead of
an argparse namespace.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

SUPPORTED_MODELS: Dict[str, str] = {
    # supervised GNNs (cogdl/models/nn)
    "gcn": "cogdl_tpu.models.nn.gcn.GCN",
    "gat": "cogdl_tpu.models.nn.gat.GAT",
    "graphsage": "cogdl_tpu.models.nn.graphsage.GraphSAGE",
    "sage": "cogdl_tpu.models.nn.graphsage.GraphSAGE",
    "gin": "cogdl_tpu.models.nn.gin.GIN",
    "sgc": "cogdl_tpu.models.nn.sgc.SGC",
    "sign": "cogdl_tpu.models.nn.sign.SIGN",
    "ppnp": "cogdl_tpu.models.nn.appnp.APPNP",
    "appnp": "cogdl_tpu.models.nn.appnp.APPNP",
    "gcnii": "cogdl_tpu.models.nn.gcnii.GCNII",
    "mixhop": "cogdl_tpu.models.nn.mixhop.MixHop",
    "grand": "cogdl_tpu.models.nn.grand.Grand",
    "mlp": "cogdl_tpu.models.nn.mlp.MLPModel",
    "dropedge_gcn": "cogdl_tpu.models.nn.dropedge_gcn.DropEdgeGCN",
    "deepergcn": "cogdl_tpu.models.nn.deepergcn.DeeperGCN",
    "rgcn": "cogdl_tpu.models.nn.rgcn.RGCN",
    "compgcn": "cogdl_tpu.models.nn.compgcn.CompGCN",
    "han": "cogdl_tpu.models.nn.han.HAN",
    "gtn": "cogdl_tpu.models.nn.gtn.GTN",
    "simple_hgn": "cogdl_tpu.models.nn.simple_hgn.SimpleHGN",
    "bgrl": "cogdl_tpu.models.nn.bgrl.BGRL",
    "graphmae2": "cogdl_tpu.models.nn.graphmae2.GraphMAE2",
    "lightgcn": "cogdl_tpu.models.nn.lightgcn.LightGCN",
    "pprgo": "cogdl_tpu.models.nn.pprgo.PPRGo",
    "graph_unet": "cogdl_tpu.models.nn.graph_unet.GraphUnet",
    "unet": "cogdl_tpu.models.nn.graph_unet.GraphUnet",
    "revgcn": "cogdl_tpu.models.nn.revgcn.RevGCN",
    "revgat": "cogdl_tpu.models.nn.revgcn.RevGAT",
    "revgen": "cogdl_tpu.models.nn.revgcn.RevGEN",
    "actgcn": "cogdl_tpu.models.nn.actgcn.ActGCN",
    "srgcn": "cogdl_tpu.models.nn.srgcn.SRGCN",
    "gdc_gcn": "cogdl_tpu.models.nn.gdc_gcn.GDCGCN",
    "disengcn": "cogdl_tpu.models.nn.disengcn.DisenGCN",
    "moe_gcn": "cogdl_tpu.models.nn.moe_gcn.MoEGCN",
    "gcnmix": "cogdl_tpu.models.nn.gcnmix.GCNMix",
    "drgcn": "cogdl_tpu.models.nn.drgcn.DrGCN",
    "drgat": "cogdl_tpu.models.nn.drgcn.DrGAT",
    "stgat": "cogdl_tpu.models.nn.stgat.STGAT",
    "autognn": "cogdl_tpu.models.nn.autognn.AutoGNN",
    "stgcn": "cogdl_tpu.models.nn.stgcn.STGCN",
    "correct_smooth_mlp": "cogdl_tpu.models.nn.correct_smooth.CorrectSmoothMLP",
    "sagn": "cogdl_tpu.models.nn.sagn.SAGN",
    "m3s": "cogdl_tpu.models.nn.m3s.M3S",
    "graphsaint": "cogdl_tpu.models.nn.graphsaint.GraphSAINT",
    "unsup_graphsage": "cogdl_tpu.models.nn.graphsage.UnsupGraphSAGE",
    # self-supervised GNNs
    "dgi": "cogdl_tpu.models.nn.dgi.DGI",
    "grace": "cogdl_tpu.models.nn.grace.GRACE",
    "mvgrl": "cogdl_tpu.models.nn.mvgrl.MVGRL",
    "gae": "cogdl_tpu.models.nn.gae.GAE",
    "vgae": "cogdl_tpu.models.nn.gae.VGAE",
    "agc": "cogdl_tpu.models.nn.agc.AGC",
    "daegc": "cogdl_tpu.models.nn.daegc.DAEGC",
    "infograph": "cogdl_tpu.models.nn.infograph.InfoGraph",
    "gcc": "cogdl_tpu.models.nn.gcc.GCC",
    "gnnguard_gcn": "cogdl_tpu.models.nn.gnnguard.GNNGuardGCN",
    "robustgcn": "cogdl_tpu.models.nn.robustgcn.RobustGCN",
    "graphmae": "cogdl_tpu.models.nn.graphmae.GraphMAE",
    # graph classification + pooling
    "diffpool": "cogdl_tpu.models.nn.diffpool.DiffPool",
    "sortpool": "cogdl_tpu.models.nn.sortpool.SortPool",
    "patchy_san": "cogdl_tpu.models.nn.patchy_san.PatchySAN",
    # shallow embeddings (cogdl/models/emb)
    "deepwalk": "cogdl_tpu.models.emb.deepwalk.DeepWalk",
    "node2vec": "cogdl_tpu.models.emb.node2vec.Node2Vec",
    "line": "cogdl_tpu.models.emb.line.LINE",
    "netmf": "cogdl_tpu.models.emb.netmf.NetMF",
    "netsmf": "cogdl_tpu.models.emb.netsmf.NetSMF",
    "prone": "cogdl_tpu.models.emb.prone.ProNE",
    "prone++": "cogdl_tpu.models.emb.prone_pp.ProNEpp",
    "hope": "cogdl_tpu.models.emb.hope.HOPE",
    "grarep": "cogdl_tpu.models.emb.grarep.GraRep",
    "spectral": "cogdl_tpu.models.emb.spectral.Spectral",
    "sdne": "cogdl_tpu.models.emb.sdne.SDNE",
    "dngr": "cogdl_tpu.models.emb.dngr.DNGR",
    "metapath2vec": "cogdl_tpu.models.emb.metapath2vec.Metapath2Vec",
    "pte": "cogdl_tpu.models.emb.pte.PTE",
    "hin2vec": "cogdl_tpu.models.emb.hin2vec.Hin2Vec",
    "gatne": "cogdl_tpu.models.emb.gatne.GATNE",
    "graph2vec": "cogdl_tpu.models.emb.graph2vec.Graph2Vec",
    "dgk": "cogdl_tpu.models.emb.dgk.DeepGraphKernel",
    # KG triple embeddings
    "transe": "cogdl_tpu.models.emb.knowledge_base.TransE",
    "distmult": "cogdl_tpu.models.emb.knowledge_base.DistMult",
    "rotate": "cogdl_tpu.models.emb.knowledge_base.RotatE",
    "complex": "cogdl_tpu.models.emb.knowledge_base.ComplEx",
}


def build_model(name: str, **kwargs) -> Any:
    """Instantiate a registered model by name with constructor kwargs."""
    try:
        path = SUPPORTED_MODELS[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; known: {sorted(SUPPORTED_MODELS)}"
        ) from None
    module_path, cls_name = path.rsplit(".", 1)
    cls = getattr(importlib.import_module(module_path), cls_name)
    if hasattr(cls, "build_model"):
        return cls.build_model(**kwargs)
    # drop kwargs the model doesn't declare — the reference's per-model
    # add_args parsing has the same effect (options.py:149-185): a shared
    # hyper-parameter like hidden_size is simply ignored by models without
    # that knob (SGC, AGC, ...)
    import inspect

    sig = inspect.signature(cls.__init__)
    params = sig.parameters.values()
    if not any(p.kind == inspect.Parameter.VAR_KEYWORD for p in params):
        accepted = {p.name for p in params}
        kwargs = {k: v for k, v in kwargs.items() if k in accepted}
    return cls(**kwargs)


def register_model(name: str, path: str) -> None:
    SUPPORTED_MODELS[name] = path

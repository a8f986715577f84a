from .gcn_layer import GCNLayer
from .gat_layer import GATLayer
from .sage_layer import SAGELayer
from .gin_layer import GINLayer
from .gcnii_layer import GCNIILayer
from .sgc_layer import SGCLayer
from .mixhop_layer import MixHopLayer
from .se_layer import SELayer
from .mlp import MLP
from .appnp_layer import APPNPProp
from .rgcn_layer import RGCNLayer
from .han_layer import HANLayer
from .deepergcn_layer import GENConv, ResGNNLayer
from .set2set import Set2Set

__all__ = [
    "GCNLayer", "GATLayer", "SAGELayer", "GINLayer", "GCNIILayer",
    "SGCLayer", "MixHopLayer", "SELayer", "MLP", "APPNPProp",
    "RGCNLayer", "HANLayer", "GENConv", "ResGNNLayer", "Set2Set",
]

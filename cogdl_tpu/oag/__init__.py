from .bert_model import BertConfig, BertModel
from .oagbert import oagbert

__all__ = ["BertConfig", "BertModel", "oagbert"]

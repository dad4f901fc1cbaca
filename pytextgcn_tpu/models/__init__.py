from .gcn import GCN, EGCN
from .jk import JumpingKnowledgeNetwork
from .mlp import MLP

__all__ = ["GCN", "EGCN", "JumpingKnowledgeNetwork", "MLP"]

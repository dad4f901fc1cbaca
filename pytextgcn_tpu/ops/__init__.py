from .adjacency import NormAdj
from .features import NodeFeatures
from .spmm import spmm

__all__ = ["NormAdj", "NodeFeatures", "spmm"]

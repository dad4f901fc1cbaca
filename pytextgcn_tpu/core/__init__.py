from .graph import TextGraph, gcn_normalize

__all__ = ["TextGraph", "gcn_normalize"]

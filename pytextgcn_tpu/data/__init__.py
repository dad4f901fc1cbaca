from .loaders import load_amazon, load_dbpedia
from .synthetic import synthetic_corpus

__all__ = ["load_amazon", "load_dbpedia", "synthetic_corpus"]

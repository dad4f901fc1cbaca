from .text2graph import Text2Graph
from .vectorizer import CountVectorizer, TfidfTransform
from .windows import word_word_edges, sliding_window_counts

__all__ = [
    "Text2Graph",
    "CountVectorizer",
    "TfidfTransform",
    "word_word_edges",
    "sliding_window_counts",
]

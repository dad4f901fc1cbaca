"""Deterministic synthetic corpora.

The reference's datasets (data/amazon, data/dbpedia — SURVEY.md §2.5) are
git-LFS blobs that are not present in the reference checkout, so tests and
benchmarks need a stand-in with the same *shape* of signal: documents drawn
from class-conditional word distributions (signature words per class +
shared background vocabulary), optionally with a 2-level label hierarchy for
the per-level / per-label pipelines.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

_SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    "ta", "te", "ti", "to", "tu", "za", "ze", "zi", "zo", "zu",
]


def _make_words(n: int, rng: np.random.Generator) -> List[str]:
    words = set()
    while len(words) < n:
        k = rng.integers(2, 5)
        words.add("".join(rng.choice(_SYLLABLES, size=k)))
    return sorted(words)


def synthetic_corpus(
    n_docs: int = 200,
    n_classes: int = 4,
    n_parents: Optional[int] = None,
    vocab_per_class: int = 30,
    shared_vocab: int = 60,
    doc_len: Tuple[int, int] = (8, 40),
    signal: float = 0.55,
    seed: int = 0,
):
    """Generate (docs, labels[, parent_labels]).

    Each class owns ``vocab_per_class`` signature words; a document mixes
    signature words (probability ``signal``) with shared background words.
    If ``n_parents`` is given, classes are grouped into parents and the
    return value gains a parallel parent-label list (for the hierarchy
    pipelines, mirroring Amazon's Cat1/Cat2 columns).
    """
    rng = np.random.default_rng(seed)
    class_words = [
        np.array(_make_words(vocab_per_class, np.random.default_rng(seed + 1 + c)))
        for c in range(n_classes)
    ]
    background = np.array(_make_words(shared_vocab, np.random.default_rng(seed + 999)))

    docs, labels = [], []
    for i in range(n_docs):
        c = int(rng.integers(n_classes))
        length = int(rng.integers(doc_len[0], doc_len[1] + 1))
        sig = rng.random(length) < signal
        words = np.where(
            sig,
            class_words[c][rng.integers(0, len(class_words[c]), length)],
            background[rng.integers(0, len(background), length)],
        )
        docs.append(" ".join(words.tolist()))
        labels.append(c)

    if n_parents is None:
        return docs, labels
    parents = [c % n_parents for c in labels]
    return docs, labels, parents

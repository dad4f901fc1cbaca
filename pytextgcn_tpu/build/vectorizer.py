"""Corpus vectorization: vocabulary fit, sparse counts, TF-IDF, encoding.

Re-implements exactly the preprocessing semantics the reference gets from
sklearn + nltk, because downstream edge weights (and hence accuracy parity)
silently depend on them (SURVEY.md §7 "hard parts" (a)):

* ``CountVectorizer`` — sklearn-compatible: lowercase, token pattern
  ``\\b\\w\\w+\\b`` (maximal ``\\w+`` runs of length >= 2), stopword removal,
  document-frequency pruning with ``min_df``/``max_df`` (int = absolute,
  float = fraction of documents; df < min_df or df > max_df removed),
  alphabetically sorted vocabulary. Mirrors the call at
  /root/reference/textgcn/lib/text2graph.py:130-131 but never densifies —
  the reference's ``.toarray()`` RAM cliff is deliberately not reproduced.
* ``TfidfTransform`` — sklearn ``TfidfTransformer`` defaults: smooth idf
  ``ln((1+n)/(1+df)) + 1`` and L2 row normalization
  (text2graph.py:145).
* ``encode_documents`` — the reference's ``_encode_input``
  (text2graph.py:20-46): tokenize with ``\\w+``, lowercase, keep only
  vocabulary words, truncate to ``max_length``, pad with -1 to the corpus
  max length.

All of this is host-side, one-time preprocessing; it feeds the on-device
graph construction in :mod:`pytextgcn_tpu.build.windows`.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy import sparse as sp

from .stopwords import get_stopwords

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def tokenize(doc: str) -> List[str]:
    """Lowercased ``\\w+`` tokens (nltk ``RegexpTokenizer(r"\\w+")`` semantics,
    text2graph.py:31)."""
    return _TOKEN_RE.findall(doc.lower())


class CountVectorizer:
    """Vocabulary fit + sparse document-term counts (sklearn-compatible)."""

    def __init__(
        self,
        min_df=1,
        max_df=1.0,
        stop_words: Optional[Sequence[str]] = None,
        lowercase: bool = True,
        native: str = "auto",
    ):
        """``native``: 'auto' routes pure-ASCII corpora through the C++
        vectorizer kernel (build/native/vectorizer.cpp — byte-identical
        results, ~10x faster), False forces the Python path."""
        assert min_df > 0
        self.min_df = min_df
        self.max_df = max_df
        self.stop_words = None if stop_words is None else frozenset(stop_words)
        self.lowercase = lowercase
        self.native = native
        self.vocabulary_: Dict[str, int] = {}
        self._tokens: Optional[List[List[str]]] = None  # cached \w+ token streams
        self._native_docs = None  # docs fitted through the native path

    def _df_bounds(self, n_docs: int):
        max_doc_count = (
            self.max_df if isinstance(self.max_df, (int, np.integer)) else int(self.max_df * n_docs)
        )
        min_doc_count = (
            self.min_df if isinstance(self.min_df, (int, np.integer)) else int(np.ceil(self.min_df * n_docs))
        )
        return min_doc_count, max_doc_count

    def fit_transform(self, docs: Sequence[str]) -> sp.csr_matrix:
        n_docs = len(docs)
        if self.native in ("auto", True) and self.lowercase and all(
            d.isascii() for d in docs
        ):
            try:
                from .native_bridge import native_fit_counts

                lo, hi = self._df_bounds(n_docs)
                self.vocabulary_, counts = native_fit_counts(
                    docs, self.stop_words, lo, hi
                )
                self._native_docs = docs
                self._tokens = None
                return counts
            except ValueError:
                raise  # empty vocabulary — a real error on either path
            except Exception:
                pass  # toolchain unavailable / compile failure: python path
        # Tokenize once; cache the raw \w+ streams so encode_documents can
        # reuse them (the reference tokenizes twice, text2graph.py:28-34).
        tokens = [tokenize(d) if self.lowercase else _TOKEN_RE.findall(d) for d in docs]
        self._tokens = tokens
        self._fit_docs = docs  # identity guard for the encode-time cache

        # Candidate terms: length >= 2 (sklearn's \b\w\w+\b), not stopwords.
        stop = self.stop_words or frozenset()
        term_ids: Dict[str, int] = {}
        indptr = np.zeros(n_docs + 1, dtype=np.int64)
        col_chunks = []
        for i, toks in enumerate(tokens):
            cols = []
            for t in toks:
                if len(t) >= 2 and t not in stop:
                    j = term_ids.setdefault(t, len(term_ids))
                    cols.append(j)
            col_chunks.append(np.asarray(cols, dtype=np.int64))
            indptr[i + 1] = indptr[i] + len(cols)
        all_cols = np.concatenate(col_chunks) if col_chunks else np.zeros(0, np.int64)
        data = np.ones(all_cols.shape[0], dtype=np.int64)
        raw = sp.csr_matrix(
            (data, all_cols, indptr), shape=(n_docs, max(len(term_ids), 1))
        )
        raw.sum_duplicates()

        # Document-frequency pruning (sklearn: keep min_df <= df <= max_df,
        # thresholds resolved as absolute counts). After sum_duplicates each
        # (row, col) appears once, so a bincount of column ids is the df.
        df = np.bincount(raw.indices, minlength=raw.shape[1])
        min_doc_count, max_doc_count = self._df_bounds(n_docs)
        keep = (df >= min_doc_count) & (df <= max_doc_count)

        terms = np.array(sorted(term_ids, key=term_ids.get), dtype=object)
        kept_terms = terms[keep[: len(terms)]] if len(terms) else terms
        order = np.argsort(kept_terms)
        self.vocabulary_ = {t: int(i) for i, t in enumerate(kept_terms[order])}
        if not self.vocabulary_:
            raise ValueError("empty vocabulary after df pruning")

        # Remap columns: old id -> new sorted id (or drop).
        remap = np.full(raw.shape[1], -1, dtype=np.int64)
        for t, new_id in self.vocabulary_.items():
            remap[term_ids[t]] = new_id
        raw = raw.tocoo()
        m = remap[raw.col] >= 0
        out = sp.csr_matrix(
            (raw.data[m], (raw.row[m], remap[raw.col[m]])),
            shape=(n_docs, len(self.vocabulary_)),
        )
        out.sort_indices()
        return out

    def transform(self, docs: Sequence[str]) -> sp.csr_matrix:
        """Counts for new documents using the fitted vocabulary (sklearn
        ``CountVectorizer.transform`` — unknown terms are dropped)."""
        assert self.vocabulary_, "fit_transform first"
        vocab = self.vocabulary_
        stop = self.stop_words or frozenset()
        indptr = np.zeros(len(docs) + 1, dtype=np.int64)
        cols = []
        for i, d in enumerate(docs):
            toks = tokenize(d) if self.lowercase else _TOKEN_RE.findall(d)
            c = [vocab[t] for t in toks if len(t) >= 2 and t not in stop and t in vocab]
            cols.append(np.asarray(c, dtype=np.int64))
            indptr[i + 1] = indptr[i] + len(c)
        all_cols = np.concatenate(cols) if cols else np.zeros(0, np.int64)
        out = sp.csr_matrix(
            (np.ones(all_cols.shape[0], np.int64), all_cols, indptr),
            shape=(len(docs), len(vocab)),
        )
        out.sum_duplicates()
        out.sort_indices()
        return out

    def encode_documents(
        self, docs: Sequence[str], max_length: Optional[int] = None
    ) -> np.ndarray:
        """Token-id matrix padded with -1 (the reference's ``_encode_input``,
        text2graph.py:20-46): per document, all ``\\w+`` tokens that are in the
        vocabulary, truncated to ``max_length``, padded to the corpus max."""
        vocab = self.vocabulary_
        if self._native_docs is not None and docs is self._native_docs:
            from .native_bridge import native_encode

            terms = sorted(vocab, key=vocab.get)
            return native_encode(docs, terms, max_length)
        if self._tokens is not None and docs is getattr(self, "_fit_docs", None):
            streams = self._tokens
        else:
            # honor the vectorizer's case mode off the cached fast path too
            streams = [
                tokenize(d) if self.lowercase else _TOKEN_RE.findall(d)
                for d in docs
            ]
        enc = []
        for toks in streams:
            ids = [vocab[t] for t in toks if t in vocab]
            if max_length is not None:
                ids = ids[:max_length]
            enc.append(ids)
        max_len = max(map(len, enc)) if enc else 0
        X = np.full((len(enc), max_len), -1, dtype=np.int32)
        for i, ids in enumerate(enc):
            X[i, : len(ids)] = ids
        return X


class TfidfTransform:
    """sklearn ``TfidfTransformer`` defaults: smooth idf + L2 row norm."""

    def __init__(self):
        self.idf_: Optional[np.ndarray] = None

    def fit_transform(self, counts: sp.csr_matrix) -> sp.csr_matrix:
        n_docs, n_terms = counts.shape
        df = np.diff(sp.csc_matrix(counts.astype(bool)).indptr).astype(np.float64)
        self.idf_ = np.log((1.0 + n_docs) / (1.0 + df)) + 1.0
        return self.transform(counts)

    def transform(self, counts: sp.csr_matrix) -> sp.csr_matrix:
        assert self.idf_ is not None, "fit_transform first"
        out = counts.astype(np.float64).multiply(self.idf_[None, :]).tocsr()
        norms = np.sqrt(np.asarray(out.multiply(out).sum(axis=1))).ravel()
        norms[norms == 0] = 1.0
        inv = sp.diags(1.0 / norms)
        out = (inv @ out).tocsr()
        out.sort_indices()
        return out

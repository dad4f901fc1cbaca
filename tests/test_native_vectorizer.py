"""C++ vectorizer kernel vs the Python path: byte-identical on ASCII."""

import numpy as np
import pytest

from pytextgcn_tpu.build.stopwords import get_stopwords
from pytextgcn_tpu.build.vectorizer import CountVectorizer

CORPUS = [
    "The quick brown fox jumps over the lazy dog!",
    "Never jump over the lazy dog quickly... the fox is quick.",
    "Foxes are quick; dogs are lazy. A dog's day, isn't it?",
    "pack my box with five dozen liquor jugs",
    "the five boxing wizards jump quickly",
    "dog dog dog quick quick fox under_scores and 123numbers mix3d",
    "",
]


@pytest.mark.parametrize("min_df,max_df", [(1, 1.0), (2, 1.0), (1, 0.5)])
def test_native_matches_python(min_df, max_df):
    stop = get_stopwords("nltk")
    nat = CountVectorizer(min_df=min_df, max_df=max_df, stop_words=stop, native=True)
    c_nat = nat.fit_transform(CORPUS)
    py = CountVectorizer(min_df=min_df, max_df=max_df, stop_words=stop, native=False)
    c_py = py.fit_transform(CORPUS)
    assert nat.vocabulary_ == py.vocabulary_
    np.testing.assert_array_equal(c_nat.toarray(), c_py.toarray())


def test_native_encode_matches_python():
    stop = get_stopwords("nltk")
    nat = CountVectorizer(min_df=1, stop_words=stop, native=True)
    nat.fit_transform(CORPUS)
    enc_nat = nat.encode_documents(CORPUS)
    enc_nat_cap = nat.encode_documents(CORPUS, max_length=3)

    py = CountVectorizer(min_df=1, stop_words=stop, native=False)
    py.fit_transform(CORPUS)
    enc_py = py.encode_documents(CORPUS)
    enc_py_cap = py.encode_documents(CORPUS, max_length=3)

    np.testing.assert_array_equal(enc_nat, enc_py)
    np.testing.assert_array_equal(enc_nat_cap, enc_py_cap)


def test_non_ascii_falls_back_to_python():
    docs = ["héllo wörld words here", "plain ascii words here words"]
    cv = CountVectorizer(min_df=1, native="auto")
    counts = cv.fit_transform(docs)
    assert cv._native_docs is None  # python path taken
    assert counts.shape[0] == 2
    # unicode word chars are tokenized per Python \w semantics
    assert "héllo" in cv.vocabulary_ and "wörld" in cv.vocabulary_


def test_native_speedup_sanity():
    """Native path should not be slower on a moderately sized corpus."""
    import time

    from pytextgcn_tpu.data import synthetic_corpus

    docs, _ = synthetic_corpus(n_docs=800, n_classes=4, doc_len=(40, 120), seed=1)
    t0 = time.time()
    CountVectorizer(min_df=1, native=True).fit_transform(docs)
    t_nat = time.time() - t0
    t0 = time.time()
    CountVectorizer(min_df=1, native=False).fit_transform(docs)
    t_py = time.time() - t0
    assert t_nat < t_py * 1.5, (t_nat, t_py)

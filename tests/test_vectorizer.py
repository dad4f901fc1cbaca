"""Parity tests of our vectorizer against sklearn (which the reference uses
at text2graph.py:130-131,145 — edge-weight parity depends on exact
CountVectorizer/TfidfTransformer semantics)."""

import numpy as np
import pytest

from pytextgcn_tpu.build.stopwords import NLTK_ENGLISH_STOPWORDS, get_stopwords
from pytextgcn_tpu.build.vectorizer import CountVectorizer, TfidfTransform, tokenize

CORPUS = [
    "The quick brown fox jumps over the lazy dog!",
    "Never jump over the lazy dog quickly... the fox is quick.",
    "Foxes are quick; dogs are lazy. A dog's day, isn't it?",
    "pack my box with five dozen liquor jugs",
    "the five boxing wizards jump quickly",
    "dog dog dog quick quick fox",
]


@pytest.mark.parametrize("min_df,max_df", [(1, 1.0), (2, 1.0), (1, 0.5), (2, 0.7)])
def test_counts_match_sklearn(min_df, max_df):
    from sklearn.feature_extraction.text import CountVectorizer as SkCV

    stop = get_stopwords("nltk")
    ours = CountVectorizer(min_df=min_df, max_df=max_df, stop_words=stop)
    got = ours.fit_transform(CORPUS)
    ref_cv = SkCV(stop_words=list(stop), min_df=min_df, max_df=max_df)
    ref = ref_cv.fit_transform(CORPUS)
    assert ours.vocabulary_ == {k: int(v) for k, v in ref_cv.vocabulary_.items()}
    np.testing.assert_array_equal(got.toarray(), ref.toarray())


def test_tfidf_matches_sklearn():
    from sklearn.feature_extraction.text import CountVectorizer as SkCV
    from sklearn.feature_extraction.text import TfidfTransformer as SkTfidf

    ours_cv = CountVectorizer(min_df=1, max_df=1.0)
    counts = ours_cv.fit_transform(CORPUS)
    got = TfidfTransform().fit_transform(counts)
    ref = SkTfidf().fit_transform(SkCV().fit_transform(CORPUS))
    np.testing.assert_allclose(got.toarray(), ref.toarray(), rtol=1e-12)


def test_encode_documents_reference_semantics():
    """encode uses \\w+ tokens filtered by vocab membership and pads with -1
    (text2graph.py:20-46)."""
    cv = CountVectorizer(min_df=1, stop_words=NLTK_ENGLISH_STOPWORDS)
    cv.fit_transform(["aa bb cc", "bb cc dd i"])
    X = cv.encode_documents(["aa bb cc", "bb cc dd i"])
    v = cv.vocabulary_
    assert X.shape == (2, 3)
    np.testing.assert_array_equal(X[0], [v["aa"], v["bb"], v["cc"]])
    np.testing.assert_array_equal(X[1], [v["bb"], v["cc"], v["dd"]])  # 'i' is a stopword+1-char

    X2 = cv.encode_documents(["aa bb cc", "bb cc dd i"], max_length=2)
    assert X2.shape == (2, 2)


def test_tokenize_matches_nltk_regexp():
    import nltk

    tok = nltk.RegexpTokenizer(r"\w+")
    for doc in CORPUS:
        assert tokenize(doc) == [t.lower() for t in tok.tokenize(doc)]


def test_stopword_list_is_nltk_size():
    assert len(NLTK_ENGLISH_STOPWORDS) == 179


def test_encode_documents_respects_lowercase_off_fallback():
    # the encode fallback (docs not the fit-time list object) must honor
    # lowercase=False — case-sensitive vocabularies were silently mangled
    from pytextgcn_tpu.build.vectorizer import CountVectorizer

    corpus = ["Foo Foo Bar baz", "Foo qux qux qux"]
    cv = CountVectorizer(lowercase=False, min_df=1, native=False)
    cv.fit_transform(corpus)
    same = cv.encode_documents(corpus)              # cached fast path
    other = cv.encode_documents(list(corpus))       # content-equal copy
    np.testing.assert_array_equal(same, other)
    assert (other >= 0).sum() == 8  # every token is in the vocabulary


def test_encode_max_length_zero_agrees_across_backends():
    # max_length=0 must mean 'truncate to zero tokens' on BOTH paths
    from pytextgcn_tpu.build.vectorizer import CountVectorizer

    corpus = ["alpha beta gamma", "beta beta delta"]
    cv_py = CountVectorizer(min_df=1, native=False)
    cv_py.fit_transform(corpus)
    assert cv_py.encode_documents(corpus, max_length=0).shape == (2, 0)
    try:
        cv_nat = CountVectorizer(min_df=1, native=True)
        cv_nat.fit_transform(corpus)
    except Exception:
        pytest.skip("native toolchain unavailable")
    assert cv_nat.encode_documents(corpus, max_length=0).shape == (2, 0)

"""TF-IDF + MLP baseline pipelines (flat / per-level / per-label)."""

import numpy as np
import pytest

from pytextgcn_tpu.baselines import (
    append_onehot_feats,
    fit_tfidf_splits,
    mlp_flat,
    mlp_per_label,
    mlp_per_level,
)
from pytextgcn_tpu.data import synthetic_corpus

FAST = dict(hidden=(32,), epochs=60, early_stopping=False)


@pytest.fixture(scope="module")
def splits():
    docs, child, parent = synthetic_corpus(n_docs=220, n_classes=4, n_parents=2, seed=5)
    rng = np.random.default_rng(0)
    n = len(docs)
    idx = rng.permutation(n)
    tr, va, te = idx[: int(0.6 * n)], idx[int(0.6 * n) : int(0.8 * n)], idx[int(0.8 * n) :]
    child, parent = np.asarray(child), np.asarray(parent)
    return fit_tfidf_splits(
        [docs[i] for i in tr], [docs[i] for i in va], [docs[i] for i in te],
        [parent[tr], child[tr]], [parent[va], child[va]], [parent[te], child[te]],
    )


def test_tfidf_fit_on_train_only(splits):
    # val/test share train's vocabulary width
    assert splits.x_train.shape[1] == splits.x_val.shape[1] == splits.x_test.shape[1]


def test_append_onehot(splits):
    y = splits.y_train[0]
    x2 = append_onehot_feats(splits.x_train, y, 2)
    assert x2.shape == (splits.x_train.shape[0], splits.x_train.shape[1] + 2)
    np.testing.assert_array_equal(
        np.asarray(x2[:, -2:].todense()).argmax(axis=1).ravel(), y
    )


def test_mlp_flat(splits):
    res = mlp_flat(splits, level=1, **FAST)
    assert res["accuracy"] >= 0.7, res


def test_mlp_per_level(splits):
    results = mlp_per_level(splits, **FAST)
    assert len(results) == 2
    assert results[-1]["accuracy"] >= 0.6, results[-1]


def test_mlp_per_label(splits):
    results = mlp_per_label(splits, **FAST)
    assert len(results) == 2
    assert results[-1]["accuracy"] >= 0.55, results[-1]

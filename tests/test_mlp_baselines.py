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


def test_train_mlp_device_loop_matches_python_loop(splits, capsys):
    # verbose=0 runs the whole epoch loop (incl. early stopping) on device in
    # one lax.while_loop; verbose>0 uses a python loop with the same fold_in
    # RNG stream — both must produce the identical run
    from pytextgcn_tpu.baselines.mlp_pipeline import train_mlp

    n_classes = int(np.max(splits.y_train[1])) + 1
    kw = dict(
        n_classes=n_classes, hidden=(16,), epochs=40, early_stopping=True,
        patience=5, min_epochs=10, seed=3,
    )
    args = (splits.x_train, splits.y_train[1], splits.x_val, splits.y_val[1])
    _, p_dev, h_dev = train_mlp(*args, **kw)
    _, p_py, h_py = train_mlp(*args, verbose=1, **kw)
    capsys.readouterr()
    assert len(h_dev) == len(h_py)
    np.testing.assert_allclose(np.asarray(h_dev), np.asarray(h_py), rtol=2e-4, atol=1e-5)
    for a, b in zip(
        __import__("jax").tree_util.tree_leaves(p_dev),
        __import__("jax").tree_util.tree_leaves(p_py),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_mlp_per_label(splits):
    results = mlp_per_label(splits, **FAST)
    assert len(results) == 2
    assert results[-1]["accuracy"] >= 0.55, results[-1]


def test_train_mlp_short_run_with_early_stopping(splits):
    # regression: the jitted ES window (patience+1 wide) must stay in
    # bounds when epochs <= patience
    from pytextgcn_tpu.baselines.mlp_pipeline import train_mlp

    n_classes = int(np.max(splits.y_train[1])) + 1
    _, _, hist = train_mlp(
        splits.x_train, splits.y_train[1], splits.x_val, splits.y_val[1],
        n_classes=n_classes, hidden=(16,), epochs=5, early_stopping=True,
        patience=10, verbose=0, seed=1,
    )
    assert len(hist) == 5


def test_load_corpus_honors_requested_level_count():
    # regression: synthetic-dbpedia has 3 label levels; a 2-level request
    # must return exactly 2 (top-down), not all 3
    import experiments.common as common
    from pytextgcn_tpu.config import ExperimentConfig

    cfg = ExperimentConfig()
    cfg.dataset = "synthetic-dbpedia"
    cfg.n_docs = 600
    docs, labels, test_idx, val_idx = common.load_corpus(cfg, levels=["l1", "l2"])
    assert len(labels) == 2
    # top-down: the first level is the coarsest (fewest classes)
    assert len(np.unique(labels[0])) < len(np.unique(labels[1]))

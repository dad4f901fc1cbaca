"""Data-parallel MLP training (train_mlp(mesh=...)): doc-sharded CE-sum
backprop + psum'd gradients must equal the replicated full-batch run."""

import jax
import numpy as np
import pytest

from pytextgcn_tpu.baselines import fit_tfidf_splits
from pytextgcn_tpu.baselines.mlp_pipeline import train_mlp
from pytextgcn_tpu.data import synthetic_corpus
from pytextgcn_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def splits():
    docs, labels = synthetic_corpus(n_docs=190, n_classes=3, seed=17)
    labels = np.asarray(labels)
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(docs))
    tr, va, te = idx[:120], idx[120:160], idx[160:]
    return fit_tfidf_splits(
        [docs[i] for i in tr], [docs[i] for i in va], [docs[i] for i in te],
        [labels[tr]], [labels[va]], [labels[te]],
    )


@pytest.mark.parametrize("n_dev", [2, 4])
def test_dp_matches_single_device(splits, n_dev):
    kw = dict(
        n_classes=3, hidden=(16,), epochs=30, early_stopping=False,
        dropout=0.0, seed=9,  # dropout off: DP shards have different shapes,
        # so per-shard masks could not match the replicated ones
    )
    args = (splits.x_train, splits.y_train[0], splits.x_val, splits.y_val[0])
    _, p_ref, h_ref = train_mlp(*args, **kw)
    mesh = make_mesh(n_dev, axis="data")
    _, p_dp, h_dp = train_mlp(*args, mesh=mesh, **kw)

    assert len(h_ref) == len(h_dp)
    np.testing.assert_allclose(
        np.asarray(h_ref), np.asarray(h_dp), rtol=2e-4, atol=2e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_dp_with_dropout_trains(splits):
    # with dropout the shard masks differ by construction; check it learns
    mesh = make_mesh(2, axis="data")
    _, params, hist = train_mlp(
        splits.x_train, splits.y_train[0], splits.x_val, splits.y_val[0],
        n_classes=3, hidden=(32,), epochs=60, early_stopping=False,
        dropout=0.3, seed=1, mesh=mesh,
    )
    assert hist[-1][1] >= 0.8, hist[-1]  # val macro-F1

"""On-device metrics vs sklearn (which the reference uses for all reported
numbers, flat_amazon.py:9,111-139)."""

import numpy as np
import jax.numpy as jnp
from sklearn.metrics import accuracy_score, confusion_matrix as sk_confusion, f1_score

from pytextgcn_tpu.train.metrics import (
    accuracy,
    confusion_matrix,
    macro_f1,
    masked_cross_entropy,
)


def test_metrics_match_sklearn():
    rng = np.random.default_rng(0)
    n, c = 500, 7
    y = rng.integers(0, c, n)
    pred = rng.integers(0, c, n)
    mask = rng.random(n) < 0.6

    acc = float(accuracy(jnp.asarray(pred), jnp.asarray(y), jnp.asarray(mask)))
    np.testing.assert_allclose(acc, accuracy_score(y[mask], pred[mask]), rtol=1e-6)

    f1 = float(macro_f1(jnp.asarray(pred), jnp.asarray(y), jnp.asarray(mask), c))
    np.testing.assert_allclose(f1, f1_score(y[mask], pred[mask], average="macro"), rtol=1e-6)

    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(y), jnp.asarray(mask), c))
    np.testing.assert_array_equal(cm, sk_confusion(y[mask], pred[mask], labels=np.arange(c)))


def test_macro_f1_absent_classes():
    """sklearn averages only over labels present in y_true or y_pred."""
    y = np.array([0, 0, 1, 1])
    pred = np.array([0, 1, 1, 3])  # class 2 absent everywhere, 3 only predicted
    mask = np.ones(4, bool)
    f1 = float(macro_f1(jnp.asarray(pred), jnp.asarray(y), jnp.asarray(mask), 5))
    ref = f1_score(y, pred, average="macro")
    np.testing.assert_allclose(f1, ref, rtol=1e-6)


def test_masked_cross_entropy_matches_torch_semantics():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((10, 4)).astype(np.float32)
    y = rng.integers(0, 4, 10)
    mask = rng.random(10) < 0.5
    got = float(
        masked_cross_entropy(jnp.asarray(logits), jnp.asarray(y), jnp.asarray(mask))
    )
    # manual mean CE over masked rows
    z = logits - logits.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    want = -logp[np.arange(10), y][mask].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)

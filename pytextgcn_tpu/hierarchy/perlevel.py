"""Per-level hierarchical cascade.

Reproduces the reference's per-level scheme (perlevel_amazon.py /
perlevel_dbpedia.py, SURVEY.md §3.5): train level 1 on the coarsest labels;
each deeper level's graph carries the *ground-truth one-hot* of the previous
level as extra document features during training, and the previous level's
*predicted softmax* at test time.

Key structural win over the reference: because edges and features are
decoupled here (ops/features.py), "rebuilding the graph with different
hierarchy features" (perlevel_amazon.py:121-122,156 — a full corpus re-pass
through the Cython kernel per level and again per evaluation) is a
``dataclasses.replace`` on the feature field. The expensive counting runs
exactly once per corpus.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.graph import TextGraph
from ..train.trainer import Trainer


def one_hot_np(labels: np.ndarray, n_classes: Optional[int] = None) -> np.ndarray:
    labels = np.asarray(labels, np.int64)
    n = int(labels.max()) + 1 if n_classes is None else n_classes
    out = np.zeros((labels.shape[0], n), np.float32)
    out[np.arange(labels.shape[0]), labels] = 1.0
    return out


def _with_labels_and_feats(g: TextGraph, y_docs, hierarchy_feats) -> TextGraph:
    y_nodes = np.zeros(g.n_nodes, np.int32)
    y_nodes[g.n_vocab :] = np.asarray(y_docs, np.int32)
    return dataclasses.replace(
        g,
        y=y_nodes,
        hierarchy_feats=None
        if hierarchy_feats is None
        else np.asarray(hierarchy_feats, np.float32),
    )


def train_per_level(
    g: TextGraph,
    level_labels: Sequence[np.ndarray],
    model_factory: Callable[[int, int], object],
    lr: float = 0.05,
    epochs: int = 500,
    seed: int = 42,
    verbose: int = 0,
    trainer_kwargs: Optional[dict] = None,
):
    """Run the cascade over ``level_labels`` (coarsest first; each entry is
    the per-document integer labels of that level).

    model_factory(in_dim, out_dim) -> model. Returns a dict with the final
    test metrics, per-level trainers, and per-level histories.

    Reference-exact hand-offs: level k >= 2 trains with the GT one-hot of
    level k-1 (perlevel_dbpedia.py:140) and is finally evaluated with the
    softmax predictions of the level k-1 model *as computed on its own
    GT-fed graph* (perlevel_dbpedia.py:173-175,224-227 — the softmax at
    level k-1 is produced while that level still sees GT features of level
    k-2; only the last level swaps in predictions).
    """
    trainer_kwargs = dict(trainer_kwargs or {})
    # the reference's per-level drivers train with PLAIN Adam — only the
    # flat drivers pass amsgrad=True (perlevel_amazon.py:84,129,
    # perlevel_dbpedia.py:104 vs flat_amazon.py:89)
    trainer_kwargs.setdefault("optimizer", "adam")
    trainers: List[Trainer] = []
    histories = []
    hierarchy_gt = None  # GT one-hot of previous level
    hierarchy_pred = None  # softmax predictions of previous level

    for lvl, y in enumerate(level_labels):
        y = np.asarray(y)
        n_classes = int(y.max()) + 1
        g_lvl = _with_labels_and_feats(g, y, hierarchy_gt)
        model = model_factory(g_lvl.in_dim, n_classes)
        trainer = Trainer(model, lr=lr, seed=seed + lvl, **trainer_kwargs)
        if trainers:
            # levels swap labels/features only; the operator is shared
            trainer.share_adjacency(trainers[0])
        hist = trainer.fit(g_lvl, epochs=epochs, n_classes=n_classes, verbose=verbose)
        trainers.append(trainer)
        histories.append(hist)

        # softmax hand-off over document nodes (perlevel_amazon.py:109-110)
        logits = trainer.predict_logits(g_lvl)
        hierarchy_pred = np.asarray(jax.nn.softmax(logits[g.n_vocab :], axis=-1))
        hierarchy_gt = one_hot_np(y, n_classes)

    # final evaluation: last level with the previous level's predictions
    y_last = np.asarray(level_labels[-1])
    n_last = int(y_last.max()) + 1
    if len(level_labels) >= 2:
        prev = trainers[-2]
        y_prev = np.asarray(level_labels[-2])
        g_prev = _with_labels_and_feats(
            g, y_prev, one_hot_np(level_labels[-3], None) if len(level_labels) >= 3 else None
        )
        logits_prev = prev.predict_logits(g_prev)
        pred_feats = np.asarray(jax.nn.softmax(logits_prev[g.n_vocab :], axis=-1))
        g_eval = _with_labels_and_feats(g, y_last, pred_feats)
    else:
        g_eval = _with_labels_and_feats(g, y_last, None)
    metrics = trainers[-1].evaluate(g_eval, n_classes=n_last)
    return {"metrics": metrics, "trainers": trainers, "histories": histories}

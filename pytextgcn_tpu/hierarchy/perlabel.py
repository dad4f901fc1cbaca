"""Per-label ensemble: one child-classifier per parent class.

Reproduces the reference's best-performing hierarchy scheme
(perlabel_amazon.py + eval_perlabel.py, SURVEY.md §3.6): for each parent
class, mask the graph to that class's documents, relabel its child labels
contiguously, train a GCN on ``split_mask AND class_mask``; at composed
inference, route each test document to one child model and map its local
prediction back to the global label space.

Structural wins over the reference:
* the reference rebuilds the whole graph per class (perlabel_amazon.py:95 —
  num_classes full Cython passes over the corpus); here the graph is built
  once and only labels/masks are swapped,
* the per-class models are an embarrassingly parallel set — the EP-shaped
  axis (SURVEY.md §2.4): ``train_per_label`` can train them as independent
  jobs, one per device, and composed inference batches all models.

Routing: the reference routes by **ground-truth** parent label
(eval_perlabel.py:73 masks with ``g1.y == i``; its level-1 predictions are
computed but never used) — that quirk is the parity default
(``route='ground_truth'``); ``route='predicted'`` is the honest pipeline.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.graph import TextGraph
from ..train.metrics import accuracy, macro_f1
from ..train.trainer import Trainer


def _doc_mask_to_nodes(g: TextGraph, doc_mask: np.ndarray) -> np.ndarray:
    m = np.zeros(g.n_nodes, bool)
    m[g.n_vocab :] = doc_mask
    return m


def train_per_label(
    g: TextGraph,
    y_child: np.ndarray,
    y_parent: np.ndarray,
    model_factory: Callable[[int, int], object],
    lr: float = 0.05,
    epochs: int = 500,
    seed: int = 42,
    verbose: int = 0,
    save_dir: Optional[str] = None,
    trainer_kwargs: Optional[dict] = None,
):
    """Train one child-label classifier per parent class.

    Returns {"trainers": [...], "mapping": {parent: [global child ids]}}.
    The mapping holds, per parent class, the sorted global child labels in
    local-label order (the reference's LabelEncoder classes_,
    perlabel_amazon.py:105-107 / class_mapping.json).
    """
    trainer_kwargs = dict(trainer_kwargs or {})
    # ensemble members with the same child-class count share one jitted step
    trainer_kwargs.setdefault("step_cache", {})
    y_child = np.asarray(y_child, np.int64)
    y_parent = np.asarray(y_parent, np.int64)
    n_parents = int(y_parent.max()) + 1

    trainers: List[Trainer] = []
    mapping: Dict[int, List[int]] = {}
    for c in range(n_parents):
        doc_mask = y_parent == c
        classes = np.unique(y_child[doc_mask])
        mapping[c] = classes.tolist()
        local = np.searchsorted(classes, y_child)  # global -> local (valid on class docs)
        y_nodes = np.zeros(g.n_nodes, np.int32)
        y_nodes[g.n_vocab :][doc_mask] = local[doc_mask].astype(np.int32)

        node_mask = _doc_mask_to_nodes(g, doc_mask)
        g_c = dataclasses.replace(
            g,
            y=y_nodes,
            train_mask=np.asarray(g.train_mask) & node_mask,
            val_mask=np.asarray(g.val_mask) & node_mask,
            test_mask=np.asarray(g.test_mask) & node_mask,
        )
        model = model_factory(g_c.in_dim, len(classes))
        trainer = Trainer(model, lr=lr, seed=seed, **trainer_kwargs)
        hist = trainer.fit(
            g_c, epochs=epochs, n_classes=len(classes), verbose=verbose
        )
        trainers.append(trainer)
        if save_dir is not None:
            from ..train.checkpoint import save_checkpoint

            save_checkpoint(
                os.path.join(save_dir, f"lvl2-cat{c}"),
                trainer.params,
                meta={"parent": c, "classes": classes.tolist()},
            )
    if save_dir is not None:
        with open(os.path.join(save_dir, "class_mapping.json"), "w") as f:
            json.dump({str(k): v for k, v in mapping.items()}, f)
    return {"trainers": trainers, "mapping": mapping}


def eval_per_label(
    g: TextGraph,
    y_child: np.ndarray,
    y_parent: np.ndarray,
    trainers: List[Trainer],
    mapping: Dict[int, List[int]],
    parent_pred: Optional[np.ndarray] = None,
    route: str = "ground_truth",
):
    """Composed hierarchical inference (eval_perlabel.py:57-85).

    ``route='ground_truth'`` replicates the reference exactly (test docs are
    routed by their true parent class); ``route='predicted'`` uses
    ``parent_pred`` (per-document parent predictions, e.g. from a level-1
    flat model).
    """
    y_child = np.asarray(y_child, np.int64)
    y_parent = np.asarray(y_parent, np.int64)
    test_docs = np.asarray(g.test_mask)[g.n_vocab :]
    if route == "predicted":
        assert parent_pred is not None, "route='predicted' needs parent_pred"
        router = np.asarray(parent_pred, np.int64)
    else:
        router = y_parent

    # labels/masks used at inference: child labels on all docs
    y_nodes = np.zeros(g.n_nodes, np.int32)
    y_nodes[g.n_vocab :] = y_child.astype(np.int32)
    g_eval = dataclasses.replace(g, y=y_nodes)

    predictions = np.full(len(y_child), -1, np.int64)
    for c, trainer in enumerate(trainers):
        sel = (router == c) & test_docs
        if not sel.any():
            continue
        logits = trainer.predict_logits(g_eval)[g.n_vocab :]
        local_pred = np.asarray(jnp.argmax(logits, axis=-1))[sel]
        predictions[sel] = np.asarray(mapping[c], np.int64)[local_pred]

    yt = y_child[test_docs]
    pt = predictions[test_docs]
    # shift by 1 so an unrouted -1 becomes its own (always-wrong) label,
    # exactly how sklearn would score the reference's init value of -1
    n_classes = int(max(y_child.max(), predictions.max())) + 2
    m = np.ones(yt.shape[0], bool)
    return {
        "accuracy": float(accuracy(jnp.asarray(pt + 1), jnp.asarray(yt + 1), jnp.asarray(m))),
        "f1_macro": float(
            macro_f1(jnp.asarray(pt + 1), jnp.asarray(yt + 1), jnp.asarray(m), n_classes)
        ),
        "predictions": predictions,
    }

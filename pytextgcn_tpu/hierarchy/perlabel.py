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


_PAD_BIAS = -1e9  # padded class logits: exp() underflows to exactly 0 in f32,
# so padded columns get exactly-zero gradients and never win an argmax — a
# C_max-padded member trains bit-identically to its unpadded C_i-class self


def _member_label_arrays(g: TextGraph, y_child, y_parent, n_parents):
    """Per-parent (classes, node labels, node mask) exactly as the sequential
    path builds them (contiguous relabel per perlabel_amazon.py:93-110)."""
    out = []
    for c in range(n_parents):
        doc_mask = y_parent == c
        classes = np.unique(y_child[doc_mask])
        local = np.searchsorted(classes, y_child)
        y_nodes = np.zeros(g.n_nodes, np.int32)
        y_nodes[g.n_vocab :][doc_mask] = local[doc_mask].astype(np.int32)
        out.append((classes, y_nodes, _doc_mask_to_nodes(g, doc_mask)))
    return out


def _pad_member_params(params, c: int, c_max: int):
    """Zero-pad the final layer's weight columns and ``_PAD_BIAS``-pad its
    bias from ``c`` to ``c_max`` classes (host-side numpy)."""
    params = jax.tree.map(np.asarray, params)
    if c == c_max:
        return params
    last = dict(params["layers"][-1])
    w, b = last["w"], last["b"]
    last["w"] = np.concatenate([w, np.zeros((w.shape[0], c_max - c), w.dtype)], axis=1)
    last["b"] = np.concatenate([b, np.full(c_max - c, _PAD_BIAS, b.dtype)])
    out = dict(params)
    out["layers"] = list(params["layers"][:-1]) + [last]
    return out


def _truncate_member_params(params, c: int):
    """Inverse of :func:`_pad_member_params` for one stacked member."""
    params = jax.tree.map(np.asarray, params)
    last = dict(params["layers"][-1])
    last["w"] = last["w"][:, :c]
    last["b"] = last["b"][:c]
    out = dict(params)
    out["layers"] = list(params["layers"][:-1]) + [last]
    return out


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
    mesh=None,
):
    """Train one child-label classifier per parent class.

    Returns {"trainers": [...], "mapping": {parent: [global child ids]}}.
    The mapping holds, per parent class, the sorted global child labels in
    local-label order (the reference's LabelEncoder classes_,
    perlabel_amazon.py:105-107 / class_mapping.json).

    ``mesh``: a 1D `jax.sharding.Mesh` — the ensemble then trains
    **expert-parallel**: all members step together in one vmapped jitted
    train step with parameters/labels/masks sharded over the mesh axis
    (ragged child-class counts padded to the max; padded logits carry a
    ``-1e9`` bias so they get exactly-zero gradients and the padded run is
    bit-equivalent to the sequential one). The reference trains its 6
    per-label GCNs strictly sequentially (perlabel_amazon.py:90-155).
    """
    if mesh is not None:
        return _train_per_label_ep(
            g, y_child, y_parent, model_factory, mesh,
            lr=lr, epochs=epochs, seed=seed, verbose=verbose, save_dir=save_dir,
            trainer_kwargs=trainer_kwargs,
        )
    trainer_kwargs = dict(trainer_kwargs or {})
    # ensemble members with the same child-class count share one jitted step
    trainer_kwargs.setdefault("step_cache", {})
    # the reference's per-label driver trains with PLAIN Adam, not amsgrad
    # (perlabel_amazon.py:124 vs flat_amazon.py:89)
    trainer_kwargs.setdefault("optimizer", "adam")
    y_child = np.asarray(y_child, np.int64)
    y_parent = np.asarray(y_parent, np.int64)
    n_parents = int(y_parent.max()) + 1

    trainers: List[Trainer] = []
    mapping: Dict[int, List[int]] = {}
    members = _member_label_arrays(g, y_child, y_parent, n_parents)
    for c, (classes, y_nodes, node_mask) in enumerate(members):
        mapping[c] = classes.tolist()
        g_c = dataclasses.replace(
            g,
            y=y_nodes,
            train_mask=np.asarray(g.train_mask) & node_mask,
            val_mask=np.asarray(g.val_mask) & node_mask,
            test_mask=np.asarray(g.test_mask) & node_mask,
        )
        model = model_factory(g_c.in_dim, len(classes))
        trainer = Trainer(model, lr=lr, seed=seed, **trainer_kwargs)
        if trainers:
            # members differ only in labels/masks — the normalized adjacency
            # (+ hybrid/Pallas plans) is identical, build it once
            trainer.share_adjacency(trainers[0])
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


def _train_per_label_ep(
    g: TextGraph,
    y_child: np.ndarray,
    y_parent: np.ndarray,
    model_factory: Callable[[int, int], object],
    mesh,
    *,
    lr: float,
    epochs: int,
    seed: int,
    verbose: int,
    save_dir: Optional[str],
    trainer_kwargs: Optional[dict],
):
    """Expert-parallel ensemble training: one vmapped train step for ALL
    members, parameters/labels/masks sharded over the mesh axis.

    Bit-equivalence with the sequential path: every member is initialized
    exactly as its sequential Trainer would be (same seed -> same init key,
    member-local shapes), then padded to ``C_max`` (zero weight columns,
    ``-1e9`` bias). The padded logits underflow to probability 0, so their
    gradients are exactly zero and the vmapped run computes the same
    parameter trajectory as ``mesh=None`` (cf. test_perlabel_ep.py).
    """
    import optax
    from jax.sharding import PartitionSpec as P

    from ..ops.adjacency import NormAdj
    from ..ops.features import NodeFeatures
    from ..parallel.sharded import put_global
    from ..train.metrics import masked_cross_entropy

    trainer_kwargs = dict(trainer_kwargs or {})
    use_pallas = bool(trainer_kwargs.pop("use_pallas", False))
    # honor a caller-supplied update rule (it stays in trainer_kwargs too,
    # so the returned Trainers refit with the same rule they trained under);
    # default = plain Adam, the reference per-label driver's optimizer
    # (perlabel_amazon.py:124) — same default as the sequential path above
    trainer_kwargs.setdefault("optimizer", "adam")
    optimizer = trainer_kwargs.get("optimizer")
    # the hybrid decomposition composes with the vmapped EP step: the dense
    # hot products batch into one dot_general per layer across all members,
    # and the cold residual rides the (vmappable) segment path
    hybrid_k = trainer_kwargs.get("hybrid_k")
    pallas_dtype = trainer_kwargs.get("pallas_dtype", "float32")
    y_child = np.asarray(y_child, np.int64)
    y_parent = np.asarray(y_parent, np.int64)
    n_parents = int(y_parent.max()) + 1
    members = _member_label_arrays(g, y_child, y_parent, n_parents)
    mapping = {c: cls.tolist() for c, (cls, _, _) in enumerate(members)}
    c_list = [len(cls) for cls, _, _ in members]
    c_max = max(c_list)

    axis = mesh.axis_names[0]
    m_pad = -(-n_parents // mesh.shape[axis]) * mesh.shape[axis]

    key = jax.random.PRNGKey(seed)
    key, init_key, base_key = jax.random.split(key, 3)
    base_key = jax.random.fold_in(base_key, 1)  # sequential Trainers fit once

    models = [model_factory(g.in_dim, c) for c in c_list]
    padded = [
        _pad_member_params(m.init(init_key), c, c_max)
        for m, c in zip(models, c_list)
    ]
    train_masks = [np.asarray(g.train_mask) & nm for _, _, nm in members]
    y_rows = [y for _, y, _ in members]
    while len(padded) < m_pad:  # dummy members: all-false mask -> zero loss
        padded.append(padded[0])
        train_masks.append(np.zeros(g.n_nodes, bool))
        y_rows.append(np.zeros(g.n_nodes, np.int32))

    shard = lambda a: put_global(mesh, P(axis), np.asarray(a))
    stacked = jax.tree.map(lambda *xs: shard(np.stack(xs)), *padded)
    y_dev = shard(np.stack(y_rows))
    mask_dev = shard(np.stack(train_masks))

    # the aggregation itself is replicated (each expert owns its own SpMM);
    # the EP axis shards *models*, not the graph — SURVEY.md §2.4 EP row
    adj = NormAdj.from_graph(
        g, use_pallas=use_pallas, hybrid_k=hybrid_k,
        pallas_dtype=pallas_dtype, hybrid_resid="segment",
        # all members apply the same adjacency in one vmapped step: the
        # batched dense half streams D once per *device* — members are
        # sharded over the mesh axis (and dummy pad members execute too),
        # so the amortization the cost model should price is the padded
        # per-device member count, not the global ensemble size
        hybrid_batch=m_pad // mesh.shape[axis],
    )
    if adj.plan is not None and not use_pallas:
        from ..ops.hybrid import HybridPlan

        if not isinstance(adj.plan, HybridPlan):
            # hybrid_k='auto' declined the hot set and from_graph fell back
            # to a pure Pallas plan; the vmapped step prefers the segment
            # path there (the batched tile kernel buys nothing per member)
            adj = dataclasses.replace(adj, plan=None)
    feats = NodeFeatures.from_graph(g)
    model_pad = models[int(np.argmax(c_list))]  # apply() reads shapes from params

    from ..train.optim import resolve_optimizer

    opt = resolve_optimizer(optimizer, lr)
    opt_state = jax.jit(jax.vmap(opt.init))(stacked)

    @jax.jit
    def ep_step(stacked, opt_state, base_key, epoch, adj, feats, y_s, m_s):
        rng = jax.random.fold_in(base_key, epoch)

        def one(p, y, mask):
            def loss_fn(p_):
                logits = model_pad.apply(p_, adj, feats, train=True, rng=rng)
                return masked_cross_entropy(logits, y, mask)

            return jax.value_and_grad(loss_fn)(p)

        losses, grads = jax.vmap(one)(stacked, y_s, m_s)

        def upd(p, g_, s):
            u, s2 = opt.update(g_, s, p)
            return optax.apply_updates(p, u), s2

        stacked, opt_state = jax.vmap(upd)(stacked, grads, opt_state)
        return stacked, opt_state, epoch + 1, losses

    epoch_dev = jnp.zeros((), jnp.int32)
    losses = None
    for epoch in range(epochs):
        stacked, opt_state, epoch_dev, losses = ep_step(
            stacked, opt_state, base_key, epoch_dev, adj, feats, y_dev, mask_dev
        )
        if verbose > 0 and (epoch + 1) % 50 == 0:
            print(f"[EP {epoch + 1}] member losses: {np.asarray(losses)[:n_parents]}")

    host = jax.device_get(stacked)
    opt_host = jax.device_get(opt_state)
    p_struct = jax.tree_util.tree_structure(jax.tree.map(lambda a: a[0], host))

    def _member_opt_state(i: int, c: int):
        """Slice member ``i`` out of the vmapped optimizer state and
        truncate its params-shaped moment buffers (mu/nu/nu_max mirror the
        padded param tree) to the member's real class count, so the
        returned Trainer can continue training where the EP step left off."""
        sliced = jax.tree.map(lambda a: a[i], opt_host)

        def params_like(x):
            return jax.tree_util.tree_structure(x) == p_struct

        return jax.tree_util.tree_map(
            lambda x: jax.tree.map(jnp.asarray, _truncate_member_params(x, c))
            if params_like(x)
            else x,
            sliced,
            is_leaf=params_like,
        )

    trainers: List[Trainer] = []
    for i, (model, c) in enumerate(zip(models, c_list)):
        member = jax.tree.map(lambda a: a[i], host)
        t = Trainer(model, lr=lr, seed=seed, use_pallas=use_pallas, **trainer_kwargs)
        t.params = jax.tree.map(jnp.asarray, _truncate_member_params(member, c))
        t.opt_state = _member_opt_state(i, c)
        trainers.append(t)
        if save_dir is not None:
            from ..train.checkpoint import save_checkpoint

            save_checkpoint(
                os.path.join(save_dir, f"lvl2-cat{i}"),
                t.params,
                meta={"parent": i, "classes": mapping[i]},
            )
    if save_dir is not None:
        with open(os.path.join(save_dir, "class_mapping.json"), "w") as f:
            json.dump({str(k): v for k, v in mapping.items()}, f)
    return {"trainers": trainers, "mapping": mapping}


def _batched_member_preds(
    g_eval: TextGraph, trainers: List[Trainer], c_list: List[int]
) -> Optional[np.ndarray]:
    """One jitted pass computing every member's doc predictions: lax.map over
    C_max-padded stacked params (full [m, N, C] logits never materialize).
    Returns [m, n_docs] int32, or None if param structures don't stack."""
    defs = {jax.tree_util.tree_structure(t.params) for t in trainers}
    if len(defs) != 1:
        return None
    c_max = max(c_list)
    padded = [
        _pad_member_params(t.params, c, c_max) for t, c in zip(trainers, c_list)
    ]
    shapes = {
        tuple(np.shape(l) for l in jax.tree_util.tree_leaves(p)) for p in padded
    }
    if len(shapes) != 1:
        return None
    stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *padded)
    adj, feats = trainers[0].prepare(g_eval)
    model = trainers[0].model
    n_vocab = g_eval.n_vocab
    c_vec = jnp.asarray(c_list, jnp.int32)

    @jax.jit
    def all_preds(stacked, c_vec, adj, feats):
        def one(args):
            p, c = args
            logits = model.apply(p, adj, feats, train=False)[n_vocab:]
            col = jnp.arange(logits.shape[1], dtype=jnp.int32)[None, :]
            logits = jnp.where(col < c, logits, -jnp.inf)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        return jax.lax.map(one, (stacked, c_vec))

    return np.asarray(all_preds(stacked, c_vec, adj, feats))


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
    # all members' doc predictions in ONE jitted pass (the reference — and
    # round 1 — ran one full-graph forward per parent class); falls back to
    # the per-member loop only for heterogeneously-shaped ensembles
    c_list = [len(mapping[c]) for c in range(len(trainers))]
    preds_all = _batched_member_preds(g_eval, trainers, c_list)
    for c, trainer in enumerate(trainers):
        sel = (router == c) & test_docs
        if not sel.any():
            continue
        if preds_all is not None:
            local_pred = preds_all[c][sel]
        else:
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

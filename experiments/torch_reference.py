"""Independent torch implementation of the reference training protocols.

Cross-framework evidence for accuracy parity (VERDICT round 1, item 2): a
complete train loop in plain torch implementing exactly what the reference
runs — torch-geometric 1.6.3 ``GCNConv`` semantics (add self-loops w=1,
symmetric normalization, ``x @ W``, scatter-add over destinations, bias
after aggregation; /root/reference/textgcn/lib/models.py:6-25 and SURVEY.md
§3.3), **no inter-layer activation** (models.py:22), dropout between layers
(models.py:23), masked cross-entropy on the train nodes and
``Adam(lr, amsgrad=True)`` (flat_amazon.py:89,99-106). torch-geometric
itself is not installed here; the formulation is written from the documented
semantics with plain torch sparse ops, so it shares no code with either the
JAX stack or the numpy oracle in tests/test_gcn_parity.py.

Covers all three reference protocols:
  * flat (flat_amazon.py / flat_dbpedia.py)          — train_torch_reference
  * per-level cascade (perlevel_{amazon,dbpedia}.py) — train_torch_perlevel
  * per-label ensemble (perlabel_amazon.py
    + eval_perlabel.py's ground-truth routing)       — train_torch_perlabel

Run side by side with the JAX driver on the same graph via
experiments/protocol_parity.py. Only the graph and the split/relabel
bookkeeping are shared with the JAX side (both frameworks must see the
identical graph for the comparison to be controlled); every tensor op in
the model/training path below is independent torch.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np


def _normalized_adj(g, dtype):
    """``D^-1/2 (A + I) D^-1/2`` as a torch CSR tensor (row = destination)."""
    import torch

    n = g.n_nodes
    src = np.concatenate([np.asarray(g.edge_src, np.int64), np.arange(n)])
    dst = np.concatenate([np.asarray(g.edge_dst, np.int64), np.arange(n)])
    w = np.concatenate(
        [np.asarray(g.edge_w, np.float64), np.ones(n, np.float64)]
    )
    deg = np.zeros(n, np.float64)
    np.add.at(deg, dst, w)
    dinv = 1.0 / np.sqrt(deg)
    norm = dinv[src] * w * dinv[dst]
    a = torch.sparse_coo_tensor(
        torch.from_numpy(np.stack([dst, src])),
        torch.from_numpy(norm).to(dtype),
        (n, n),
    ).coalesce()
    return a.to_sparse_csr()


def train_torch_reference(
    g,
    n_classes: int,
    *,
    epochs: int = 500,
    lr: float = 0.05,
    dropout: float = 0.7,
    n_hidden: int = 100,
    seed: int = 42,
    verbose: int = 0,
    eval_every: int = 50,
    model: str = "gcn",
    embedding_dim: int = 2000,
    return_forward: bool = False,
    a_hat=None,
    init_params=None,
    return_init: bool = False,
    snapshot_epochs=None,
    amsgrad: bool = True,
):
    """Train the reference-formulation 2-layer GCN; returns test metrics.

    ``g`` is a :class:`pytextgcn_tpu.core.graph.TextGraph` with implicit
    identity features (text2graph.py:179), optionally carrying
    ``hierarchy_feats`` — extra per-document feature columns hstacked onto
    the identity (text2graph.py:226-246, the per-level cascade's hand-off).
    The identity structure makes layer 1 ``A_hat @ (W1[:n] + doc_scatter(H @
    W1[n:]))`` — the N x N identity is never materialized, matching what the
    sparse feature matrix gives torch in the reference.

    ``model='egcn'`` prepends the reference's embedding head (``Linear(in,
    2000)`` + SELU + dropout, models.py:35-44) and keeps its quirk of
    dropout after *every* GCN layer including the logits (the always-true
    loop condition at models.py:46-50).

    ``return_forward=True`` additionally returns ``predict(hierarchy_feats)``
    — no-grad full-node logits, optionally with *different* hierarchy
    feature columns (how perlevel_amazon.py:156 re-evaluates the trained
    level-2 model on a predictions-fed graph) — plus the shared ``a_hat``.

    Shared-init bisection hooks (VERDICT r2 item 1): ``init_params`` takes
    a dict of numpy arrays in the JAX model's pytree layout
    (``{"layers": [{"w", "b"}, ...]}`` + optional ``"embed"``) and starts
    training from them instead of this process's own sampling;
    ``return_init=True`` exports the actually-used initial parameters in
    that same layout (before any update) under ``out["init"]``;
    ``snapshot_epochs`` (iterable of 1-based epoch numbers) records the
    post-update parameters at those epochs under ``out["snapshots"]`` for
    trajectory-level diffs against the JAX side.
    """
    import torch
    from sklearn.metrics import accuracy_score, f1_score

    assert g.x is None, "torch harness covers identity(-plus-hierarchy) features"
    torch.manual_seed(seed)
    n = g.n_nodes
    if a_hat is None:
        a_hat = _normalized_adj(g, torch.float32)

    hier = g.hierarchy_feats
    n_extra = 0 if hier is None else int(hier.shape[1])
    in_dim = n + n_extra
    hier_t = None if hier is None else torch.from_numpy(
        np.asarray(hier, np.float32)
    )

    def feat_matmul(w):
        """``X @ w`` for X = [I | doc-padded hierarchy], w: [n+F, ...]."""
        out = w[:n]
        if hier_t is not None:
            out = out.clone()
            out[g.n_vocab :] = out[g.n_vocab :] + hier_t @ w[n:]
        return out

    in_gcn = embedding_dim if model == "egcn" else in_dim
    # glorot init, like PyG 1.6.3's GCNConv.reset_parameters
    w1 = torch.empty(in_gcn, n_hidden)
    # JK keeps every GCNConv at n_hidden wide (the Linear head provides
    # out_channels, reference models.py:62-66); gcn/egcn map layer 2 to the
    # class count directly
    w2 = torch.empty(n_hidden, n_hidden if model == "jk" else n_classes)
    torch.nn.init.xavier_uniform_(w1)
    torch.nn.init.xavier_uniform_(w2)
    b1 = torch.zeros(n_hidden)
    b2 = torch.zeros(w2.shape[1])
    if model == "egcn":
        # nn.Linear default init (kaiming_uniform a=sqrt(5), fan_in = in_dim),
        # exactly what the reference's embedding layer gets
        emb = torch.nn.Linear(in_dim, embedding_dim)
    if model == "jk":
        # PyG 1.6.3 JumpingKnowledge(mode="lstm", channels=n_hidden,
        # num_layers=2): BiLSTM over the layer axis with
        # (num_layers * channels) // 2 units per direction, scalar
        # attention Linear(2*hidden, 1), softmax over layers, weighted sum
        # (reference models.py:64; pinned against models/jk.py)
        lstm_hidden = (2 * n_hidden) // 2
        lstm = torch.nn.LSTM(
            n_hidden, lstm_hidden, bidirectional=True, batch_first=True
        )
        att = torch.nn.Linear(2 * lstm_hidden, 1)
        head = torch.nn.Linear(n_hidden, n_classes)
    if init_params is not None:
        layers = init_params["layers"]
        with torch.no_grad():
            w1.copy_(torch.from_numpy(np.asarray(layers[0]["w"], np.float32)))
            b1.copy_(torch.from_numpy(np.asarray(layers[0]["b"], np.float32)))
            w2.copy_(torch.from_numpy(np.asarray(layers[1]["w"], np.float32)))
            b2.copy_(torch.from_numpy(np.asarray(layers[1]["b"], np.float32)))
            if model == "egcn":
                # JAX layout stores the embedding as x @ W ([in, out]);
                # torch Linear keeps W^T ([out, in])
                emb.weight.copy_(torch.from_numpy(
                    np.asarray(init_params["embed"]["w"], np.float32).T
                ))
                emb.bias.copy_(torch.from_numpy(
                    np.asarray(init_params["embed"]["b"], np.float32)
                ))
            if model == "jk":
                f32 = lambda a: torch.from_numpy(np.asarray(a, np.float32))
                for sfx, key in (("l0", "fwd"), ("l0_reverse", "bwd")):
                    lp = init_params["lstm"][key]
                    # JAX layout: wi [in, 4H] (x @ wi); torch keeps [4H, in].
                    # Gate order i,f,g,o is identical on both sides.
                    getattr(lstm, f"weight_ih_{sfx}").copy_(f32(lp["wi"]).T)
                    getattr(lstm, f"weight_hh_{sfx}").copy_(f32(lp["wh"]).T)
                    getattr(lstm, f"bias_ih_{sfx}").copy_(f32(lp["bi"]))
                    getattr(lstm, f"bias_hh_{sfx}").copy_(f32(lp["bh"]))
                att.weight.copy_(f32(init_params["att"]["w"]).T)
                att.bias.copy_(f32(init_params["att"]["b"]))
                head.weight.copy_(f32(init_params["head"]["w"]).T)
                head.bias.copy_(f32(init_params["head"]["b"]))
    w1.requires_grad_(True)
    w2.requires_grad_(True)
    b1.requires_grad_(True)
    b2.requires_grad_(True)
    params = [w1, b1, w2, b2]
    if model == "egcn":
        params += list(emb.parameters())
    if model == "jk":
        params += list(lstm.parameters()) + list(att.parameters()) + list(head.parameters())

    def _export_params() -> dict:
        with torch.no_grad():
            out = {"layers": [
                {"w": w1.numpy().copy(), "b": b1.numpy().copy()},
                {"w": w2.numpy().copy(), "b": b2.numpy().copy()},
            ]}
            if model == "egcn":
                out["embed"] = {
                    "w": emb.weight.numpy().T.copy(),
                    "b": emb.bias.numpy().copy(),
                }
            if model == "jk":
                out["lstm"] = {
                    key: {
                        "wi": getattr(lstm, f"weight_ih_{sfx}").numpy().T.copy(),
                        "wh": getattr(lstm, f"weight_hh_{sfx}").numpy().T.copy(),
                        "bi": getattr(lstm, f"bias_ih_{sfx}").numpy().copy(),
                        "bh": getattr(lstm, f"bias_hh_{sfx}").numpy().copy(),
                    }
                    for sfx, key in (("l0", "fwd"), ("l0_reverse", "bwd"))
                }
                out["att"] = {"w": att.weight.numpy().T.copy(),
                              "b": att.bias.numpy().copy()}
                out["head"] = {"w": head.weight.numpy().T.copy(),
                               "b": head.bias.numpy().copy()}
        return out

    init_export = _export_params() if return_init else None

    y = torch.from_numpy(np.asarray(g.y, np.int64))
    train_mask = torch.from_numpy(np.asarray(g.train_mask))
    test_mask = np.asarray(g.test_mask)
    # amsgrad=True matches the flat drivers (flat_amazon.py:89); the
    # reference's hierarchy/hyperopt drivers use plain Adam
    # (perlevel_amazon.py:84, perlabel_amazon.py:124) — the per-level /
    # per-label wrappers below pass amsgrad=False accordingly
    opt = torch.optim.Adam(params, lr=lr, amsgrad=amsgrad)
    ce = torch.nn.CrossEntropyLoss()
    drop = torch.nn.Dropout(dropout)

    def forward(train: bool, fm=feat_matmul):
        if model == "egcn":
            h = fm(emb.weight.T) + emb.bias  # X @ W_embᵀ without the identity
            h = torch.selu(h)
            h = drop(h) if train else h
            h = torch.sparse.mm(a_hat, h @ w1) + b1
            h = drop(h) if train else h  # EGCN quirk: dropout after every layer
            h = torch.sparse.mm(a_hat, h @ w2) + b2
            return drop(h) if train else h  # ... including the logits
        if model == "jk":
            # reference JK forward (models.py:67-81): dropout after EVERY
            # GCN layer, per-layer activations collected, LSTM-attention
            # fusion, ReLU, dropout, Linear head
            h = fm(w1)
            h = torch.sparse.mm(a_hat, h) + b1
            h = drop(h) if train else h
            acts = [h]
            h = torch.sparse.mm(a_hat, h @ w2) + b2
            h = drop(h) if train else h
            acts.append(h)
            x = torch.stack(acts, dim=1)  # [N, L, H]
            alpha, _ = lstm(x)
            score = torch.softmax(att(alpha).squeeze(-1), dim=-1)
            h = (x * score.unsqueeze(-1)).sum(dim=1)
            h = torch.relu(h)
            h = drop(h) if train else h
            return h @ head.weight.T + head.bias
        h = fm(w1)  # identity feats: X @ W1 == W1 (+ hierarchy block)
        h = torch.sparse.mm(a_hat, h) + b1
        h = drop(h) if train else h
        return torch.sparse.mm(a_hat, h @ w2) + b2

    snapshots = {}
    snapshot_at = set() if snapshot_epochs is None else {int(e) for e in snapshot_epochs}
    t0 = time.time()
    for epoch in range(epochs):
        opt.zero_grad(set_to_none=True)
        loss = ce(forward(train=True)[train_mask], y[train_mask])
        loss.backward()
        opt.step()
        if (epoch + 1) in snapshot_at:
            snapshots[epoch + 1] = _export_params()
        if verbose > 0 and (epoch + 1) % eval_every == 0:
            print(
                f"[torch {epoch + 1}] loss {float(loss):.3f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )

    def predict(hierarchy_feats=None) -> np.ndarray:
        """No-grad full-node logits, optionally with swapped-in hierarchy
        feature columns (must match the training column count)."""
        import torch as th

        if hierarchy_feats is None:
            fm = feat_matmul
        else:
            h_new = th.from_numpy(np.asarray(hierarchy_feats, np.float32))
            assert h_new.shape[1] == n_extra, (
                "hierarchy feature width must match training"
            )

            def fm(w, h_new=h_new):
                out = w[:n].clone()
                out[g.n_vocab :] = out[g.n_vocab :] + h_new @ w[n:]
                return out

        with th.no_grad():
            return forward(train=False, fm=fm).numpy()

    with_pred = predict()
    pred = with_pred.argmax(1)
    yt = np.asarray(g.y)[test_mask]
    pt = pred[test_mask]
    # per-label members can have an EMPTY test slice (a parent class with
    # no test docs at small scale / skewed priors); the composed eval only
    # uses `predict`, so report NaN member metrics instead of crashing
    out = {
        "accuracy": float(accuracy_score(yt, pt)) if len(yt) else float("nan"),
        "f1_macro": (float(f1_score(yt, pt, average="macro"))
                     if len(yt) else float("nan")),
        "train_seconds": time.time() - t0,
    }
    if return_forward:
        out["predict"] = predict
        out["a_hat"] = a_hat
    if init_export is not None:
        out["init"] = init_export
    if snapshots:
        out["snapshots"] = snapshots
    return out


def _softmax_np(logits: np.ndarray) -> np.ndarray:
    z = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return (e / e.sum(axis=-1, keepdims=True)).astype(np.float32)


def _one_hot_np(labels: np.ndarray) -> np.ndarray:
    labels = np.asarray(labels, np.int64)
    out = np.zeros((labels.shape[0], int(labels.max()) + 1), np.float32)
    out[np.arange(labels.shape[0]), labels] = 1.0
    return out


def train_torch_perlevel(
    g,
    level_labels,
    *,
    epochs: int = 500,
    lr: float = 0.05,
    dropout: float = 0.7,
    n_hidden: int = 100,
    seed: int = 42,
    verbose: int = 0,
    model: str = "gcn",
):
    """Per-level cascade with the reference's exact hand-off semantics
    (perlevel_amazon.py / perlevel_dbpedia.py, SURVEY.md §3.5): level k >= 2
    trains with the GT one-hot of level k-1 as extra document features
    (perlevel_dbpedia.py:140); the final level is evaluated with the
    previous level's *softmax predictions* swapped in (perlevel_amazon.py:156,
    computed on that level's own GT-fed graph, perlevel_dbpedia.py:173-175).

    Mirrors pytextgcn_tpu.hierarchy.perlevel.train_per_level seed-for-seed
    (trainer seed = seed + level) so both frameworks run the same protocol.
    """
    from sklearn.metrics import accuracy_score, f1_score

    a_hat = None
    results = []
    hierarchy_gt = None

    for lvl, y in enumerate(level_labels):
        y = np.asarray(y)
        n_classes = int(y.max()) + 1
        y_nodes = np.zeros(g.n_nodes, np.int32)
        y_nodes[g.n_vocab :] = y.astype(np.int32)
        g_lvl = dataclasses.replace(g, y=y_nodes, hierarchy_feats=hierarchy_gt)
        res = train_torch_reference(
            g_lvl, n_classes, epochs=epochs, lr=lr, dropout=dropout,
            n_hidden=n_hidden, seed=seed + lvl, verbose=verbose, model=model,
            return_forward=True, a_hat=a_hat,
            amsgrad=False,  # plain Adam, perlevel_amazon.py:84
        )
        a_hat = res["a_hat"]
        results.append(res)
        hierarchy_gt = _one_hot_np(y)
        if verbose > 0:
            print(
                f"[torch perlevel lvl {lvl}] acc {res['accuracy']:.4f} "
                f"f1 {res['f1_macro']:.4f}",
                flush=True,
            )

    # final evaluation: last level with the previous level's predictions
    y_last = np.asarray(level_labels[-1])
    if len(level_labels) >= 2:
        # the previous level's softmax, computed on its own GT-fed graph
        # (perlevel_dbpedia.py:173-175,224-227 — only the LAST level swaps
        # predictions in; level k-1 still sees GT features of level k-2)
        logits_prev = results[-2]["predict"]()
        pred_feats = _softmax_np(logits_prev[g.n_vocab :])
        logits_final = results[-1]["predict"](hierarchy_feats=pred_feats)
    else:
        logits_final = results[-1]["predict"]()
    pred = logits_final.argmax(1)[g.n_vocab :]
    test_docs = np.asarray(g.test_mask)[g.n_vocab :]
    yt = y_last[test_docs]
    pt = pred[test_docs]
    return {
        "accuracy": float(accuracy_score(yt, pt)),
        "f1_macro": float(f1_score(yt, pt, average="macro")),
        "train_seconds": sum(r["train_seconds"] for r in results),
    }


def train_torch_perlabel(
    g,
    y_child: np.ndarray,
    y_parent: np.ndarray,
    *,
    epochs: int = 500,
    lr: float = 0.05,
    dropout: float = 0.7,
    n_hidden: int = 100,
    seed: int = 42,
    verbose: int = 0,
    model: str = "gcn",
):
    """Per-label ensemble + composed ground-truth-routed inference
    (perlabel_amazon.py:90-155 + eval_perlabel.py:57-85): per parent class,
    relabel its child labels contiguously, train a GCN on ``split_mask AND
    class_mask``; route each test doc to its ground-truth parent's model and
    map the local argmax back through the class mapping.

    The relabel/mask bookkeeping is shared with the JAX ensemble
    (hierarchy/perlabel.py::_member_label_arrays) so both frameworks train
    on *identical* masks; the training math is all torch.
    """
    from sklearn.metrics import accuracy_score, f1_score

    from pytextgcn_tpu.hierarchy.perlabel import _member_label_arrays

    y_child = np.asarray(y_child, np.int64)
    y_parent = np.asarray(y_parent, np.int64)
    n_parents = int(y_parent.max()) + 1
    members = _member_label_arrays(g, y_child, y_parent, n_parents)

    a_hat = None
    predictions = np.full(len(y_child), -1, np.int64)
    test_docs = np.asarray(g.test_mask)[g.n_vocab :]
    train_seconds = 0.0
    for c, (classes, y_nodes, node_mask) in enumerate(members):
        g_c = dataclasses.replace(
            g,
            y=y_nodes,
            train_mask=np.asarray(g.train_mask) & node_mask,
            val_mask=np.asarray(g.val_mask) & node_mask,
            test_mask=np.asarray(g.test_mask) & node_mask,
        )
        res = train_torch_reference(
            g_c, len(classes), epochs=epochs, lr=lr, dropout=dropout,
            n_hidden=n_hidden, seed=seed, verbose=verbose, model=model,
            return_forward=True, a_hat=a_hat,
            amsgrad=False,  # plain Adam, perlabel_amazon.py:124
        )
        a_hat = res["a_hat"]
        train_seconds += res["train_seconds"]
        # ground-truth routing (eval_perlabel.py:73): this member predicts
        # exactly the test docs whose true parent is c
        local_pred = res["predict"]().argmax(1)[g.n_vocab :]
        sel = (y_parent == c) & test_docs
        predictions[sel] = np.asarray(classes, np.int64)[local_pred[sel]]
        if verbose > 0:
            print(
                f"[torch perlabel parent {c}] member acc {res['accuracy']:.4f} "
                f"({res['train_seconds']:.0f}s)",
                flush=True,
            )

    yt = y_child[test_docs]
    pt = predictions[test_docs]
    return {
        "accuracy": float(accuracy_score(yt, pt)),
        "f1_macro": float(f1_score(yt, pt, average="macro")),
        "train_seconds": train_seconds,
    }


def train_torch_mlp(
    splits,
    level: int,
    *,
    hidden=(256, 128),
    lr: float = 2e-3,
    dropout: float = 0.5,
    epochs: int = 500,
    seed: int = 42,
    patience: int = 10,
    min_epochs: int = 30,
    verbose: int = 0,
):
    """Independent torch implementation of the reference MLP baseline
    (MLP_flat.py:14-127 + mlp_helper.py): sparse-input SELU MLP, plain
    ``Adam(lr=2e-3)`` (MLP_flat.py:68 — no amsgrad), full-batch CE, and the
    reference's patience early-stopping rule on val macro-F1
    (MLP_flat.py:94-100: stop once each of the last ``patience`` F1s is
    <= the F1 from ``patience+1`` epochs ago, after ``min_epochs``).

    ``splits`` is the SAME object the JAX baseline trains on
    (pytextgcn_tpu.baselines.fit_tfidf_splits — train-only vectorizer fit,
    mlp_helper.py:38) so the comparison is feature-controlled; every tensor
    op below is torch.
    """
    import torch
    from sklearn.metrics import accuracy_score, f1_score

    torch.manual_seed(seed)

    def t_sparse(m):
        coo = m.tocoo()
        return torch.sparse_coo_tensor(
            torch.from_numpy(np.stack([coo.row, coo.col]).astype(np.int64)),
            torch.from_numpy(coo.data.astype(np.float32)),
            coo.shape,
        ).coalesce().to_sparse_csr()

    x_train = t_sparse(splits.x_train)
    x_val = t_sparse(splits.x_val)
    x_test = t_sparse(splits.x_test)
    y_train = torch.from_numpy(np.asarray(splits.y_train[level], np.int64))
    y_val = np.asarray(splits.y_val[level], np.int64)
    y_test = np.asarray(splits.y_test[level], np.int64)
    n_classes = int(max(y_train.max().item(), y_val.max(), y_test.max())) + 1

    dims = [splits.x_train.shape[1], *hidden, n_classes]
    layers = [torch.nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])]
    params = [p for l in layers for p in l.parameters()]
    opt = torch.optim.Adam(params, lr=lr)
    ce = torch.nn.CrossEntropyLoss()
    drop = torch.nn.Dropout(dropout)

    def forward(x, train: bool):
        h = torch.sparse.mm(x, layers[0].weight.T) + layers[0].bias
        for lin in layers[1:]:
            h = torch.selu(h)
            h = drop(h) if train else h
            h = h @ lin.weight.T + lin.bias
        return h

    t0 = time.time()
    history = []
    for epoch in range(epochs):
        opt.zero_grad(set_to_none=True)
        loss = ce(forward(x_train, train=True), y_train)
        loss.backward()
        opt.step()
        with torch.no_grad():
            pred_val = forward(x_val, train=False).argmax(1).numpy()
        f1_val = f1_score(y_val, pred_val, average="macro")
        history.append((float(loss), f1_val))
        if verbose > 0 and (epoch + 1) % 50 == 0:
            print(f"[torch mlp {epoch + 1}] loss {float(loss):.3f} "
                  f"val_f1 {f1_val:.3f}", flush=True)
        if epoch > min_epochs and len(history) > patience:
            dec = sum(
                history[-(i + 1)][1] <= history[-(patience + 1)][1]
                for i in range(patience)
            )
            if dec >= patience:
                break

    with torch.no_grad():
        pred = forward(x_test, train=False).argmax(1).numpy()
    return {
        "accuracy": float(accuracy_score(y_test, pred)),
        "f1_macro": float(f1_score(y_test, pred, average="macro")),
        "train_seconds": time.time() - t0,
        "epochs_ran": len(history),
    }

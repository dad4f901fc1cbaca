"""Grid-search hyperparameter optimization with k-fold CV.

Counterpart of the reference's old/h_o_train.py: grid over
lr x dropout x max_df x {GCN, EGCN}, 3-fold KFold over document nodes with
the graph's train/test masks rewritten per fold (old/h_o_train.py:59,81-87),
one graph build per max_df, failures recorded as NaN
(old/h_o_train.py:129-131). Results CSV schema matches the committed
old/*.csv files: LR, DO, max_df, model, mean f1, std f1.

    python experiments/hyperopt.py --epochs 100
    python experiments/hyperopt.py --dataset amazon --labels Cat2
"""

import argparse
import dataclasses
import itertools
import sys
import time

import numpy as np

from common import load_corpus
from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.config import ExperimentConfig
from pytextgcn_tpu.models import EGCN, GCN
from pytextgcn_tpu.train import Trainer


def kfold_indices(n: int, k: int, rng: np.random.Generator):
    """sklearn KFold(shuffle=True) semantics: shuffled indices split into k
    contiguous chunks; each chunk is one fold's test set."""
    perm = rng.permutation(n)
    sizes = np.full(k, n // k)
    sizes[: n % k] += 1
    out, start = [], 0
    for s in sizes:
        test = perm[start : start + s]
        train = np.concatenate([perm[:start], perm[start + s :]])
        out.append((train, test))
        start += s
    return out


def _cv_f1(g, y_nodes, doc_nodes, folds, model_name, n_classes, n_hidden,
           dropout, lr, epochs, seed, step_cache, hybrid_k=None):
    """Mean/std val macro-F1 of one grid config over the folds (masks
    rewritten per fold exactly like old/h_o_train.py:81-87). ``step_cache``
    shares jitted steps across same-shaped configs — the k folds of a
    config reuse one compile (the cache key includes model shape, lr and
    the update rule), which matters at remote-TPU compile latency."""
    scores = []
    for tr, te in folds:
        train_mask = np.zeros(g.n_nodes, bool)
        train_mask[doc_nodes[tr]] = True
        val_mask = np.zeros(g.n_nodes, bool)
        val_mask[doc_nodes[te]] = True
        g_fold = dataclasses.replace(
            g, y=y_nodes, train_mask=train_mask, val_mask=val_mask,
            test_mask=np.zeros(g.n_nodes, bool),
        )
        cls = GCN if model_name == "GCN" else EGCN
        model = cls(g.in_dim, n_classes, n_hidden_gcn=n_hidden, dropout=dropout)
        # the reference's hyperopt drivers train with plain Adam, not the
        # flat drivers' amsgrad variant (old/h_o_train.py:98)
        trainer = Trainer(model, lr=lr, seed=seed, step_cache=step_cache,
                          optimizer="adam", hybrid_k=hybrid_k,
                          plan_cache=".plan_cache" if hybrid_k else None)
        trainer.fit(g_fold, epochs=epochs, n_classes=n_classes, verbose=0)
        m = trainer.evaluate(g_fold, mask=val_mask, n_classes=n_classes)
        scores.append(m["f1_macro"])
    return float(np.mean(scores)), float(np.std(scores))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--labels", default="Cat2")
    p.add_argument(
        "--parent-labels", default="Cat1",
        help="parent-level label column for the hierarchical modes",
    )
    p.add_argument(
        "--hierarchy", default="flat", choices=["flat", "per-level", "per-label"],
        help="flat = old/h_o_train.py; per-level = old/h_o_hierarchical.py "
        "(GT parent one-hot appended to node features); per-label = "
        "old/h_o_lables.py (one grid per parent-class classifier, '2lc' "
        "column in the CSV)",
    )
    p.add_argument("--data-dir", default=None)
    p.add_argument("--n-docs", type=int, default=0,
                   help="synthetic corpus size (0 = dataset default) — the "
                   "reduced-scale grid reproduction (VERDICT r3 item 8) "
                   "uses ~6000 docs")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--k-split", type=int, default=3)
    p.add_argument("--n-hidden", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lrs", type=float, nargs="+", default=[0.001, 0.005, 0.01, 0.05])
    p.add_argument("--dropouts", type=float, nargs="+", default=[0.5, 0.7])
    p.add_argument("--max-dfs", type=float, nargs="+", default=[0.5, 0.6, 0.7])
    p.add_argument("--models", nargs="+", default=["GCN", "EGCN"])
    p.add_argument("--hybrid-k", default="off",
                   help="'off' | 'auto' | int — SpMM decomposition for the "
                   "fold trainers (plans cached per max_df graph)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    hybrid_k = None if args.hybrid_k in ("off", "none") else (
        "auto" if args.hybrid_k == "auto" else int(args.hybrid_k)
    )

    cfg = ExperimentConfig(dataset=args.dataset, labels=args.labels, data_dir=args.data_dir)
    cfg.train.seed = args.seed
    if args.n_docs:
        cfg.n_docs = args.n_docs  # honored by load_corpus's synthetic paths
    if args.hierarchy == "flat":
        docs, labels, test_idx, _ = load_corpus(cfg)
        y_parent, y = None, labels[0]
    else:
        docs, labels, test_idx, _ = load_corpus(
            cfg, levels=[args.parent_labels, args.labels]
        )
        y_parent, y = labels[0], labels[-1]
    n_classes = int(np.max(y)) + 1
    rng = np.random.default_rng(args.seed)

    prefix = {
        "flat": "HypOpt", "per-level": "Hierarchical_HypOpt",
        "per-label": "HypOpt_Labels",
    }[args.hierarchy]
    out_name = args.out or f"{prefix}_{args.labels}_{time.strftime('%d_%b_%y_%H_%M_%S')}.csv"
    rows = []
    step_cache = {}  # jitted steps shared across folds of same-shaped configs

    def emit(row):
        import csv

        rows.append(row)
        print(row)
        with open(out_name, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)

    for mdf in args.max_dfs:
        t2g = Text2Graph(min_df=5 if args.dataset != "synthetic" else 1, max_df=mdf)
        # per-level: GT parent one-hot appended to the node features
        # (h_o_hierarchical.py:66,71 — OneHotEncoder of y_top)
        hier = (
            np.eye(int(np.max(y_parent)) + 1, dtype=np.float32)[y_parent]
            if args.hierarchy == "per-level"
            else None
        )
        g = t2g.fit_transform(
            docs, y,
            test_idx=np.arange(0) if args.hierarchy == "per-label" else test_idx,
            hierarchy_feats=hier,
        )
        print(f"Graph built (max_df={mdf}, {g.n_vocab} vocab)!")

        if args.hierarchy == "per-label":
            # one grid per parent-class classifier over that parent's docs,
            # child labels relabeled contiguously (h_o_lables.py:75-94)
            for c in range(int(np.max(y_parent)) + 1):
                sel = np.asarray(y_parent) == c
                doc_nodes = np.flatnonzero(sel) + g.n_vocab
                classes = np.unique(np.asarray(y)[sel])
                y_nodes = np.zeros(g.n_nodes, np.int32)
                y_nodes[doc_nodes] = np.searchsorted(
                    classes, np.asarray(y)[sel]
                ).astype(np.int32)
                folds = kfold_indices(len(doc_nodes), args.k_split, rng)
                for model_name, dropout, lr in itertools.product(
                    args.models, args.dropouts, args.lrs
                ):
                    try:
                        mean_f1, std_f1 = _cv_f1(
                            g, y_nodes, doc_nodes, folds, model_name,
                            len(classes), args.n_hidden, dropout, lr,
                            args.epochs, args.seed, step_cache,
                            hybrid_k=hybrid_k,
                        )
                    except Exception as e:
                        print(f"config failed ({type(e).__name__}: {e}); recording NaN")
                        mean_f1, std_f1 = float("nan"), float("nan")
                    emit({"2lc": f"classifier_{c}", "LR": lr, "DO": dropout,
                          "max_df": mdf, "model": model_name,
                          "mean f1": mean_f1, "std f1": std_f1})
            continue

        doc_nodes = np.flatnonzero(
            np.asarray(g.train_mask) | np.asarray(g.test_mask)
        )
        folds = kfold_indices(len(doc_nodes), args.k_split, rng)
        for dropout, lr, model_name in itertools.product(
            args.dropouts, args.lrs, args.models
        ):
            try:
                mean_f1, std_f1 = _cv_f1(
                    g, np.asarray(g.y), doc_nodes, folds, model_name,
                    n_classes, args.n_hidden, dropout, lr, args.epochs,
                    args.seed, step_cache, hybrid_k=hybrid_k,
                )
            except Exception as e:  # record failures as NaN like the reference
                print(f"config failed ({type(e).__name__}: {e}); recording NaN")
                mean_f1, std_f1 = float("nan"), float("nan")
            emit({"LR": lr, "DO": dropout, "max_df": mdf, "model": model_name,
                  "mean f1": mean_f1, "std f1": std_f1})
    print(f"results -> {out_name}")
    return rows


if __name__ == "__main__":
    main()

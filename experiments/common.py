"""Shared data-loading for experiment drivers.

Replicates the reference's flat-driver preamble (flat_amazon.py:42-63 /
flat_dbpedia.py:41-60): load train/test (+val) corpora, concatenate them
(transductive — the whole corpus is in the graph), draw the random 10% val
split for Amazon, label-encode over the concatenation. Falls back to a
synthetic corpus when the CSV datasets (git-LFS, not shipped) are absent.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytextgcn_tpu.config import ExperimentConfig
from pytextgcn_tpu.data import synthetic_corpus
from pytextgcn_tpu.data.loaders import (
    encode_labels,
    load_amazon,
    load_csv_dataset,
    load_dbpedia,
)


def load_corpus(cfg: ExperimentConfig, levels=None):
    """Returns (docs, level_labels [coarse..fine], test_idx, val_idx).

    ``levels``: label column names, coarse to fine; default is a single
    level given by cfg.labels.
    """
    rng = np.random.default_rng(cfg.train.seed)
    if cfg.dataset == "amazon":
        cols = levels or [cfg.labels]
        per_col = []
        for col in cols:
            x_tr, y_tr, x_te, y_te = load_amazon(cfg.data_dir or "data/amazon", col)
            per_col.append((y_tr, y_te))
        docs = x_tr + x_te
        n_train = len(x_tr)
        val_idx = rng.choice(n_train, int(cfg.train.val_split * n_train), replace=False)
        test_idx = np.arange(n_train, len(docs))
        labels = [
            encode_labels(list(y_tr) + list(y_te))[0] for (y_tr, y_te) in per_col
        ]
        return docs, labels, test_idx, val_idx
    if cfg.dataset == "dbpedia":
        cols = levels or [cfg.labels]
        per_col = []
        for col in cols:
            x_tr, y_tr, x_va, y_va, x_te, y_te = load_dbpedia(
                cfg.data_dir or "data/dbpedia", col
            )
            per_col.append((y_tr, y_va, y_te))
        docs = x_tr + x_va + x_te
        n_tr, n_va = len(x_tr), len(x_va)
        val_idx = np.arange(n_tr, n_tr + n_va)
        test_idx = np.arange(n_tr + n_va, len(docs))
        labels = [
            encode_labels(list(y_tr) + list(y_va) + list(y_te))[0]
            for (y_tr, y_va, y_te) in per_col
        ]
        return docs, labels, test_idx, val_idx
    if cfg.dataset == "csv":
        # generic dataset: train.csv/test.csv[/val.csv] under --data-dir,
        # any text/label columns (load_csv_dataset docstring)
        if not cfg.data_dir:
            raise SystemExit("--dataset csv requires --data-dir")
        cols = levels or [cfg.labels]
        docs, raw_levels, n_train, n_val = load_csv_dataset(
            cfg.data_dir, cols, text_col=getattr(cfg, "text_col", None)
        )
        n = len(docs)
        if n_val:
            # explicit val block between train and test (dbpedia-style)
            val_idx = np.arange(n_train, n_train + n_val)
            test_idx = np.arange(n_train + n_val, n)
        else:
            # random val fraction of train (amazon-style, flat_amazon.py:56)
            val_idx = rng.choice(
                n_train, int(cfg.train.val_split * n_train), replace=False
            )
            test_idx = np.arange(n_train, n)
        labels = [encode_labels(ls)[0] for ls in raw_levels]
        return docs, labels, test_idx, val_idx
    if cfg.dataset in ("synthetic-amazon", "synthetic-dbpedia"):
        # protocol-scale stand-in: reference class counts / doc counts /
        # Zipf word statistics, reference split semantics (see
        # pytextgcn_tpu.data.synthetic.protocol_corpus)
        from pytextgcn_tpu.data.synthetic import protocol_corpus

        protocol = cfg.dataset.split("-")[1]
        n_docs = int(getattr(cfg, "n_docs", 0)) or (
            50_000 if protocol == "amazon" else 60_000
        )
        docs, level_labels, n_train, n_val = protocol_corpus(protocol, n_docs=n_docs)
        n = len(docs)
        if protocol == "amazon":
            # flat_amazon.py:51-63 — val is a random 10% of train, test is
            # the appended test block
            val_idx = rng.choice(n_train, int(cfg.train.val_split * n_train), replace=False)
            test_idx = np.arange(n_train, n)
        else:
            # flat_dbpedia.py:41-60 — explicit val block between train/test
            val_idx = np.arange(n_train, n_train + n_val)
            test_idx = np.arange(n_train + n_val, n)
        if levels and len(levels) > 1:
            # honor the number of requested levels, top-down like the
            # reference cascades (perlevel_dbpedia.py l1->l2->l3): asking
            # for 2 levels of the 3-level dbpedia corpus yields (l1, l2)
            if len(levels) > len(level_labels):
                raise SystemExit(
                    f"{cfg.dataset} has {len(level_labels)} label levels, "
                    f"{len(levels)} requested"
                )
            sel = level_labels[: len(levels)]
            return docs, [np.asarray(l) for l in sel], test_idx, val_idx
        return docs, [np.asarray(level_labels[-1])], test_idx, val_idx
    # synthetic fallback (2-level hierarchy)
    docs, child, parent = synthetic_corpus(
        n_docs=400, n_classes=6, n_parents=3, seed=cfg.train.seed
    )
    n = len(docs)
    test_idx = rng.choice(n, n // 5, replace=False)
    remaining = np.setdiff1d(np.arange(n), test_idx)
    val_idx = rng.choice(remaining, n // 10, replace=False)
    if levels and len(levels) > 1:
        return docs, [np.asarray(parent), np.asarray(child)], test_idx, val_idx
    return docs, [np.asarray(child)], test_idx, val_idx

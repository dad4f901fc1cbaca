"""CSV dataset loaders for the reference's two benchmark datasets.

Amazon product reviews (columns Text, Cat1, Cat2, [Cat3]) and DBpedia
(columns text, l1, l2, l3) — schemas per SURVEY.md §2.5 and the reference's
loading code (flat_amazon.py:42-43, flat_dbpedia.py:41-47). The CSVs are not
shipped with the reference (git-LFS); these loaders work when a user drops
the files into ``data/``.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _read_csv(path: str):
    import pandas as pd

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found — the reference datasets are distributed via "
            "git-LFS and must be supplied manually (SURVEY.md §2.5)."
        )
    return pd.read_csv(path)


def load_amazon(
    data_dir: str = "data/amazon", label: str = "Cat2"
) -> Tuple[List[str], List[str], List[str], List[str]]:
    """Returns (x_train, y_train, x_test, y_test) raw text/labels."""
    train = _read_csv(os.path.join(data_dir, "train.csv"))
    test = _read_csv(os.path.join(data_dir, "test.csv"))
    return (
        train["Text"].tolist(),
        train[label].tolist(),
        test["Text"].tolist(),
        test[label].tolist(),
    )


def load_dbpedia(
    data_dir: str = "data/dbpedia", label: str = "l3"
) -> Tuple[List[str], List[str], List[str], List[str], List[str], List[str]]:
    """Returns (x_train, y_train, x_val, y_val, x_test, y_test)."""
    train = _read_csv(os.path.join(data_dir, "DBPEDIA_train.csv"))
    val = _read_csv(os.path.join(data_dir, "DBPEDIA_val.csv"))
    test = _read_csv(os.path.join(data_dir, "DBPEDIA_test.csv"))
    return (
        train["text"].tolist(),
        train[label].tolist(),
        val["text"].tolist(),
        val[label].tolist(),
        test["text"].tolist(),
        test[label].tolist(),
    )


def encode_labels(*label_lists: Sequence) -> Tuple[np.ndarray, ...]:
    """LabelEncoder-equivalent: map labels to ints by sorted order, fit over
    the concatenation (flat_amazon.py:63 semantics)."""
    all_labels = sorted({l for ls in label_lists for l in ls})
    table = {l: i for i, l in enumerate(all_labels)}
    return tuple(np.array([table[l] for l in ls], dtype=np.int32) for ls in label_lists)


def load_csv_dataset(
    data_dir: str,
    label_cols: Sequence[str],
    text_col: Optional[str] = None,
) -> Tuple[List[str], List[List[str]], int, int]:
    """Generic CSV dataset: ``data_dir/train.csv`` + ``test.csv`` and an
    optional ``val.csv``, each holding one text column and the requested
    label columns. The escape hatch the reference lacks — a new dataset
    there means writing a new driver script (README.md:44-45); here it is
    ``--dataset csv --data-dir ... --labels <col> [--text-col <col>]``.

    ``text_col=None`` auto-detects: 'text' or 'Text' if present, else the
    first column that is not a label column. Returns
    ``(docs, per_level_raw_labels, n_train, n_val)`` with docs concatenated
    train [+ val] + test (transductive, like the reference drivers);
    ``n_val = 0`` when there is no val.csv (callers draw a random split,
    amazon-style).
    """
    train = _read_csv(os.path.join(data_dir, "train.csv"))
    test = _read_csv(os.path.join(data_dir, "test.csv"))
    val_path = os.path.join(data_dir, "val.csv")
    val = _read_csv(val_path) if os.path.exists(val_path) else None

    if text_col is None:
        for cand in ("text", "Text"):
            if cand in train.columns:
                text_col = cand
                break
        else:
            others = [c for c in train.columns if c not in set(label_cols)]
            if not others:
                raise ValueError(
                    f"no text column found in {data_dir}/train.csv "
                    f"(columns: {list(train.columns)}); pass text_col"
                )
            text_col = others[0]
    frames = [train] + ([val] if val is not None else []) + [test]
    for f in frames:
        missing = [c for c in [text_col, *label_cols] if c not in f.columns]
        if missing:
            raise ValueError(
                f"CSV in {data_dir} is missing columns {missing} "
                f"(have: {list(f.columns)})"
            )
    docs: List[str] = []
    for f in frames:
        docs += f[text_col].astype(str).tolist()
    labels = [
        [l for f in frames for l in f[col].tolist()] for col in label_cols
    ]
    return docs, labels, len(train), (len(val) if val is not None else 0)

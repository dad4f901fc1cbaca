"""Generic CSV dataset path (--dataset csv): loader semantics + an
end-to-end run through the flat driver. The reference has no such escape
hatch — a new dataset there means a new driver script (README.md:44-45)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))

from pytextgcn_tpu.data.loaders import load_csv_dataset
from pytextgcn_tpu.data.synthetic import synthetic_corpus


def _write_csvs(tmp_path, with_val=False, text_col="text"):
    import pandas as pd

    docs, child, parent = synthetic_corpus(
        n_docs=240, n_classes=4, n_parents=2, seed=7
    )
    child = [f"c{int(c)}" for c in child]
    parent = [f"p{int(p)}" for p in parent]
    df = pd.DataFrame({text_col: docs, "coarse": parent, "fine": child})
    n_tr, n_va = 160, (40 if with_val else 0)
    df.iloc[:n_tr].to_csv(tmp_path / "train.csv", index=False)
    if with_val:
        df.iloc[n_tr : n_tr + n_va].to_csv(tmp_path / "val.csv", index=False)
    df.iloc[n_tr + n_va :].to_csv(tmp_path / "test.csv", index=False)
    return n_tr, n_va, len(docs)


def test_load_csv_dataset_roundtrip(tmp_path):
    n_tr, _, n = _write_csvs(tmp_path, with_val=False)
    docs, labels, n_train, n_val = load_csv_dataset(
        str(tmp_path), ["coarse", "fine"]
    )
    assert (len(docs), n_train, n_val) == (n, n_tr, 0)
    assert len(labels) == 2 and len(labels[0]) == n
    assert set(labels[0]) == {"p0", "p1"}

    # explicit val block variant + non-default text column autodetected only
    # when named 'text'/'Text' — here we pass it explicitly
    n_tr, n_va, n = _write_csvs(tmp_path, with_val=True, text_col="body")
    docs, labels, n_train, n_val = load_csv_dataset(
        str(tmp_path), ["fine"], text_col="body"
    )
    assert (n_train, n_val) == (n_tr, n_va)
    # autodetect falls back to the first non-label column
    docs2, _, _, _ = load_csv_dataset(str(tmp_path), ["coarse", "fine"])
    assert docs2 == docs


def test_load_csv_dataset_missing_column(tmp_path):
    _write_csvs(tmp_path)
    with pytest.raises(ValueError, match="missing columns"):
        load_csv_dataset(str(tmp_path), ["nope"])


def test_flat_driver_on_csv(tmp_path, capsys):
    _write_csvs(tmp_path, with_val=True)
    import flat

    flat.main([
        "--dataset", "csv", "--data-dir", str(tmp_path), "--labels", "fine",
        "--train-epochs", "30", "--train-verbose", "0",
        "--result-file", str(tmp_path / "results.csv"),
    ])
    out = capsys.readouterr().out
    assert "Test Accuracy" in out
    acc = float(out.split("Test Accuracy:")[1].split()[0])
    assert acc > 0.8  # separable synthetic corpus
    assert (tmp_path / "results.csv").exists()


def test_common_split_semantics(tmp_path):
    # no val.csv -> random 10% of train; val.csv -> explicit block
    from common import load_corpus
    from pytextgcn_tpu.config import ExperimentConfig

    n_tr, _, n = _write_csvs(tmp_path, with_val=False)
    cfg = ExperimentConfig(dataset="csv", data_dir=str(tmp_path), labels="fine")
    docs, labels, test_idx, val_idx = load_corpus(cfg)
    assert len(docs) == n and len(labels) == 1
    assert labels[0].dtype == np.int32
    assert test_idx.min() == n_tr and len(val_idx) == int(0.1 * n_tr)
    assert val_idx.max() < n_tr  # val drawn from train block

    n_tr, n_va, n = _write_csvs(tmp_path, with_val=True)
    docs, labels, test_idx, val_idx = load_corpus(cfg)
    assert list(val_idx) == list(range(n_tr, n_tr + n_va))
    assert test_idx.min() == n_tr + n_va

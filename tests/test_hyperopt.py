"""Grid-search driver smoke tests: the three reference hyperopt variants
(old/h_o_train.py flat, old/h_o_hierarchical.py per-level GT-feats,
old/h_o_lables.py per-label with the '2lc' CSV column)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))


def _run(tmp_path, hierarchy):
    import hyperopt

    out = str(tmp_path / f"ho_{hierarchy}.csv")
    rows = hyperopt.main(
        [
            "--hierarchy", hierarchy, "--epochs", "5", "--k-split", "2",
            "--lrs", "0.05", "--dropouts", "0.5", "--max-dfs", "1.0",
            "--models", "GCN", "--n-hidden", "16", "--out", out,
        ]
    )
    assert os.path.exists(out)
    return rows


def test_hyperopt_per_level(tmp_path):
    rows = _run(tmp_path, "per-level")
    assert len(rows) == 1
    assert set(rows[0]) == {"LR", "DO", "max_df", "model", "mean f1", "std f1"}
    assert np.isfinite(rows[0]["mean f1"])


def test_hyperopt_per_label(tmp_path):
    rows = _run(tmp_path, "per-label")
    # one row per parent classifier (synthetic corpus has 3 parents)
    assert len(rows) == 3
    assert [r["2lc"] for r in rows] == [f"classifier_{i}" for i in range(3)]
    assert all(np.isfinite(r["mean f1"]) for r in rows)

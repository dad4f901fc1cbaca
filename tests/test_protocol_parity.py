"""Smoke-pin the protocol parity harness (experiments/protocol_parity.py):
both frameworks run the same graph at tiny scale, emit rows in the
reference's results.csv schema, and agree within a loose band."""

import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))


def test_protocol_parity_smoke(tmp_path):
    import protocol_parity

    out = tmp_path / "results.csv"
    summary = protocol_parity.main([
        "--protocol", "amazon", "--seeds", "42", "--n-docs", "400",
        "--epochs", "30", "--frameworks", "both", "--verbose", "0",
        "--out", str(out),
    ])
    assert "jax" in summary and "torch" in summary
    # same graph, same protocol, independent implementations: metrics land
    # in the same region (tight per-seed agreement is the full-scale runs'
    # job — docs/protocol_results.csv)
    assert abs(summary["jax"]["accuracy"][0] - summary["torch"]["accuracy"][0]) < 0.15

    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    for r in rows:
        assert set(r) >= {"seed", "model", "hierarchy", "f1-macro", "accuracy"}
        assert r["model"] == "GCN" and r["hierarchy"] == "flat"
        assert 0.0 <= float(r["accuracy"]) <= 1.0


def test_protocol_remask_semantics():
    import protocol_parity

    g, _, n_train, n_val = protocol_parity.build_graph("amazon", 300, verbose=0)
    g42 = protocol_parity.remask(g, "amazon", n_train, n_val, seed=42)
    g43 = protocol_parity.remask(g, "amazon", n_train, n_val, seed=43)
    # amazon: test block fixed, val is a seed-dependent 10% draw of train docs
    assert np.array_equal(g42.test_mask, g43.test_mask)
    assert not np.array_equal(g42.val_mask, g43.val_mask)
    assert g42.val_mask.sum() == int(0.1 * n_train)
    # word nodes never train; masks are disjoint
    assert not g42.train_mask[: g.n_vocab].any()
    assert not (g42.train_mask & (g42.val_mask | g42.test_mask)).any()

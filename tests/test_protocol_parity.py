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


def test_torch_hierarchy_protocols():
    """The torch cross-check covers the hierarchy protocols too
    (train_torch_perlevel / train_torch_perlabel): tiny-scale runs produce
    sane composed metrics, and the per-level feature swap is live."""
    import protocol_parity
    from torch_reference import (
        train_torch_perlabel,
        train_torch_perlevel,
        train_torch_reference,
    )

    g, level_labels, n_train, n_val = protocol_parity.build_graph(
        "amazon", 400, verbose=0, hierarchy="perlabel"
    )
    gs = protocol_parity.remask(g, "amazon", n_train, n_val, seed=42)
    kw = dict(epochs=10, lr=0.05, dropout=0.7, n_hidden=16, seed=42, verbose=0)

    m_pl = train_torch_perlabel(
        gs, np.asarray(level_labels[-1]), np.asarray(level_labels[-2]), **kw
    )
    assert 0.0 <= m_pl["accuracy"] <= 1.0
    assert 0.0 <= m_pl["f1_macro"] <= 1.0

    m_lvl = train_torch_perlevel(gs, level_labels, **kw)
    assert 0.0 <= m_lvl["accuracy"] <= 1.0

    # the hierarchy-feature machinery is live: a trained model's logits move
    # when the appended document features change
    import dataclasses

    y1 = np.asarray(level_labels[0])
    y_nodes = np.zeros(gs.n_nodes, np.int32)
    y_nodes[gs.n_vocab :] = y1.astype(np.int32)
    hier = np.eye(int(y1.max()) + 1, dtype=np.float32)[y1]
    g_h = dataclasses.replace(gs, y=y_nodes, hierarchy_feats=hier)
    res = train_torch_reference(
        g_h, int(y1.max()) + 1, epochs=5, n_hidden=16, seed=42,
        return_forward=True,
    )
    swapped = res["predict"](hierarchy_feats=np.roll(hier, 1, axis=1))
    assert not np.allclose(res["predict"](), swapped)


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


def test_mlp_parity_smoke(tmp_path):
    """The torch MLP baseline column (VERDICT r2 item 6): both frameworks
    train on identical TF-IDF splits and land in the same region."""
    import mlp_parity

    out = tmp_path / "results.csv"
    summary = mlp_parity.main([
        "--protocol", "amazon", "--seeds", "42", "--n-docs", "500",
        "--epochs", "40", "--frameworks", "both", "--verbose", "0",
        "--out", str(out),
    ])
    assert "jax" in summary and "torch" in summary
    assert abs(summary["jax"]["accuracy"][0] - summary["torch"]["accuracy"][0]) < 0.15
    import csv

    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert [r["model"] for r in rows] == ["MLP", "MLP"]

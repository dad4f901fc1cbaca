"""Hybrid plan persistence (ops/plan_cache.py) + the O(E) randomized
symmetry audit (VERDICT r2 Weak #5): a warm process must reproduce the cold
build's operator exactly without re-running host-side plan construction."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.ops import NormAdj
from pytextgcn_tpu.ops.spmm import spmm


def _sym_graph(seed=0, n_vocab=300, n_docs=200, m=6000, weight_symmetric=True):
    rng = np.random.default_rng(seed)
    n = n_vocab + n_docs
    a = rng.integers(0, n, m).astype(np.int32)
    b = rng.integers(0, n, m).astype(np.int32)
    w = (rng.random(m) + 0.1).astype(np.float32)
    zeros = np.zeros(n, bool)
    return TextGraph(
        edge_src=np.concatenate([a, b]), edge_dst=np.concatenate([b, a]),
        edge_w=np.concatenate([w, w]), y=np.zeros(n, np.int32),
        train_mask=zeros, val_mask=zeros, test_mask=zeros,
        n_vocab=n_vocab, n_docs=n_docs, weight_symmetric=weight_symmetric,
    )


def test_plan_cache_round_trip(tmp_path):
    g = _sym_graph()
    cache = str(tmp_path / "plans")
    cold = NormAdj.from_graph(g, hybrid_k=128, plan_cache=cache)
    assert cold.plan is not None

    # warm load must not call the builder at all
    import pytextgcn_tpu.ops.plan_cache as pc

    called = []
    orig = pc.load_or_build.__globals__  # noqa: F841

    import pytextgcn_tpu.ops.hybrid as hybrid

    real_build = hybrid.build_hybrid_plan
    hybrid.build_hybrid_plan = lambda *a, **k: called.append(1) or real_build(*a, **k)
    try:
        warm = NormAdj.from_graph(g, hybrid_k=128, plan_cache=cache)
    finally:
        hybrid.build_hybrid_plan = real_build
    assert not called, "warm load re-ran the plan builder"
    assert warm.plan.k == cold.plan.k
    assert warm.plan.n_resid == cold.plan.n_resid
    np.testing.assert_allclose(warm.plan.floor_spmm_ns, cold.plan.floor_spmm_ns)

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((g.n_nodes, 16)), jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(spmm(cold, x)), np.asarray(spmm(warm, x))
    )
    # gradients ride the same custom VJPs
    f = lambda adj: (lambda v: jnp.sum(spmm(adj, v) ** 2))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f(cold))(x)), np.asarray(jax.grad(f(warm))(x)),
        rtol=1e-6,
    )


def test_plan_cache_key_misses_on_param_change(tmp_path):
    g = _sym_graph()
    cache = str(tmp_path / "plans")
    NormAdj.from_graph(g, hybrid_k=128, plan_cache=cache)
    import os

    files = set(os.listdir(cache))
    NormAdj.from_graph(g, hybrid_k=256, plan_cache=cache)
    assert len(set(os.listdir(cache))) == len(files) + 1
    # a different graph misses too
    g2 = _sym_graph(seed=9)
    NormAdj.from_graph(g2, hybrid_k=128, plan_cache=cache)
    assert len(set(os.listdir(cache))) == len(files) + 2


def test_fast_symmetry_audit():
    from pytextgcn_tpu.ops.hybrid import check_weight_symmetric_fast

    g = _sym_graph()
    src, dst, w = (np.asarray(g.edge_src, np.int64),
                   np.asarray(g.edge_dst, np.int64), np.asarray(g.edge_w))
    check_weight_symmetric_fast(src, dst, w, g.n_nodes)  # passes

    w_bad = w.copy()
    w_bad[0] *= 2.0  # one mirror weight off
    with pytest.raises(ValueError):
        check_weight_symmetric_fast(src, dst, w_bad, g.n_nodes)
    # directed edge (no mirror)
    with pytest.raises(ValueError):
        check_weight_symmetric_fast(
            np.concatenate([src, [0]]), np.concatenate([dst, [5]]),
            np.concatenate([w, [0.3]]), g.n_nodes,
        )


def test_weight_symmetric_flag_round_trips(tmp_path):
    g = _sym_graph()
    p = str(tmp_path / "g.npz")
    g.save(p)
    g2 = TextGraph.load(p)
    assert g2.weight_symmetric is True
    # dataclasses.replace keeps it (hierarchy pipelines swap labels/masks)
    g3 = dataclasses.replace(g2, y=np.ones(g2.n_nodes, np.int32))
    assert g3.weight_symmetric is True


def test_fast_audit_used_for_flagged_graphs(monkeypatch):
    # flagged graph -> the O(E log E) full audit must NOT run
    import pytextgcn_tpu.ops.hybrid as hybrid

    def boom(*a, **k):
        raise AssertionError("full lexsort audit ran on a flagged graph")

    monkeypatch.setattr(hybrid, "check_weight_symmetric", boom)
    g = _sym_graph(weight_symmetric=True)
    adj = NormAdj.from_graph(g, hybrid_k=128)
    assert adj.plan is not None


def test_plan_cache_round_trips_tile_geometry(tmp_path):
    """Format v2: TilePlan geometry + f32_mode survive the npz round-trip,
    and the key covers the effective RESID_* geometry (a swept-default
    change must miss, not pin stale kernel shapes)."""
    import pytextgcn_tpu.ops.spmm_pallas as sp
    from pytextgcn_tpu.core.graph import TextGraph
    from pytextgcn_tpu.ops import NormAdj

    rng = np.random.default_rng(5)
    n, e = 600, 4000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    src2 = np.concatenate([src, dst])
    dst2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w])
    g = TextGraph(
        edge_src=src2, edge_dst=dst2, edge_w=w2,
        y=np.zeros(n, np.int32), train_mask=np.zeros(n, bool),
        val_mask=np.zeros(n, bool), test_mask=np.zeros(n, bool),
        n_vocab=n // 2, n_docs=n - n // 2, weight_symmetric=True,
    )
    adj = NormAdj.from_graph(g, hybrid_k=64, plan_cache=str(tmp_path))
    assert adj.plan is not None and adj.plan.res_fwd is not None
    files = list(tmp_path.glob("hybridplan-*.npz"))
    assert len(files) == 1

    adj2 = NormAdj.from_graph(g, hybrid_k=64, plan_cache=str(tmp_path))
    tp, tp2 = adj.plan.res_fwd, adj2.plan.res_fwd
    assert (tp2.row_block, tp2.edge_tile, tp2.f32_mode) == (
        tp.row_block, tp.edge_tile, tp.f32_mode
    )
    np.testing.assert_array_equal(np.asarray(tp2.rel), np.asarray(tp.rel))

    # a different effective geometry must produce a different cache key
    # (geometry now resolves per mode through sp.RESID_GEOMS /
    # sp.resid_geometry — patch the table, not the legacy globals)
    orig_mode, orig_geom = sp.RESID_F32_MODE, dict(sp.RESID_GEOMS)
    try:
        sp.RESID_F32_MODE = "split2"
        sp.RESID_GEOMS["split2"] = (128, 512)
        adj3 = NormAdj.from_graph(g, hybrid_k=64, plan_cache=str(tmp_path))
        assert len(list(tmp_path.glob("hybridplan-*.npz"))) == 2
        tp3 = adj3.plan.res_fwd
        assert (tp3.row_block, tp3.edge_tile, tp3.f32_mode) == (128, 512, "split2")
    finally:
        sp.RESID_F32_MODE = orig_mode
        sp.RESID_GEOMS.clear()
        sp.RESID_GEOMS.update(orig_geom)

"""Sharded masked-head operator (parallel/restricted_sharded.py): the
restricted head on a mesh must equal the full SpMM at the train rows, be
exactly zero elsewhere, carry exact gradients through the halo/hybrid
pieces, and let Trainer(masked_head=True, mesh=...) reproduce the
single-device masked-head training trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.ops.adjacency import NormAdj
from pytextgcn_tpu.ops.spmm import spmm, spmm_segment
from pytextgcn_tpu.parallel import (
    RestrictedShardedAdj,
    build_restricted_sharded_adj,
    make_mesh,
)
from pytextgcn_tpu.train import Trainer


def _graph(n_vocab=300, n_docs=200, n_edges=8000, seed=0):
    # Zipfian endpoints like a real text graph; train rows are documents
    rng = np.random.default_rng(seed)
    n = n_vocab + n_docs
    p = 1.0 / np.arange(1, n + 1) ** 1.1
    p /= p.sum()
    src = rng.choice(n, n_edges, p=p).astype(np.int32)
    dst = rng.choice(n, n_edges, p=p).astype(np.int32)
    w = (rng.random(n_edges) + 0.05).astype(np.float32)
    zeros = np.zeros(n, bool)
    tm = zeros.copy()
    tm[n_vocab : n_vocab + 150] = True
    vm = zeros.copy()
    vm[n_vocab + 150 : n_vocab + 175] = True
    sm = zeros.copy()
    sm[n_vocab + 175 :] = True
    return TextGraph(
        edge_src=src, edge_dst=dst, edge_w=w,
        y=rng.integers(0, 4, n).astype(np.int32),
        train_mask=tm, val_mask=vm, test_mask=sm,
        n_vocab=n_vocab, n_docs=n_docs,
    )


@pytest.mark.parametrize(
    "hot_k", [None, 128, "auto"], ids=["halo", "hybrid128", "auto"]
)
def test_restricted_sharded_matches_full_rows(hot_k):
    g = _graph(seed=1)
    rows = np.flatnonzero(g.train_mask)
    mesh = make_mesh(8)
    r = build_restricted_sharded_adj(g, rows, mesh, hot_k=hot_k)
    full = NormAdj.from_graph(g)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((g.n_nodes, 16)), jnp.float32
    )
    got = np.asarray(jax.jit(lambda v: spmm(r, v))(x))
    ref = np.asarray(spmm_segment(full, x))
    np.testing.assert_allclose(got[rows], ref[rows], rtol=1e-4, atol=1e-5)
    # every non-train row must be exactly zero (the loss masks them, and a
    # zero row carries zero cotangent — that is what makes gradients exact)
    other = np.ones(g.n_nodes, bool)
    other[rows] = False
    assert np.all(got[other] == 0.0)


def test_restricted_sharded_forced_k_uses_hybrid():
    g = _graph(seed=4)
    rows = np.flatnonzero(g.train_mask)
    mesh = make_mesh(8)
    r = build_restricted_sharded_adj(g, rows, mesh, hot_k=128)
    assert isinstance(r, RestrictedShardedAdj)
    assert r.k == 128
    assert r.comm_rows_per_device > 0


def test_restricted_sharded_gradients_exact():
    g = _graph(seed=3)
    rows = np.flatnonzero(g.train_mask)
    rows_j = jnp.asarray(rows)
    mesh = make_mesh(8)
    full = NormAdj.from_graph(g)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((g.n_nodes, 8)), jnp.float32
    )
    cot = jnp.asarray(
        np.random.default_rng(6).standard_normal((len(rows), 8)), jnp.float32
    )

    g_ref = jax.grad(
        lambda v: jnp.sum(spmm_segment(full, v)[rows_j] * cot)
    )(x)
    for hot_k in (None, 128):
        r = build_restricted_sharded_adj(g, rows, mesh, hot_k=hot_k)
        g_got = jax.grad(lambda v: jnp.sum(spmm(r, v)[rows_j] * cot))(x)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("hybrid_k", [None, "auto"], ids=["halo", "hybrid"])
def test_trainer_masked_head_on_mesh_matches_single_device(hybrid_k):
    # the mesh masked-head trajectory must match the single-device
    # masked-head trajectory (same seeds -> same dropout stream; the loss
    # reads identical logits at the train rows)
    g = _graph(n_vocab=150, n_docs=120, n_edges=4000, seed=7)
    mesh = make_mesh(8)
    kw = dict(n_gcn=2, n_hidden_gcn=16)
    t_ref = Trainer(GCN(g.n_nodes, 4, **kw), lr=0.05, seed=0, masked_head=True)
    t_mesh = Trainer(
        GCN(g.n_nodes, 4, **kw), lr=0.05, seed=0,
        mesh=mesh, halo=True, hybrid_k=hybrid_k, masked_head=True,
    )
    h_ref = t_ref.fit(g, epochs=6, eval_every=6)
    h_mesh = t_mesh.fit(g, epochs=6, eval_every=6)
    for a, b in zip(h_ref, h_mesh):
        assert a["loss"] == pytest.approx(b["loss"], rel=2e-4)
    leaves_a = jax.tree.leaves(t_ref.params)
    leaves_b = jax.tree.leaves(t_mesh.params)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=5e-4, atol=1e-5
        )
    m_ref = t_ref.evaluate(g)
    m_mesh = t_mesh.evaluate(g)
    assert m_ref["accuracy"] == pytest.approx(m_mesh["accuracy"], abs=0.02)

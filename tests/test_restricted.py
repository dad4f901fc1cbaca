"""Output-row-restricted SpMM (ops/restricted.py) and masked-head training:
the restricted head must compute exactly the rows the masked loss reads, in
every execution mode, with exact gradients — and Trainer(masked_head=True)
must reproduce the full-output training trajectory bit-for-bit for GCN
(dropout on hidden layers only)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.ops import NormAdj
from pytextgcn_tpu.ops.restricted import build_restricted_adj, spmm_restricted
from pytextgcn_tpu.ops.spmm import spmm_segment
from pytextgcn_tpu.train import Trainer


def _graph(n_vocab=70, n_docs=90, n_edges=3000, seed=0):
    rng = np.random.default_rng(seed)
    n = n_vocab + n_docs
    zeros = np.zeros(n, bool)
    tm = zeros.copy()
    tm[n_vocab : n_vocab + 60] = True
    vm = zeros.copy()
    vm[n_vocab + 60 : n_vocab + 70] = True
    sm = zeros.copy()
    sm[n_vocab + 70 :] = True
    return TextGraph(
        edge_src=rng.integers(0, n, n_edges).astype(np.int32),
        edge_dst=rng.integers(0, n, n_edges).astype(np.int32),
        edge_w=(rng.random(n_edges) + 0.1).astype(np.float32),
        y=rng.integers(0, 4, n).astype(np.int32),
        train_mask=tm, val_mask=vm, test_mask=sm,
        n_vocab=n_vocab, n_docs=n_docs,
    )


@pytest.mark.parametrize(
    "kwargs",
    [dict(), dict(use_pallas=True), dict(hot_k=64), dict(hot_k="auto")],
    ids=["segment", "pallas", "hybrid64", "hybrid-auto"],
)
def test_restricted_rows_match_full(kwargs):
    g = _graph(seed=3)
    rows = np.flatnonzero(g.train_mask)
    r = build_restricted_adj(g, rows, **kwargs)
    full = NormAdj.from_graph(g)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((g.n_nodes, 16)), jnp.float32
    )
    got = jax.jit(spmm_restricted)(r, x)
    ref = spmm_segment(full, x)[jnp.asarray(rows)]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_restricted_gradients_exact():
    # d/dx of sum(rows of A_hat @ x) must equal the full SpMM's gradient
    # restricted to those output rows, for every execution mode
    g = _graph(seed=5)
    rows = np.flatnonzero(g.train_mask)
    full = NormAdj.from_graph(g)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((g.n_nodes, 8)), jnp.float32
    )
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((len(rows), 8)), jnp.float32
    )

    def ref_loss(v):
        return jnp.sum(spmm_segment(full, v)[jnp.asarray(rows)] * cot)

    g_ref = jax.grad(ref_loss)(x)
    for kwargs in (dict(), dict(use_pallas=True), dict(hot_k=64)):
        r = build_restricted_adj(g, rows, **kwargs)
        g_got = jax.grad(lambda v: jnp.sum(spmm_restricted(r, v) * cot))(x)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )


def test_masked_head_training_bitexact():
    """GCN + masked_head trains to the SAME parameters as the full step
    (dropout on hidden only -> identical RNG consumption; the loss sees the
    identical masked terms)."""
    g = _graph(seed=7)
    mk = lambda: GCN(g.in_dim, 4, n_hidden_gcn=16, dropout=0.5)

    t_full = Trainer(mk(), lr=0.05, seed=11)
    t_full.fit(g, epochs=12, n_classes=4)
    t_mask = Trainer(mk(), lr=0.05, seed=11, masked_head=True)
    t_mask.fit(g, epochs=12, n_classes=4)

    for a, b in zip(jax.tree.leaves(t_full.params), jax.tree.leaves(t_mask.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
    m_full = t_full.evaluate(g, n_classes=4)
    m_mask = t_mask.evaluate(g, n_classes=4)
    assert m_full == m_mask


def test_masked_head_with_hybrid_paths():
    # masked_head composes with the hybrid/pallas full-graph paths and the
    # restricted hybrid head; losses must match the segment trainer's.
    # (the FULL hybrid needs weight-symmetric edges — mirror them, like
    # every Text2Graph adjacency is)
    g0 = _graph(seed=9)
    g = dataclasses.replace(
        g0,
        edge_src=np.concatenate([g0.edge_src, g0.edge_dst]),
        edge_dst=np.concatenate([g0.edge_dst, g0.edge_src]),
        edge_w=np.concatenate([g0.edge_w, g0.edge_w]),
    )
    mk = lambda: GCN(g.in_dim, 4, n_hidden_gcn=16, dropout=0.0)
    h_ref = Trainer(mk(), lr=0.05, seed=2).fit(g, epochs=5, n_classes=4)
    h_m = Trainer(
        mk(), lr=0.05, seed=2, masked_head=True, hybrid_k=64, use_pallas=True
    ).fit(g, epochs=5, n_classes=4)
    for a, b in zip(h_ref, h_m):
        assert abs(a["loss"] - b["loss"]) < 1e-4


def test_masked_head_resume_and_es():
    # masked-head runs keep the resume/early-stopping semantics (the loss
    # stream is identical, so 'reference' ES fires identically)
    g = _graph(seed=13)
    mk = lambda: GCN(g.in_dim, 4, n_hidden_gcn=16, dropout=0.5)
    h1 = Trainer(mk(), lr=0.5, seed=3).fit(
        g, epochs=40, n_classes=4, early_stopping="reference"
    )
    h2 = Trainer(mk(), lr=0.5, seed=3, masked_head=True).fit(
        g, epochs=40, n_classes=4, early_stopping="reference"
    )
    assert len(h1) == len(h2)

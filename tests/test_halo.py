"""Halo-exchange sharded SpMM (parallel/halo.py): boundary-only ppermute
exchange with row-sharded activations must equal the single-device SpMM,
forward and backward, and must move fewer rows than the all_gather path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.ops.adjacency import NormAdj
from pytextgcn_tpu.ops.spmm import spmm, spmm_segment
from pytextgcn_tpu.parallel import build_halo_adj, make_mesh
from pytextgcn_tpu.train import Trainer


def _graph(n_vocab=90, n_docs=110, n_edges=4000, seed=0, local_bias=False):
    rng = np.random.default_rng(seed)
    n = n_vocab + n_docs
    if local_bias:
        # mostly-local edges: a realistic partition with small halos
        src = rng.integers(0, n, n_edges).astype(np.int32)
        off = rng.integers(-12, 13, n_edges)
        dst = np.clip(src + off, 0, n - 1).astype(np.int32)
    else:
        src = rng.integers(0, n, n_edges).astype(np.int32)
        dst = rng.integers(0, n, n_edges).astype(np.int32)
    zeros = np.zeros(n, bool)
    tm = zeros.copy()
    tm[n_vocab:] = True
    return TextGraph(
        edge_src=src, edge_dst=dst,
        edge_w=(rng.random(n_edges) + 0.1).astype(np.float32),
        y=rng.integers(0, 3, n).astype(np.int32),
        train_mask=tm, val_mask=zeros, test_mask=zeros,
        n_vocab=n_vocab, n_docs=n_docs,
    )


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_halo_forward_matches_single(n_dev):
    g = _graph(seed=n_dev)
    mesh = make_mesh(n_dev)
    adj_h = build_halo_adj(g, mesh)
    adj_ref = NormAdj.from_graph(g)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((g.n_nodes, 12)), jnp.float32
    )
    got = jax.jit(spmm)(adj_h, x)
    ref = spmm_segment(adj_ref, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_halo_gradient_matches_single():
    g = _graph(seed=7)
    mesh = make_mesh(4)
    adj_h = build_halo_adj(g, mesh)
    adj_ref = NormAdj.from_graph(g)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((g.n_nodes, 8)), jnp.float32
    )
    ct = jnp.asarray(
        np.random.default_rng(3).standard_normal((g.n_nodes, 8)), jnp.float32
    )
    g_h = jax.jit(jax.grad(lambda v: jnp.vdot(spmm(adj_h, v), ct)))(x)
    g_ref = jax.grad(lambda v: jnp.vdot(spmm_segment(adj_ref, v), ct))(x)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_halo_comm_volume_below_allgather():
    # with locally-biased edges the halo is a small fraction of the rows the
    # all_gather path would move: (D-1) * rows_per per device per layer
    g = _graph(n_vocab=400, n_docs=400, n_edges=6000, seed=5, local_bias=True)
    mesh = make_mesh(8)
    adj = build_halo_adj(g, mesh)
    allgather_rows = (8 - 1) * adj.rows_per
    assert adj.comm_rows_per_device < 0.6 * allgather_rows, (
        adj.comm_rows_per_device,
        allgather_rows,
    )


def test_halo_end_to_end_training():
    g = _graph(seed=9)
    mesh = make_mesh(4)
    t_halo = Trainer(
        GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.5), seed=4, mesh=mesh, halo=True
    )
    t_ref = Trainer(GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.5), seed=4)
    h_halo = t_halo.fit(g, epochs=10, n_classes=3)
    h_ref = t_ref.fit(g, epochs=10, n_classes=3)
    np.testing.assert_allclose(
        [r["loss"] for r in h_halo], [r["loss"] for r in h_ref], rtol=5e-4, atol=1e-5
    )
    m = t_halo.evaluate(g, n_classes=3)
    assert 0.0 <= m["accuracy"] <= 1.0


def test_halo_bf16_compute_dtype():
    # spmm_halo(compute_dtype='bfloat16'): bf16 operands/wire, f32
    # accumulation — close to the f32 result at bf16 tolerance
    from pytextgcn_tpu.parallel.halo import spmm_halo

    g = _graph(seed=13)
    mesh = make_mesh(4)
    adj_h = build_halo_adj(g, mesh)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((g.n_nodes, 8)), jnp.float32
    )
    ref = jax.jit(spmm)(adj_h, x)
    got = jax.jit(lambda a, v: spmm_halo(a, v, compute_dtype="bfloat16"))(adj_h, x)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2)

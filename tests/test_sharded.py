"""Multi-device edge-partitioned SpMM on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.ops import NodeFeatures, NormAdj
from pytextgcn_tpu.ops.spmm import spmm, spmm_segment
from pytextgcn_tpu.parallel import build_sharded_adj, make_mesh
from pytextgcn_tpu.train.metrics import masked_cross_entropy


def make_graph(rng, n_vocab=120, n_docs=130, n_edges=3000):
    n = n_vocab + n_docs
    train_mask = np.zeros(n, bool)
    train_mask[n_vocab : n_vocab + 90] = True
    return TextGraph(
        edge_src=jnp.asarray(rng.integers(0, n, n_edges).astype(np.int32)),
        edge_dst=jnp.asarray(rng.integers(0, n, n_edges).astype(np.int32)),
        edge_w=jnp.asarray(rng.random(n_edges).astype(np.float32) + 0.1),
        y=jnp.asarray(rng.integers(0, 5, n).astype(np.int32)),
        train_mask=jnp.asarray(train_mask),
        val_mask=jnp.asarray(np.zeros(n, bool)),
        test_mask=jnp.asarray(np.zeros(n, bool)),
        n_vocab=n_vocab,
        n_docs=n_docs,
    )


def test_requires_multiple_devices():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"


def test_sharded_spmm_matches_single_device():
    rng = np.random.default_rng(0)
    g = make_graph(rng)
    mesh = make_mesh(8)
    sharded = build_sharded_adj(g, mesh)
    single = NormAdj.from_graph(g)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 24)).astype(np.float32))
    got = spmm(sharded, x)
    want = spmm_segment(single, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_sharded_gradients_match():
    rng = np.random.default_rng(1)
    g = make_graph(rng, n_edges=1000)
    mesh = make_mesh(4)
    sharded = build_sharded_adj(g, mesh)
    single = NormAdj.from_graph(g)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 8)).astype(np.float32))

    def loss(adj_fn, adj, x):
        return jnp.sum(adj_fn(adj, x) ** 2)

    g_sh = jax.grad(lambda v: loss(spmm, sharded, v))(x)
    g_sg = jax.grad(lambda v: loss(spmm_segment, single, v))(x)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_sg), rtol=1e-4, atol=1e-5)


def test_full_train_step_sharded_matches_single():
    """One jitted GCN train step (fwd + bwd + SGD) over the mesh equals the
    single-device step bit-for-bit up to float tolerance."""
    rng = np.random.default_rng(2)
    g = make_graph(rng)
    mesh = make_mesh(8)
    model = GCN(in_dim=g.n_nodes, out_dim=5, n_hidden_gcn=16, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0))
    feats = NodeFeatures.from_graph(g)

    def step(adj, params):
        def loss_fn(p):
            logits = model.apply(p, adj, feats, train=False)
            return masked_cross_entropy(logits, g.y, g.train_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new = jax.tree.map(lambda p, gr: p - 0.1 * gr, params, grads)
        return loss, new

    sharded = build_sharded_adj(g, mesh)
    single = NormAdj.from_graph(g)
    loss_sh, p_sh = jax.jit(lambda p: step(sharded, p))(params)
    loss_sg, p_sg = jax.jit(lambda p: step(single, p))(params)
    np.testing.assert_allclose(float(loss_sh), float(loss_sg), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_sg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

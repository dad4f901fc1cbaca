"""Multi-chunk Pallas plans (bounded gather memory) match the segment path."""

import numpy as np
import jax
import jax.numpy as jnp

import pytextgcn_tpu.ops.spmm_pallas as sp
from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.ops.adjacency import NormAdj
from pytextgcn_tpu.ops.spmm import spmm, spmm_segment


def test_chunked_plan_matches_segment(monkeypatch):
    orig = sp._build_tile_plan

    def tiny_chunks(src, dst, w, n_nodes, max_chunk_tiles=4):
        return orig(src, dst, w, n_nodes, max_chunk_tiles)

    monkeypatch.setattr(sp, "_build_tile_plan", tiny_chunks)

    rng = np.random.default_rng(1)
    n, e = 1500, 20000
    g = TextGraph(
        edge_src=rng.integers(0, n, e).astype(np.int32),
        edge_dst=rng.integers(0, n, e).astype(np.int32),
        edge_w=(rng.random(e) + 0.05).astype(np.float32),
        y=np.zeros(n, np.int32),
        train_mask=np.zeros(n, bool),
        val_mask=np.zeros(n, bool),
        test_mask=np.zeros(n, bool),
        n_vocab=n // 2,
        n_docs=n - n // 2,
    )
    adj_p = NormAdj.from_graph(g, use_pallas=True)
    assert adj_p.plan.fwd.n_chunks > 2
    adj_s = NormAdj.from_graph(g)
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))

    a = jax.jit(lambda aa, v: spmm(aa, v))(adj_p, x)
    b = spmm_segment(adj_s, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    ga = jax.grad(lambda v: jnp.sum(spmm(adj_p, v) ** 2))(x)
    gb = jax.grad(lambda v: jnp.sum(spmm_segment(adj_s, v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-4)

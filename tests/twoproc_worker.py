"""Worker process for the 2-process ``jax.distributed`` CPU test.

Run as ``python twoproc_worker.py <coordinator_addr> <process_id>`` — both
processes form a real jax.distributed process group over gRPC, build a
2-device global mesh (one CPU device per process), and check against
process-local references (VERDICT r2 item 7 widened this from one operator
to the full training path):

  1. one edge-partitioned SpMM (spmm_sharded) vs a host numpy oracle,
  2. a COMPLETE jitted train step — GCN forward, masked-CE backward,
     torch-amsgrad update — over the cross-process mesh, asserting loss,
     gradient and (where the gradient is non-negligible) updated-parameter
     equality with the single-process step each process computes locally,
  3. a halo-exchange SpMM (boundary-only ppermute path) vs the local
     segment SpMM.

Prints ``TWOPROC_OK`` on success. The reference has no distributed support
at all (SURVEY.md §2.4); this exercises the cross-process collective path
the virtual single-process mesh tests cannot.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    addr, pid = sys.argv[1], int(sys.argv[2])

    from pytextgcn_tpu.parallel import init_distributed

    init_distributed(addr, num_processes=2, process_id=pid)

    import jax

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()

    from pytextgcn_tpu.core.graph import TextGraph, gcn_normalize_np
    from pytextgcn_tpu.parallel import (
        build_sharded_adj,
        global_mesh,
        replicate_global,
    )
    from pytextgcn_tpu.parallel.sharded import spmm_sharded

    rng = np.random.default_rng(0)
    n, e, h = 64, 400, 8
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    w = (rng.random(e) + 0.1).astype(np.float32)
    zeros = np.zeros(n, bool)
    g = TextGraph(
        edge_src=src,
        edge_dst=dst,
        edge_w=w,
        y=np.zeros(n, np.int32),
        train_mask=zeros,
        val_mask=zeros,
        test_mask=zeros,
        n_vocab=32,
        n_docs=32,
    )
    mesh = global_mesh()
    assert mesh.shape["graph"] == 2
    adj = build_sharded_adj(g, mesh)
    x_host = rng.standard_normal((n, h)).astype(np.float32)
    x = replicate_global(mesh, x_host)

    out = jax.jit(spmm_sharded)(adj, x)
    out_np = np.asarray(out)  # fully replicated -> locally addressable

    norm_w, self_w = gcn_normalize_np(src, dst, w, n)
    expect = self_w[:, None] * x_host
    np.add.at(expect, dst, norm_w[:, None] * x_host[src])
    np.testing.assert_allclose(out_np, expect, rtol=1e-5, atol=1e-5)

    # ---- 2. full train step across the 2-process mesh --------------------
    import dataclasses

    import jax.numpy as jnp
    import optax

    from pytextgcn_tpu.models import GCN
    from pytextgcn_tpu.ops import NodeFeatures, NormAdj
    from pytextgcn_tpu.train.metrics import masked_cross_entropy
    from pytextgcn_tpu.train.optim import torch_amsgrad

    n_classes = 4
    y_np = np.zeros(n, np.int32)
    y_np[32:] = rng.integers(0, n_classes, n - 32)
    train = np.zeros(n, bool)
    train[32:56] = True
    g = dataclasses.replace(g, y=y_np, train_mask=train)

    feats_local = NodeFeatures.from_graph(g)
    model = GCN(in_dim=g.in_dim, out_dim=n_classes, n_hidden_gcn=16, dropout=0.5)
    params_host = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0)))
    opt = torch_amsgrad(0.05)
    step_rng = jax.random.PRNGKey(1)

    # global arrays must ride as jit ARGUMENTS (closing over a cross-process
    # array is an error), so the step takes the operator/data explicitly
    @jax.jit
    def step(params, opt_state, rng, adj_, feats_, y_, mask_):
        def loss_fn(p):
            logits = model.apply(p, adj_, feats_, train=True, rng=rng)
            return masked_cross_entropy(logits, y_, mask_)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, grads

    # global (cross-process) path: everything replicated except the
    # edge-partitioned adjacency
    adj_sh = build_sharded_adj(g, mesh)
    rep = lambda a: replicate_global(mesh, np.asarray(a))
    params_g = jax.tree.map(rep, params_host)
    feats_g = jax.tree.map(rep, feats_local)
    y_g, mask_g = rep(y_np), rep(train)
    opt_state_g = jax.jit(opt.init)(params_g)
    rng_g = rep(np.asarray(step_rng))
    p2_g, _, loss_g, grads_g = step(
        params_g, opt_state_g, rng_g, adj_sh, feats_g, y_g, mask_g
    )

    # process-local single-device reference (identical on both processes)
    adj_1 = NormAdj.from_graph(g)
    params_l = jax.tree.map(jnp.asarray, params_host)
    opt_state_l = opt.init(params_l)
    p2_l, _, loss_l, grads_l = step(
        params_l, opt_state_l, step_rng, adj_1, feats_local,
        jnp.asarray(y_np), jnp.asarray(train),
    )

    assert abs(float(loss_g) - float(loss_l)) < 1e-4, (float(loss_g), float(loss_l))
    for a, b in zip(jax.tree.leaves(grads_g), jax.tree.leaves(grads_l)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )
    # updated params: compare where the gradient is non-negligible (Adam's
    # first step is ~lr*sign(g), which amplifies epsilon-level summation
    # differences wherever g ~ 0 — same policy as __graft_entry__.py)
    checked = total = 0
    for a, b, gr in zip(
        jax.tree.leaves(p2_g), jax.tree.leaves(p2_l), jax.tree.leaves(grads_l)
    ):
        gr = np.abs(np.asarray(gr))
        sel = gr > 1e-3 * (gr.max() + 1e-30)
        total += gr.size
        checked += int(sel.sum())
        np.testing.assert_allclose(
            np.asarray(a)[sel], np.asarray(b)[sel], rtol=1e-2, atol=1e-4
        )
    assert checked > 0.2 * total, (checked, total)

    # ---- 3. halo-exchange SpMM across the 2-process mesh -----------------
    from pytextgcn_tpu.ops.spmm import spmm as spmm_plain
    from pytextgcn_tpu.parallel import build_halo_adj
    from pytextgcn_tpu.parallel.halo import spmm_halo

    h_adj = build_halo_adj(g, mesh)
    xh_host = rng.standard_normal((n, 16)).astype(np.float32)
    out_halo = jax.jit(spmm_halo)(h_adj, rep(xh_host))
    out_ref = np.asarray(
        jax.jit(spmm_plain)(adj_1, jnp.asarray(xh_host))
    )
    # the halo output stays ROW-SHARDED across the two processes — each
    # process checks exactly the rows it owns against the local reference
    shard = out_halo.addressable_shards[0]
    rows = shard.index[0]
    np.testing.assert_allclose(
        np.asarray(shard.data)[: out_ref[rows].shape[0]],
        out_ref[rows.start : min(rows.stop or n, n)],
        rtol=1e-4, atol=1e-5,
    )

    print("TWOPROC_OK", flush=True)


if __name__ == "__main__":
    main()

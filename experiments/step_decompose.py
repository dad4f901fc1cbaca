"""Decompose the GCN train step's wall time into its components.

VERDICT r2 item 3 (second half): RESULTS.md attributed the ~10% gap between
the hybrid step and its floor to "CE/Adam bookkeeping" with no measurement.
This driver measures it directly — four jitted programs of strictly
increasing scope on the bench graph (bench.py's Zipf corpus through
Text2Graph, hybrid f32 plan):

  spmm4      the step's four SpMM applications alone
             (2 at h=N_HIDDEN, 2 at h=N_CLASSES — layer 1 fwd + its
              transposed bwd, layer 2 fwd + its transposed bwd)
  forward    full training forward incl. dropout + masked CE loss
  fwd_bwd    loss + gradients (jax.value_and_grad)
  full_step  fwd_bwd + the optimizer update (torch_amsgrad)

``full_step - fwd_bwd`` isolates Adam bookkeeping; ``fwd_bwd - spmm4`` is
everything else backward adds (dense XW matmuls, dropout masks, CE +
softmax, intermediate reads). Prints one JSON line.

    python experiments/step_decompose.py            # real chip
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/step_decompose.py --n-docs 2000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--n-docs", type=int, default=20_000)
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--hybrid-k", default="auto")
    args = ap.parse_args(argv)

    import bench
    import jax
    import jax.numpy as jnp
    import optax

    from pytextgcn_tpu.models import GCN
    from pytextgcn_tpu.ops import NodeFeatures, NormAdj
    from pytextgcn_tpu.ops.spmm import spmm
    from pytextgcn_tpu.train.metrics import masked_cross_entropy
    from pytextgcn_tpu.train.optim import torch_amsgrad

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    g = bench.build_graph(args.n_docs)
    hk = "auto" if args.hybrid_k == "auto" else int(args.hybrid_k)
    t0 = time.time()
    adj = NormAdj.from_graph(g, hybrid_k=hk)
    print(f"plan built in {time.time() - t0:.0f}s", file=sys.stderr, flush=True)
    feats = NodeFeatures.from_graph(g)
    model = GCN(in_dim=g.in_dim, out_dim=bench.N_CLASSES,
                n_hidden_gcn=bench.N_HIDDEN, dropout=0.5)
    params = model.init(jax.random.PRNGKey(0))
    opt = torch_amsgrad(0.05)
    opt_state = opt.init(params)
    y = jnp.asarray(g.y)
    mask = jnp.asarray(g.train_mask)
    rng = jax.random.PRNGKey(1)
    rng_np = np.random.default_rng(2)
    x_h = jnp.asarray(rng_np.standard_normal((g.n_nodes, bench.N_HIDDEN)),
                      jnp.float32)
    ct_c = jnp.asarray(rng_np.standard_normal((g.n_nodes, bench.N_CLASSES)),
                       jnp.float32)

    @jax.jit
    def spmm4(adj, x_h, ct_c):
        a = spmm(adj, x_h)  # layer 1 fwd (h=N_HIDDEN)
        b = spmm(adj, a[:, : bench.N_CLASSES])  # layer 2 fwd (h=N_CLASSES)
        c = spmm(adj, ct_c)  # layer 2 bwd (transposed == same op; symmetric)
        d = spmm(adj, c @ jnp.ones((bench.N_CLASSES, bench.N_HIDDEN),
                                   jnp.float32) * 1e-3)  # layer 1 bwd
        return a[:2, :2].sum() + b[:2, :2].sum() + d[:2, :2].sum()

    def loss_fn(p, adj):
        logits = model.apply(p, adj, feats, train=True, rng=rng)
        return masked_cross_entropy(logits, y, mask)

    @jax.jit
    def forward(p, adj):
        return loss_fn(p, adj)

    @jax.jit
    def fwd_bwd(p, adj):
        loss, grads = jax.value_and_grad(loss_fn)(p, adj)
        return loss, grads

    @jax.jit
    def full_step(p, s, adj):
        loss, grads = jax.value_and_grad(loss_fn)(p, adj)
        updates, s2 = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s2, loss

    def timeit(fn, fetch):
        fetch(fn())  # compile
        for _ in range(3):
            fetch(fn())
        t0 = time.time()
        for _ in range(args.repeats):
            out = fn()
        fetch(out)
        return (time.time() - t0) / args.repeats

    t_spmm4 = timeit(lambda: spmm4(adj, x_h, ct_c), lambda o: float(o))
    t_forward = timeit(lambda: forward(params, adj), lambda o: float(o))
    t_fwd_bwd = timeit(lambda: fwd_bwd(params, adj), lambda o: float(o[0]))
    t_full = timeit(lambda: full_step(params, opt_state, adj),
                    lambda o: float(o[2]))

    out = {
        "n_docs": args.n_docs, "n_nodes": g.n_nodes, "n_edges": g.n_edges,
        "hybrid_k": getattr(adj.plan, "k", None),
        "ms": {
            "spmm4": round(t_spmm4 * 1e3, 3),
            "forward": round(t_forward * 1e3, 3),
            "fwd_bwd": round(t_fwd_bwd * 1e3, 3),
            "full_step": round(t_full * 1e3, 3),
        },
        "breakdown_ms": {
            "adam_update": round((t_full - t_fwd_bwd) * 1e3, 3),
            "backward_extra": round((t_fwd_bwd - t_forward) * 1e3, 3),
            "fwd_nonspmm": round((t_forward - t_spmm4 / 2) * 1e3, 3),
        },
        "adam_fraction_of_step": round((t_full - t_fwd_bwd) / t_full, 4),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()

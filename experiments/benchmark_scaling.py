"""Edges/s scaling harness: sharded SpMM across 1..N mesh devices.

Measures the edge-partitioned aggregation's throughput as the mesh grows
(the BASELINE.md scaling-efficiency metric). On one physical chip this runs
on the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N)
to validate the scaling *structure*; on a real pod slice the same code
measures real ICI scaling.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python experiments/benchmark_scaling.py --n-edges 2000000
"""

import argparse
import sys
import time

import numpy as np

from common import load_corpus  # noqa: F401  (path setup)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-nodes", type=int, default=50_000)
    p.add_argument("--n-edges", type=int, default=1_000_000)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--devices", type=int, nargs="+", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pytextgcn_tpu.core.graph import TextGraph
    from pytextgcn_tpu.ops.spmm import spmm
    from pytextgcn_tpu.parallel import build_sharded_adj, make_mesh

    n_dev_avail = len(jax.devices())
    dev_counts = args.devices or [d for d in (1, 2, 4, 8) if d <= n_dev_avail]

    rng = np.random.default_rng(0)
    n, e = args.n_nodes, args.n_edges
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
    x = jnp.asarray(rng.standard_normal((n, args.hidden)).astype(np.float32))

    base_rate = None
    for d in dev_counts:
        mesh = make_mesh(d)
        adj = build_sharded_adj(g, mesh)
        fn = jax.jit(lambda a, v: spmm(a, v))
        out = fn(adj, x)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.repeats):
            out = fn(adj, x)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.repeats
        rate = e / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d)
        print(
            f"devices={d}: {dt * 1e3:8.2f} ms  {rate / 1e6:8.2f} Medges/s  "
            f"scaling efficiency {eff * 100:5.1f}%"
        )


if __name__ == "__main__":
    main()

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
import re
import sys
import time

import numpy as np

from common import load_corpus  # noqa: F401  (path setup)


_COLLECTIVES = ("all-gather", "collective-permute", "all-reduce",
                "reduce-scatter", "all-to-all")
_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def hlo_collective_bytes(compiled_text: str, n_dev: int) -> dict:
    """Audit the compiled HLO for cross-device traffic (VERDICT r4 item 7).

    Parses every collective op's OUTPUT shape out of the compiled module
    and derives per-device wire bytes with the standard ring formulas:
    all-gather moves (d-1)/d of the gathered buffer per device,
    collective-permute sends its full buffer, all-reduce ~2(d-1)/d (ring
    reduce-scatter + all-gather), reduce-scatter (d-1)/d. This is what XLA
    will actually put on the interconnect — measurable without real ICI,
    and directly comparable to the O(K + halo-rows) comm model in
    parallel/hybrid_sharded.py."""
    per_op = {}
    shape_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(?:\()?([a-z0-9]+)\[([\d,]*)\][^=]*?"
        r"(" + "|".join(_COLLECTIVES) + r")\(", re.M)
    for m in shape_re.finditer(compiled_text):
        dtype, dims, op = m.group(1), m.group(2), m.group(3)
        if dtype not in _DTYPE_BYTES:
            continue
        size = _DTYPE_BYTES[dtype]
        for dim in dims.split(","):
            if dim:
                size *= int(dim)
        if op == "all-gather":
            wire = size * (n_dev - 1) // n_dev
        elif op == "all-reduce":
            wire = 2 * size * (n_dev - 1) // n_dev
        elif op == "reduce-scatter":
            wire = size * (n_dev - 1) // n_dev
        else:  # collective-permute / all-to-all: buffer leaves the device
            wire = size
        per_op[op] = per_op.get(op, 0) + wire
    per_op["total"] = sum(per_op.values())
    return per_op


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-nodes", type=int, default=50_000)
    p.add_argument("--n-edges", type=int, default=1_000_000)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--devices", type=int, nargs="+", default=None)
    p.add_argument(
        "--local-frac", type=float, default=0.8,
        help="fraction of edges whose endpoints share a shard (text graphs "
        "partitioned well have high locality; 0 = uniform random)",
    )
    p.add_argument(
        "--hot-k", default="2048",
        help="'off' | 'auto' | int — hot-set size for the hybrid-sharded "
        "mode (dense-hot MXU blocks + halo'd cold residual)",
    )
    p.add_argument(
        "--audit-comm", action="store_true",
        help="parse the compiled HLO for collective ops and report the "
        "derived per-device wire bytes next to the comm model's "
        "prediction (VERDICT r4 item 7 — runs fine on the virtual mesh)",
    )
    p.add_argument(
        "--bench-graph", action="store_true",
        help="use the real bench.py graph (Text2Graph over the Zipf corpus "
        "at docs=20000, E~8.8M) instead of the synthetic random graph — "
        "the scale every recorded BENCH number uses",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pytextgcn_tpu.core.graph import TextGraph
    from pytextgcn_tpu.ops.spmm import pad_rows, spmm
    from pytextgcn_tpu.parallel import (
        build_halo_adj,
        build_hybrid_sharded_adj,
        build_sharded_adj,
        make_mesh,
    )
    from pytextgcn_tpu.parallel.halo import spmm_halo

    n_dev_avail = len(jax.devices())
    dev_counts = args.devices or [d for d in (1, 2, 4, 8) if d <= n_dev_avail]

    rng = np.random.default_rng(0)
    n, e = args.n_nodes, args.n_edges
    # symmetric pairs (real normalized text adjacencies store both
    # directions — the hybrid decomposition's transposed-D term relies on
    # it); Zipfian endpoint skew gives the hot set something to absorb
    half = e // 2
    zipf_p = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** 1.05
    zipf_p /= zipf_p.sum()
    a = rng.choice(n, half, p=zipf_p).astype(np.int32)
    # locality: most counterparts land in the endpoint's region (graphs
    # partitioned by a locality-aware order behave like this); the rest
    # are uniform — those form the halo
    local = rng.random(half) < args.local_frac
    region = 2048
    b = np.where(
        local,
        (a + rng.integers(-region, region, half)) % n,
        rng.integers(0, n, half),
    ).astype(np.int32)
    w_half = (rng.random(half) + 0.05).astype(np.float32)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    e = len(src)
    if args.bench_graph:
        import os

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import build_graph

        g = build_graph(20_000)
        n, e = g.n_nodes, g.n_edges
    else:
        g = TextGraph(
            edge_src=src,
            edge_dst=dst,
            edge_w=np.concatenate([w_half, w_half]),
            y=np.zeros(n, np.int32),
            train_mask=np.zeros(n, bool),
            val_mask=np.zeros(n, bool),
            test_mask=np.zeros(n, bool),
            n_vocab=n // 2,
            n_docs=n - n // 2,
        )
    x = jnp.asarray(rng.standard_normal((n, args.hidden)).astype(np.float32))
    row_bytes = args.hidden * 4

    hot_k = args.hot_k if args.hot_k in ("off", "auto") else int(args.hot_k)

    base_rate = None
    for d in dev_counts:
        mesh = make_mesh(d)
        rows_per = -(-n // d)
        for name in ("allgather", "halo", "hybrid"):
            if name == "allgather":
                adj = build_sharded_adj(g, mesh)
                fn = jax.jit(lambda a, v: spmm(a, v))
                # all_gather reassembles the full activation on every device
                comm_rows = (d - 1) * rows_per
            elif name == "halo":
                if d == 1:
                    continue
                adj = build_halo_adj(g, mesh)
                fn = jax.jit(lambda a, v: spmm_halo(a, pad_rows(a, v)))
                comm_rows = adj.comm_rows_per_device
            else:
                if d == 1 or hot_k == "off":
                    continue
                adj = build_hybrid_sharded_adj(g, mesh, hot_k=hot_k)
                if adj is None:  # cost model: no exploitable hot set
                    continue
                # padded activations, like the trainer (ops/spmm.pad_rows)
                fn = jax.jit(lambda a, v: spmm(a, pad_rows(a, v)))
                comm_rows = adj.comm_rows_per_device
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
            audit = ""
            if args.audit_comm:
                txt = fn.lower(adj, x).compile().as_text()
                wire = hlo_collective_bytes(txt, d)
                ops = " ".join(
                    f"{k}={v / 1e6:.2f}MB" for k, v in sorted(wire.items())
                    if k != "total" and v
                )
                audit = (f"  | HLO wire/dev {wire['total'] / 1e6:7.2f} MB "
                         f"({ops or 'none'})")
            print(
                f"devices={d} {name:9s}: {dt * 1e3:8.2f} ms  "
                f"{rate / 1e6:8.2f} Medges/s  eff {eff * 100:5.1f}%  "
                f"model comm/dev {comm_rows * row_bytes / 1e6:7.2f} MB/SpMM"
                f"{audit}"
            )


if __name__ == "__main__":
    main()

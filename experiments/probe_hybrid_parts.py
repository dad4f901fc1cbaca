"""Component-level timing of the hybrid SpMM at bench scale (VERDICT r3
item 6 groundwork).

The slope-timed probes (ops/probe.py, post-r3 fix) put this chip's true
ceilings far above the r2 constants: gather 1.41 ns/row (was 2.34), dense
D-read 437 GB/s at H=128 (was 220), MXU f32 HIGHEST 31 TF/s (was 14.5).
Against those, the recorded f32 step (39.4 ms at E=8.8M) is only ~47% of
achievable — ~20 ms of the step is NOT floor. This driver times each piece
of one hybrid application in isolation (slope-timed chains, overhead-free):

  dense_pair   D @ x_hot + D^T @ x            (the two big matmuls)
  a_hh         A_hh @ x_hot + scatter-add at hot rows
  resid        the cold-cold residual alone (tile kernel or segment)
  full         spmm_hybrid composed
  K sweep      full, at several hot-set sizes / resid modes

    python experiments/probe_hybrid_parts.py --n-docs 20000
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
    ap.add_argument("--h", type=int, default=100)
    ap.add_argument("--ks", type=int, nargs="+",
                    default=[4096, 8192, 12288, 16384])
    ap.add_argument("--resid-modes", nargs="+", default=["pallas", "segment"])
    args = ap.parse_args(argv)

    import bench
    import jax
    import jax.numpy as jnp

    from pytextgcn_tpu.ops import NormAdj
    from pytextgcn_tpu.ops.hybrid import HybridPlan
    from pytextgcn_tpu.ops.probe import slope_time
    from pytextgcn_tpu.ops.spmm import spmm

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    g = bench.build_graph(args.n_docs)
    h = args.h
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((g.n_nodes, h)), jnp.float32)
    prec = jax.lax.Precision.HIGHEST

    def chain(body, *ops):
        """slope-timed ms per application of ``body(x, *ops) -> x-shaped``.

        ``ops`` (plan pytrees / big device arrays) ride as jit ARGUMENTS:
        closing over them would embed d_full (~677 MB) as a compile-time
        constant, which the axon remote-compile relay rejects (HTTP 413)."""

        def make(length):
            @jax.jit
            def many(x, *ops):
                def f(x, _):
                    out = body(x, *ops)
                    # keep the chain square + data-dependent
                    return (x + 1e-12 * out[:1, :1].sum()).astype(x.dtype), None

                x, _ = jax.lax.scan(f, x, None, length=length)
                return x

            return many, (x0, *ops)

        return slope_time(make) * 1e3

    results = {}
    for k in args.ks:
        for mode in args.resid_modes:
            t0 = time.time()
            adj = NormAdj.from_graph(g, hybrid_k=k, hybrid_resid=mode,
                                     plan_cache=".plan_cache")
            plan = adj.plan
            if not isinstance(plan, HybridPlan):
                continue
            build_s = time.time() - t0
            tag = f"K={plan.k}/{mode}"

            full_ms = chain(lambda x, adj: spmm(adj, x), adj)

            n = plan.n_nodes

            def dense_pair(x, d_full, hot_ids, n=n):
                x_hot = jnp.take(x, hot_ids, axis=0)
                out = jnp.dot(d_full, x_hot,
                              preferred_element_type=jnp.float32,
                              precision=prec)[:n]
                hot_in = jax.lax.dot_general(
                    d_full[:n], x, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                return out.at[hot_ids].add(hot_in)

            pair_ms = chain(dense_pair, plan.d_full, plan.hot_ids)

            def resid_only(x, plan):
                out = jnp.zeros_like(x)
                if plan.res_fwd is not None:
                    from pytextgcn_tpu.ops.spmm_pallas import _spmm_pallas

                    out = out + _spmm_pallas(x, plan.res_fwd, plan.res_bwd,
                                             jnp.float32)
                if plan.seg_src is not None:
                    contrib = plan.seg_w[:, None] * jnp.take(
                        x, plan.seg_src, axis=0)
                    out = out + jax.ops.segment_sum(
                        contrib, plan.seg_dst, num_segments=plan.n_nodes)
                return out

            resid_ms = chain(resid_only, plan)
            results[tag] = {
                "full_ms": round(full_ms, 3),
                "dense_pair_ms": round(pair_ms, 3),
                "resid_ms": round(resid_ms, 3),
                "unaccounted_ms": round(full_ms - pair_ms - resid_ms, 3),
                "n_resid": plan.n_resid,
                "plan_s": round(build_s, 1),
            }
            print(f"{tag}: full {full_ms:.2f} ms = dense {pair_ms:.2f} + "
                  f"resid {resid_ms:.2f} (n_resid {plan.n_resid/1e6:.2f}M) "
                  f"+ other {full_ms - pair_ms - resid_ms:.2f} "
                  f"[plan {build_s:.0f}s]", flush=True)

    print(json.dumps({"n_docs": args.n_docs, "h": h, "E": g.n_edges,
                      "N": g.n_nodes, "results": results}), flush=True)
    return results


if __name__ == "__main__":
    main()

"""Chip sweep of the Pallas tile kernel's geometry and f32 MXU strategy
(VERDICT r3 item 6 follow-through).

probe_hybrid_parts.py decomposed the bench-scale hybrid application
(K=4096, E=8.8M, H=100): dense pair 3.22 ms (at its roofline — scales
linearly in K at ~27 TF/s / ~420 GB/s effective) and residual 6.07 ms for
0.99M cold-cold edges — 6.1 ns/edge against the 1.41 ns/row gather floor.
The residual kernel's cost is ``passes * 2 * row_block * h_pad`` MXU flops
per edge slot, so this driver sweeps the two knobs that divide that number:

  row_block 256 -> 128   halves the one-hot matmul flops (more per-block
                         padding in exchange);
  f32 'highest'->'split2' two exact-one-hot bf16 passes instead of three
                         (weights pre-folded into the gathered rows).

Each variant is slope-timed (fwd tile-plan application) and checked for
max relative error against a float64 segment-sum oracle on random inputs.

    python experiments/probe_resid_kernel.py --n-docs 20000 --k 4096
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
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--h", type=int, default=100)
    ap.add_argument("--geoms", nargs="+",
                    default=["256x1024", "128x1024", "128x512", "256x512"])
    ap.add_argument("--modes", nargs="+", default=["highest", "split2"])
    ap.add_argument("--grad", action="store_true",
                    help="time one fwd + one transposed (VJP) application "
                    "per iteration instead of fwd only — the train step's "
                    "actual usage (2 fwd + 2 bwd residuals per step)")
    args = ap.parse_args(argv)

    import bench
    import jax
    import jax.numpy as jnp

    from pytextgcn_tpu.ops import NormAdj
    from pytextgcn_tpu.ops.probe import slope_time
    from pytextgcn_tpu.ops.spmm_pallas import _build_tile_plan, _spmm_pallas

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    g = bench.build_graph(args.n_docs)
    # the segment-mode hybrid plan carries the residual COO directly
    adj = NormAdj.from_graph(g, hybrid_k=args.k, hybrid_resid="segment",
                             plan_cache=".plan_cache")
    plan = adj.plan
    src = np.asarray(plan.seg_src)
    dst = np.asarray(plan.seg_dst)
    w = np.asarray(plan.seg_w)
    n = plan.n_nodes
    print(f"residual: {len(src)/1e6:.2f}M edges over {n} nodes", flush=True)

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((n, args.h)).astype(np.float32)
    x0 = jnp.asarray(x_np)

    # float64 oracle for error measurement
    want = np.zeros((n, args.h), np.float64)
    np.add.at(want, dst, w[:, None].astype(np.float64) * x_np[src])
    scale = np.abs(want).max()

    def chain(fwd, bwd):
        def make(length):
            @jax.jit
            def many(x, fwd, bwd):
                def f(x, _):
                    if args.grad:
                        # one fwd + one transposed application per iteration
                        # (the custom VJP applies `bwd` to the cotangent) —
                        # the step's actual usage shape
                        val, g = jax.value_and_grad(
                            lambda x: _spmm_pallas(
                                x, fwd, bwd, jnp.float32).sum()
                        )(x)
                        return (x + 1e-12 * val + 1e-12 * g[:1, :1].sum()
                                ).astype(x.dtype), None
                    out = _spmm_pallas(x, fwd, bwd, jnp.float32)
                    return (x + 1e-12 * out[:1, :1].sum()).astype(x.dtype), None

                x, _ = jax.lax.scan(f, x, None, length=length)
                return x

            return many, (x0, fwd, bwd)

        return slope_time(make) * 1e3

    results = {}
    for geom in args.geoms:
        rb, et = (int(v) for v in geom.split("x"))
        for mode in args.modes:
            t0 = time.time()
            fwd = _build_tile_plan(src, dst, w, n, row_block=rb, edge_tile=et,
                                   f32_mode=mode)
            bwd = _build_tile_plan(dst, src, w, n, row_block=rb, edge_tile=et,
                                   f32_mode=mode)
            build_s = time.time() - t0
            slots = fwd.n_tiles * et
            got = np.asarray(
                jax.jit(lambda x, f, b: _spmm_pallas(x, f, b, jnp.float32))(
                    x0, fwd, bwd
                )
            )
            err = float(np.abs(got - want).max() / scale)
            ms = chain(fwd, bwd)
            tag = f"{geom}/{mode}"
            results[tag] = {
                "ms": round(ms, 3),
                "ns_per_edge": round(ms * 1e6 / len(src), 2),
                "pad_factor": round(slots / len(src), 2),
                "max_rel_err": err,
                "build_s": round(build_s, 1),
            }
            print(f"{tag}: {ms:.2f} ms ({ms*1e6/len(src):.2f} ns/edge, "
                  f"pad {slots/len(src):.2f}x, err {err:.2e}) "
                  f"[build {build_s:.0f}s]", flush=True)

    print(json.dumps({"n_edges": len(src), "h": args.h, "k": args.k,
                      "results": results}), flush=True)
    return results


if __name__ == "__main__":
    main()

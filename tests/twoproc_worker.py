"""Worker process for the 2-process ``jax.distributed`` CPU test.

Run as ``python twoproc_worker.py <coordinator_addr> <process_id>`` — both
processes form a real jax.distributed process group over gRPC, build a
2-device global mesh (one CPU device per process), run one edge-partitioned
SpMM through :func:`pytextgcn_tpu.parallel.sharded.spmm_sharded`, and check
the (replicated) result against a host numpy oracle. Prints ``TWOPROC_OK``
on success. The reference has no distributed support at all (SURVEY.md
§2.4); this exercises the cross-process collective path the virtual
single-process mesh tests cannot.
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
    print("TWOPROC_OK", flush=True)


if __name__ == "__main__":
    main()

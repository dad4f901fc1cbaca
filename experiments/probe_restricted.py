"""On-chip probe: where does the masked-head step's time go?

Times, at bench scale (Text2Graph zipf graph), chained + scalar-synced:
  * the full hybrid SpMM application (fwd) at widths 100 and 43,
  * the restricted SpMM application (fwd) across hot-K candidates,
  * fwd+bwd pairs of both,
so the restricted head's measured cost can be compared against its modeled
floor (ops/restricted.py) and the full application it replaces.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from pytextgcn_tpu.ops import NormAdj
from pytextgcn_tpu.ops.restricted import build_restricted_adj, spmm_restricted
from pytextgcn_tpu.ops.spmm import spmm


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, *args, reps=12):
    out = fn(*args)
    _ = float(jnp.sum(out))  # compile + sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.time() - t0) / reps


def main():
    from bench import build_graph

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    g = build_graph(n_docs)
    rows = np.flatnonzero(np.asarray(g.train_mask))
    log(f"N={g.n_nodes} E={g.n_edges} M={len(rows)}")

    full = NormAdj.from_graph(g, hybrid_k="auto")
    log(f"full hybrid K={full.plan.k} floor={full.plan.floor_spmm_ns/1e6:.2f} ms")
    rng = np.random.default_rng(0)

    for h in (100, 43):
        x = jnp.asarray(rng.standard_normal((g.n_nodes, h)), jnp.float32)
        f = jax.jit(lambda a, v: spmm(a, v))
        dt = timed(f, full, x)
        log(f"full fwd H={h}: {dt*1e3:.2f} ms")
        fb = jax.jit(
            lambda a, v: jax.grad(lambda u: jnp.sum(spmm(a, u) ** 2))(v)
        )
        dt = timed(fb, full, x)
        log(f"full fwd+bwd H={h}: {dt*1e3:.2f} ms")

    x43 = jnp.asarray(rng.standard_normal((g.n_nodes, 43)), jnp.float32)
    for k, rm in (
        ("auto", "auto"), (2048, "auto"), (4096, "auto"), (8192, "auto"),
        (4096, "pallas"), (4096, "segment"),
    ):
        t0 = time.time()
        r = build_restricted_adj(g, rows, hot_k=k, resid_mode=rm)
        b = time.time() - t0
        resid = (
            "tiles" if r.res_fwd is not None
            else ("segment" if r.seg_src is not None else "none")
        )
        log(
            f"restricted K={r.k} (req {k}, {rm}): "
            f"floor={r.floor_spmm_ns/1e6:.2f} ms (build {b:.0f}s, resid={resid})"
        )
        f = jax.jit(lambda a, v: spmm_restricted(a, v))
        dt = timed(f, r, x43)
        log(f"  fwd H=43: {dt*1e3:.2f} ms")
        fb = jax.jit(
            lambda a, v: jax.grad(lambda u: jnp.sum(spmm_restricted(a, u) ** 2))(v)
        )
        dt = timed(fb, r, x43)
        log(f"  fwd+bwd H=43: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()

"""Chip measurement harness for the SpMM redesign (round 2).

Measures, on the real TPU chip:
  * the raw row-gather speed of light (jnp.take of E random rows) — the
    hard floor under any gather-based SpMM formulation,
  * dense NxK @ KxH matmul rates at the precisions the hybrid path uses,
  * per-SpMM forward time for the Pallas tile kernel vs the hybrid
    decomposition at several hot-set sizes, on (a) the round-1 beta-skew
    random graph and (b) a Zipfian corpus built through Text2Graph.

Timing: R applications of the operator chained inside one lax.scan (the
symmetric normalization keeps the spectral radius <= 1, so no rescaling is
needed), synced by a scalar fetch — block_until_ready does not synchronize
through the axon relay. Results feed RESULTS.md and the cost constants in
ops/hybrid.py.

    python experiments/chip_probe.py gather dense beta zipf
"""

import sys
import time

import numpy as np

R = 16
H = 128


def log(msg):
    print(msg, flush=True)


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.abs(x[:2, :2])))


def timed(fn, *args, reps=3):
    out = fn(*args)
    sync(out)  # compile + settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        best = min(best, time.time() - t0)
    return best


def beta_graph(n_vocab=30_000, n_docs=20_000, n_edges=2_000_000):
    from pytextgcn_tpu.core.graph import TextGraph

    rng = np.random.default_rng(0)
    n = n_vocab + n_docs
    # half the edges drawn, then mirrored: hybrid's dense-hot decomposition
    # requires a weight-symmetric adjacency (ops/hybrid.py), like the real
    # Text2Graph output; total edge count stays n_edges
    m = n_edges // 2
    a = (n * rng.beta(0.6, 2.0, m)).astype(np.int32) % n
    b = (n * rng.beta(0.6, 2.0, m)).astype(np.int32) % n
    hw = (rng.random(m) + 0.05).astype(np.float32)
    zeros = np.zeros(n, bool)
    return TextGraph(
        edge_src=np.concatenate([a, b]), edge_dst=np.concatenate([b, a]),
        edge_w=np.concatenate([hw, hw]),
        y=np.zeros(n, np.int32), train_mask=zeros, val_mask=zeros,
        test_mask=zeros, n_vocab=n_vocab, n_docs=n_docs,
    )


def zipf_graph(n_docs=8000, v_draw=40_000, alpha=1.05, seed=0):
    from pytextgcn_tpu import Text2Graph

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, v_draw + 1)
    p = 1.0 / ranks**alpha
    p /= p.sum()
    words = np.array([f"w{i}" for i in range(v_draw)])
    docs = []
    for _ in range(n_docs):
        length = max(5, int(rng.lognormal(4.0, 0.6)))
        docs.append(" ".join(words[rng.choice(v_draw, size=length, p=p)]))
    t0 = time.time()
    g = Text2Graph(min_df=5, window_size=20, rm_stopwords=False).fit_transform(
        docs, [0] * len(docs)
    )
    log(f"zipf graph: N={g.n_nodes} E={g.n_edges} (built in {time.time()-t0:.1f}s)")
    return g


def run_gather():
    import jax
    import jax.numpy as jnp

    n, e = 50_000, 2_000_000
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))

    for dtype in (jnp.float32, jnp.bfloat16):
        x0 = jnp.asarray(rng.standard_normal((n, H)), dtype)

        @jax.jit
        def many(x, idx):
            def body(x, _):
                g = jnp.take(x, idx, axis=0)
                # fold the gathered block back so the chain depends on it
                return x + 1e-12 * g[:2].sum(0, keepdims=True).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=R)
            return x

        dt = timed(many, x0, idx) / R
        gbps = e * H * np.dtype(dtype).itemsize / dt / 1e9
        log(f"gather {jnp.dtype(dtype).name}: {dt*1e3:.2f} ms for {e} rows "
            f"({e/dt/1e9:.3f} Grows/s, payload {gbps:.0f} GB/s)")


def run_dense():
    import jax
    import jax.numpy as jnp

    n, k = 50_048, 2048
    rng = np.random.default_rng(2)
    for dtype, prec in (
        (jnp.float32, jax.lax.Precision.HIGHEST),
        (jnp.float32, jax.lax.Precision.HIGH),
        (jnp.float32, jax.lax.Precision.DEFAULT),
        (jnp.bfloat16, jax.lax.Precision.DEFAULT),
    ):
        d = jnp.asarray(rng.standard_normal((n, k)) / 100, dtype)
        x0 = jnp.asarray(rng.standard_normal((k, H)), dtype)

        @jax.jit
        def many(d, x):
            def body(x, _):
                out = jnp.dot(d, x, preferred_element_type=jnp.float32,
                              precision=prec)
                # contract back to (k, H) to keep the chain square
                nxt = jax.lax.dot_general(
                    d, out, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ) / n
                return nxt.astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=R)
            return x

        dt = timed(many, d, x0) / (2 * R)  # two matmuls per iteration
        bytes_ = n * k * np.dtype(dtype).itemsize
        log(f"dense {jnp.dtype(dtype).name}/{prec}: {dt*1e3:.3f} ms per "
            f"(N,K)@(K,H) (D read at {bytes_/dt/1e9:.0f} GB/s, "
            f"{2*n*k*H/dt/1e12:.1f} TFLOP/s)")


def run_graph(g, tag, variants):
    import jax
    import jax.numpy as jnp

    from pytextgcn_tpu.ops.adjacency import NormAdj
    from pytextgcn_tpu.ops.hybrid import HybridPlan
    from pytextgcn_tpu.ops.spmm import spmm

    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal((g.n_nodes, H)).astype(np.float32))

    @jax.jit
    def many(adj, x):
        def body(x, _):
            return spmm(adj, x), None

        x, _ = jax.lax.scan(body, x, None, length=R)
        return x

    for name, kwargs in variants:
        t0 = time.time()
        adj = NormAdj.from_graph(g, **kwargs)
        build = time.time() - t0
        extra = ""
        if isinstance(adj.plan, HybridPlan):
            p = adj.plan
            res = 0 if p.res_fwd is None else p.res_fwd.n_tiles * 1024
            extra = f" [K={p.k}, resid_tiles~{res} slots]"
        dt = timed(many, adj, x0) / R
        log(f"{tag} {name}: {dt*1e3:.3f} ms/SpMM "
            f"({g.n_edges/dt/1e9:.3f} Gedges/s){extra} (plan build {build:.0f}s)")


def main():
    stages = sys.argv[1:] or ["gather", "dense", "beta", "zipf"]
    import jax

    log(f"backend: {jax.default_backend()} {jax.devices()}")
    if "gather" in stages:
        run_gather()
    if "dense" in stages:
        run_dense()
    if "beta" in stages:
        g = beta_graph()
        run_graph(
            g, "beta(E=2M)",
            [
                ("pallas f32", dict(use_pallas=True)),
                ("hybrid K=2048 f32", dict(hybrid_k=2048)),
                ("hybrid K=8192 f32", dict(hybrid_k=8192)),
            ],
        )
    if "zipf" in stages:
        g = zipf_graph()
        run_graph(
            g, "zipf(T2G)",
            [
                ("segment f32", dict()),
                ("pallas f32", dict(use_pallas=True)),
                ("hybrid K=1024 f32", dict(hybrid_k=1024)),
                ("hybrid K=2048 f32", dict(hybrid_k=2048)),
                ("hybrid K=4096 f32", dict(hybrid_k=4096)),
                ("hybrid K=2048 bf16", dict(hybrid_k=2048, pallas_dtype="bfloat16")),
                ("pallas bf16", dict(use_pallas=True, pallas_dtype="bfloat16")),
            ],
        )


if __name__ == "__main__":
    main()

"""Benchmark: full-batch TextGCN training-step throughput on one chip.

Measures the per-epoch hot path (SURVEY.md §3.1/§3.3): a jitted train step —
2-layer GCN forward, masked-CE backward, Adam(amsgrad) update — over an
Amazon-scale random graph, with the sparse aggregation running in the Pallas
tile kernel. One GCN train step traverses every edge 4x (2 layers forward +
2 transposed SpMMs in backward), so the headline metric is edge-traversals/s.

``vs_baseline`` is the speedup over the identical train step with the
aggregation on XLA's gather/scatter path (jax.ops.segment_sum) — the role
torch-scatter plays in the reference; the reference itself publishes no
wall-clock numbers (BASELINE.md).

Prints exactly one JSON line on stdout; progress goes to stderr.
"""

import json
import sys
import time

import numpy as np

N_VOCAB = 30_000
N_DOCS = 20_000
N_EDGES = 2_000_000
N_HIDDEN = 100
N_CLASSES = 43  # Amazon Cat2
EPOCHS_MEASURED = 20


def scale_for_backend():
    """TPU gets the full Amazon-scale problem; CPU (local smoke runs) a
    reduced one so the benchmark completes in seconds."""
    global N_VOCAB, N_DOCS, N_EDGES, EPOCHS_MEASURED
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        N_VOCAB, N_DOCS, N_EDGES, EPOCHS_MEASURED = 6_000, 4_000, 200_000, 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_graph():
    from pytextgcn_tpu.core.graph import TextGraph

    rng = np.random.default_rng(0)
    n = N_VOCAB + N_DOCS
    # skewed degree distribution like a real word-doc graph
    src = (n * rng.beta(0.6, 2.0, N_EDGES)).astype(np.int32) % n
    dst = (n * rng.beta(0.6, 2.0, N_EDGES)).astype(np.int32) % n
    train_mask = np.zeros(n, bool)
    train_mask[N_VOCAB : N_VOCAB + int(N_DOCS * 0.7)] = True
    test_mask = np.zeros(n, bool)
    test_mask[N_VOCAB + int(N_DOCS * 0.8) :] = True
    return TextGraph(
        edge_src=src,
        edge_dst=dst,
        edge_w=(rng.random(N_EDGES) + 0.05).astype(np.float32),
        y=rng.integers(0, N_CLASSES, n).astype(np.int32),
        train_mask=train_mask,
        val_mask=np.zeros(n, bool),
        test_mask=test_mask,
        n_vocab=N_VOCAB,
        n_docs=N_DOCS,
    )


def time_step(step_fn, params, opt_state, rng, repeats):
    import jax

    # compile + warmup (remote backends need several steps to settle);
    # the float() fetches force real synchronization — block_until_ready
    # alone under-reports through relay tunnels
    p, s, loss = step_fn(params, opt_state, rng)
    for _ in range(4):
        p, s, loss = step_fn(p, s, rng)
    _ = float(loss)
    t0 = time.time()
    for _ in range(repeats):
        p, s, loss = step_fn(p, s, rng)
    final = float(loss)
    return (time.time() - t0) / repeats, final


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from pytextgcn_tpu.models import GCN
    from pytextgcn_tpu.ops import NodeFeatures, NormAdj
    from pytextgcn_tpu.train.metrics import masked_cross_entropy

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    scale_for_backend()
    g = build_graph()
    feats = NodeFeatures.from_graph(g)
    model = GCN(in_dim=g.in_dim, out_dim=N_CLASSES, n_hidden_gcn=N_HIDDEN, dropout=0.5)
    y = jnp.asarray(g.y)
    mask = jnp.asarray(g.train_mask)
    opt = optax.amsgrad(0.05)

    # adj rides as a jit ARGUMENT: closed-over arrays would be embedded as
    # constants in the compiled program (and in the remote-compile request
    # body, which has a hard size limit on tunneled backends)
    @jax.jit
    def step_fn(adj, params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(p, adj, feats, train=True, rng=rng)
            return masked_cross_entropy(logits, y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    def make_step(adj):
        return lambda params, opt_state, rng: step_fn(adj, params, opt_state, rng)

    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(1)

    log("building segment-path adjacency (baseline)...")
    t0 = time.time()
    adj_seg = NormAdj.from_graph(g, use_pallas=False)
    log(f"  {time.time() - t0:.1f}s")
    seg_dt, seg_loss = time_step(make_step(adj_seg), params, opt_state, rng, EPOCHS_MEASURED)
    log(f"segment step: {seg_dt * 1e3:.2f} ms (loss {seg_loss:.3f})")

    log("building pallas plan...")
    t0 = time.time()
    value_dt = seg_dt
    used = "segment"
    try:
        adj_pal = NormAdj.from_graph(g, use_pallas=True)
        log(f"  {time.time() - t0:.1f}s")
        pal_dt, pal_loss = time_step(
            make_step(adj_pal), params, opt_state, rng, EPOCHS_MEASURED
        )
        log(f"pallas step: {pal_dt * 1e3:.2f} ms (loss {pal_loss:.3f})")
        if pal_dt < seg_dt:
            value_dt, used = pal_dt, "pallas"
    except Exception as e:  # pallas unavailable on this backend
        log(f"pallas path failed ({type(e).__name__}: {e}); reporting segment path")

    traversals_per_step = 4 * N_EDGES  # 2 fwd SpMMs + 2 transposed bwd SpMMs
    value = traversals_per_step / value_dt
    log(f"best path: {used}, {value / 1e9:.3f} G edge-traversals/s")
    print(
        json.dumps(
            {
                "metric": "gcn_train_step_edge_traversals_per_s",
                "value": round(value, 1),
                "unit": "edges/s",
                "vs_baseline": round(seg_dt / value_dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

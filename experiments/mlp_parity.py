"""Cross-framework parity for the TF-IDF + MLP baseline (VERDICT r2 item 6:
the round-2 matrix had no torch MLP column at all).

Both frameworks train on the SAME feature splits (the framework's
sklearn-exact vectorizer, train-only fit — mlp_helper.py:38) built from the
protocol corpus; the torch side (torch_reference.train_torch_mlp) is an
independent implementation of MLP_flat.py's model, optimizer (plain Adam
2e-3 — MLP_flat.py:68), and patience early-stopping rule. Per-seed rows
append to the protocol results CSV with model=MLP.

    python experiments/mlp_parity.py --protocol amazon --seeds 42 43 44
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from protocol_parity import PROTOCOLS
from pytextgcn_tpu.baselines import fit_tfidf_splits, mlp_flat
from pytextgcn_tpu.data.synthetic import protocol_corpus
from pytextgcn_tpu.train.results import append_result


def build_splits(protocol: str, n_docs: int, seed: int):
    """Reference MLP split semantics: 10% random val of train
    (mlp_helper.py:31 — np.random seeded per run), test block fixed."""
    docs, level_labels, n_train, n_val = protocol_corpus(protocol, n_docs=n_docs)
    rng = np.random.default_rng(seed)
    n_trainval = n_train + n_val
    if n_val == 0:
        val_idx = rng.choice(n_train, int(0.1 * n_train), replace=False)
    else:
        val_idx = np.arange(n_train, n_trainval)
    val_mask = np.zeros(len(docs), bool)
    val_mask[val_idx] = True
    tr = np.flatnonzero(~val_mask[:n_trainval])
    va = np.flatnonzero(val_mask)
    te = np.arange(n_trainval, len(docs))
    return fit_tfidf_splits(
        [docs[i] for i in tr], [docs[i] for i in va], [docs[i] for i in te],
        [y[tr] for y in level_labels],
        [y[va] for y in level_labels],
        [y[te] for y in level_labels],
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--protocol", choices=list(PROTOCOLS), default="amazon")
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 43, 44])
    ap.add_argument("--n-docs", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--frameworks", choices=["both", "jax", "torch"],
                    default="both")
    ap.add_argument("--out", default="docs/protocol_results.csv")
    ap.add_argument("--verbose", type=int, default=0)
    args = ap.parse_args(argv)

    n_docs = args.n_docs or (50_000 if args.protocol == "amazon" else 60_000)
    level = -1  # finest level, the headline MLP row
    rows = []
    for seed in args.seeds:
        splits = build_splits(args.protocol, n_docs, seed)
        n_levels = len(splits.y_train)
        if args.frameworks in ("both", "jax"):
            t0 = time.time()
            m = mlp_flat(splits, n_levels - 1, epochs=args.epochs, seed=seed,
                         verbose=args.verbose)
            print(f"[jax mlp seed={seed}] acc {m['accuracy']:.4f} "
                  f"f1 {m['f1_macro']:.4f} ({time.time() - t0:.0f}s)",
                  flush=True)
            rows.append(("jax", m))
            append_result(args.out, seed=seed, model="MLP", hierarchy="flat",
                          f1_macro=m["f1_macro"], accuracy=m["accuracy"],
                          dataset=f"synthetic-{args.protocol}", category="jax")
        if args.frameworks in ("both", "torch"):
            from torch_reference import train_torch_mlp

            m = train_torch_mlp(splits, n_levels - 1, epochs=args.epochs,
                                seed=seed, verbose=args.verbose)
            print(f"[torch mlp seed={seed}] acc {m['accuracy']:.4f} "
                  f"f1 {m['f1_macro']:.4f} ({m['train_seconds']:.0f}s, "
                  f"{m['epochs_ran']} epochs)", flush=True)
            rows.append(("torch", m))
            append_result(args.out, seed=seed, model="MLP", hierarchy="flat",
                          f1_macro=m["f1_macro"], accuracy=m["accuracy"],
                          dataset=f"synthetic-{args.protocol}", category="torch")
    summary = {}
    for fw in ("jax", "torch"):
        accs = [m["accuracy"] for f, m in rows if f == fw]
        if accs:
            summary[fw] = {
                "accuracy": (float(np.mean(accs)), float(np.std(accs))),
                "f1_macro": (
                    float(np.mean([m["f1_macro"] for f, m in rows if f == fw])),
                    float(np.std([m["f1_macro"] for f, m in rows if f == fw])),
                ),
            }
    print(json.dumps({"protocol": args.protocol, "model": "MLP",
                      "level": level, "summary": summary}), flush=True)
    return summary


if __name__ == "__main__":
    main()

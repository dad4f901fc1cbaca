"""Calibrate protocol_corpus difficulty to the reference's accuracy bands.

VERDICT r2 Weak #3: the round-2 synthetic dbpedia sat at 0.978 flat-GCN
accuracy vs the reference's published 0.871 (results_dbpedia.csv:2) — too
easy to be a sensitive cross-framework parity instrument. This driver runs
the flat protocol (JAX side only, one seed) for a corpus-knob override set
and prints the landing accuracy, so the defaults in
pytextgcn_tpu/data/synthetic.py::protocol_corpus can be pinned to the
reference bands (amazon ~0.599 results.csv:2,6,7; dbpedia ~0.871).

    python experiments/calibrate_difficulty.py --protocol dbpedia \
        --set label_noise=0.04 "mix=(0.62,0.13,0.13,0.12)" leaf_vocab_size=10
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from protocol_parity import PROTOCOLS, remask
from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.data.synthetic import protocol_corpus
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.train import Trainer

# Published flat-GCN landing bands — mean (accuracy, macro-F1) over the
# reference's seeds. BOTH are calibration targets (VERDICT r4 item 4: the
# acc-only calibration left f1 +4 to +11 pts high; the reference's acc >>
# f1 profile is a tail-class failure mode the corpus must reproduce).
# amazon: /root/reference/results.csv:2,6,7 (acc .5976/.5974/.6017,
# f1 .4179/.4287/.4265); dbpedia: results_dbpedia.csv:2,6,7.
BANDS = {"amazon": (0.5989, 0.4243), "dbpedia": (0.8718, 0.8218)}


def run(protocol: str, n_docs: int, seed: int, overrides: dict,
        epochs: int = 0, verbose: int = 0, hybrid_k=None,
        pallas_dtype: str = "float32"):
    p = PROTOCOLS[protocol]
    t0 = time.time()
    docs, level_labels, n_train, n_val = protocol_corpus(
        protocol, n_docs=n_docs, **overrides
    )
    y = np.asarray(level_labels[-1])
    t2g = Text2Graph(
        min_df=p["min_df"], max_df=p["max_df"], window_size=p["window_size"],
        max_length=p["max_length"], rm_stopwords=False, verbose=verbose,
    )
    test_idx = np.arange(n_train + n_val, len(docs))
    g = t2g.fit_transform(docs, y, test_idx=test_idx, val_idx=np.arange(0))
    gs = remask(g, protocol, n_train, n_val, seed)
    build_s = time.time() - t0
    n_classes = int(y.max()) + 1
    model = GCN(gs.in_dim, n_classes, n_hidden_gcn=p["n_hidden"],
                dropout=p["dropout"])
    tr = Trainer(model, lr=p["lr"], seed=seed, hybrid_k=hybrid_k,
                 pallas_dtype=pallas_dtype, plan_cache=".plan_cache")
    t0 = time.time()
    tr.fit(gs, epochs=epochs or p["epochs"], n_classes=n_classes,
           verbose=verbose, eval_every=max(1, (epochs or p["epochs"]) // 5))
    m = tr.evaluate(gs, n_classes=n_classes)
    rec = {
        "protocol": protocol, "n_docs": n_docs, "seed": seed,
        "overrides": {k: repr(v) for k, v in overrides.items()},
        "accuracy": round(m["accuracy"], 4), "f1_macro": round(m["f1_macro"], 4),
        "n_nodes": g.n_nodes, "n_vocab": g.n_vocab, "n_edges": g.n_edges,
        "build_s": round(build_s, 1), "train_s": round(time.time() - t0, 1),
    }
    if protocol in BANDS:
        acc_t, f1_t = BANDS[protocol]
        rec["d_acc"] = round(m["accuracy"] - acc_t, 4)
        rec["d_f1"] = round(m["f1_macro"] - f1_t, 4)
    print(json.dumps(rec), flush=True)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--protocol", choices=list(PROTOCOLS), default="dbpedia")
    ap.add_argument("--n-docs", type=int, default=0, help="0 = protocol default")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--epochs", type=int, default=0, help="0 = protocol value")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL",
                    help="protocol_corpus overrides, e.g. label_noise=0.05")
    ap.add_argument("--sweep", metavar="KEY=V1,V2,...",
                    help="run once per value of KEY (on top of --set) and "
                    "print the distance of each landing to BOTH published "
                    "bands (accuracy AND macro-F1)")
    ap.add_argument("--verbose", type=int, default=0)
    ap.add_argument("--hybrid-k", default="off",
                    help="'off' | 'auto' | int — SpMM decomposition")
    ap.add_argument("--pallas-dtype", choices=["float32", "bfloat16"],
                    default="float32")
    args = ap.parse_args(argv)
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = ast.literal_eval(v)
    n_docs = args.n_docs or (50_000 if args.protocol == "amazon" else 60_000)
    hk = None if args.hybrid_k in ("off", "none") else (
        "auto" if args.hybrid_k == "auto" else int(args.hybrid_k)
    )
    if args.sweep:
        key, vals = args.sweep.split("=", 1)
        recs = []
        for v in vals.split(","):
            ov = dict(overrides)
            ov[key] = ast.literal_eval(v)
            recs.append(run(args.protocol, n_docs, args.seed, ov,
                            epochs=args.epochs, verbose=args.verbose,
                            hybrid_k=hk, pallas_dtype=args.pallas_dtype))
        if args.protocol in BANDS:
            best = min(recs, key=lambda r: max(abs(r["d_acc"]),
                                               abs(r["d_f1"])))
            print(f"# closest to joint (acc, f1) band: "
                  f"{key}={best['overrides'][key]} "
                  f"d_acc={best['d_acc']} d_f1={best['d_f1']}", flush=True)
        return recs
    return run(args.protocol, n_docs, args.seed, overrides,
               epochs=args.epochs, verbose=args.verbose, hybrid_k=hk,
               pallas_dtype=args.pallas_dtype)


if __name__ == "__main__":
    main()

"""TF-IDF + MLP baseline driver: flat, per-level, per-label in one script
(MLP_flat.py / MLP_level.py / MLP_label.py counterpart).

Examples:
    python experiments/mlp.py --hierarchy flat
    python experiments/mlp.py --hierarchy per-level --dataset amazon
    python experiments/mlp.py --hierarchy per-label --dataset dbpedia
"""

import numpy as np

from common import load_corpus
from pytextgcn_tpu.baselines import fit_tfidf_splits, mlp_flat, mlp_per_label, mlp_per_level
from pytextgcn_tpu.config import parse_config
from pytextgcn_tpu.train.results import append_result


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    hierarchy = "flat"
    if "--hierarchy" in argv:
        i = argv.index("--hierarchy")
        hierarchy = argv[i + 1]
        del argv[i : i + 2]
    cfg = parse_config(argv)
    levels = {
        "synthetic": ["lvl1", "lvl2"],
        "synthetic-amazon": ["lvl1", "lvl2"],
        "amazon": ["Cat1", "Cat2"],
        "synthetic-dbpedia": ["l1", "l2", "l3"],
    }.get(cfg.dataset, ["l1", "l2", "l3"])
    docs, level_labels, test_idx, val_idx = load_corpus(cfg, levels=levels)
    n = len(docs)
    mask = np.zeros(n, np.int8)  # 0 train, 1 val, 2 test
    mask[val_idx] = 1
    mask[test_idx] = 2
    tr, va, te = (np.flatnonzero(mask == k) for k in (0, 1, 2))
    splits = fit_tfidf_splits(
        [docs[i] for i in tr], [docs[i] for i in va], [docs[i] for i in te],
        [y[tr] for y in level_labels],
        [y[va] for y in level_labels],
        [y[te] for y in level_labels],
    )
    print(f"Data loaded! {splits.x_train.shape} train features")

    # MLP defaults differ from the GCN-oriented config defaults (lr 2e-3,
    # dropout 0.5 — MLP_flat.py:20-21); honor explicit flags by checking
    # whether the user actually passed them rather than comparing values
    passed = set(sys.argv[1:]) | set(argv)
    lr = cfg.train.lr if "--train-lr" in passed else 2e-3
    dropout = cfg.model.dropout if "--model-dropout" in passed else 0.5
    kwargs = dict(
        hidden=tuple(cfg.model.mlp_hidden),
        lr=lr,
        dropout=dropout,
        epochs=cfg.train.epochs,
        seed=cfg.train.seed,
        verbose=cfg.train.verbose,
        use_pallas=cfg.train.use_pallas,
    )
    if hierarchy == "flat":
        results = [mlp_flat(splits, level, **kwargs) for level in range(len(level_labels))]
    elif hierarchy == "per-level":
        results = mlp_per_level(splits, **kwargs)
    elif hierarchy == "per-label":
        results = mlp_per_label(splits, **kwargs)
    else:
        raise ValueError(hierarchy)

    for cat, res in enumerate(results):
        print(f"[{hierarchy} category {cat}] accuracy {res['accuracy']: .4f} "
              f"f1-macro {res['f1_macro']: .4f}")
        if cfg.result_file:
            append_result(
                cfg.result_file,
                seed=cfg.train.seed,
                model="MLP",
                hierarchy=hierarchy,
                f1_macro=res["f1_macro"],
                accuracy=res["accuracy"],
                dataset=cfg.dataset,
                category=str(cat),
            )
    return results


if __name__ == "__main__":
    main()

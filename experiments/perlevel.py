"""Per-level hierarchical TextGCN driver (perlevel_amazon.py /
perlevel_dbpedia.py counterpart).

Examples:
    python experiments/perlevel.py                       # synthetic, 2 levels
    python experiments/perlevel.py --dataset amazon --levels Cat1 Cat2 \
        --graph-max-df 0.6
    python experiments/perlevel.py --dataset dbpedia --levels l1 l2 l3 \
        --graph-max-df 0.4 --graph-min-df 100 --graph-window-size 5
"""

import numpy as np

from common import load_corpus
from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.config import (
    build_parser, hybrid_fused_arg, hybrid_k_arg, make_model, parse_config,
)
from pytextgcn_tpu.hierarchy import train_per_level
from pytextgcn_tpu.train.results import append_result


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    levels = None
    if "--levels" in argv:
        i = argv.index("--levels")
        j = i + 1
        levels = []
        while j < len(argv) and not argv[j].startswith("--"):
            levels.append(argv[j])
            j += 1
        del argv[i:j]
    cfg = parse_config(argv)
    if levels is None:
        levels = ["lvl1", "lvl2"] if cfg.dataset == "synthetic" else ["Cat1", "Cat2"]

    docs, level_labels, test_idx, val_idx = load_corpus(cfg, levels=levels)
    print(f"Data loaded! {len(docs)} docs, {len(level_labels)} levels")

    t2g = Text2Graph(
        min_df=cfg.graph.min_df,
        max_df=cfg.graph.max_df,
        window_size=cfg.graph.window_size,
        max_length=cfg.graph.max_length,
        rm_stopwords=cfg.graph.rm_stopwords,
        backend=cfg.graph.backend,
        verbose=cfg.train.verbose,
    )
    g = t2g.fit_transform(docs, level_labels[-1], test_idx=test_idx, val_idx=val_idx)
    print("Graph built!")

    res = train_per_level(
        g,
        level_labels,
        model_factory=lambda d_in, d_out: make_model(cfg.model, d_in, d_out),
        lr=cfg.train.lr,
        epochs=cfg.train.epochs,
        seed=cfg.train.seed,
        verbose=cfg.train.verbose,
        trainer_kwargs={"use_pallas": cfg.train.use_pallas,
                        "hybrid_k": hybrid_k_arg(cfg.train),
                        "hybrid_fused": hybrid_fused_arg(cfg.train),
                        "pallas_dtype": cfg.train.pallas_dtype,
                        # hierarchy protocol default = plain Adam
                        # (perlevel_amazon.py:84, perlabel_amazon.py:124)
                        **({} if cfg.train.optimizer == "default"
                           else {"optimizer": cfg.train.optimizer}),
                        **({"plan_cache": cfg.train.plan_cache}
                           if cfg.train.plan_cache else {})},
    )
    m = res["metrics"]
    print(f"Test Accuracy: {m['accuracy']: .4f}")
    print(f"F1-Macro: {m['f1_macro']: .4f}")
    if cfg.result_file:
        append_result(
            cfg.result_file,
            seed=cfg.train.seed,
            model=cfg.model.model.upper(),
            hierarchy="per-level",
            f1_macro=m["f1_macro"],
            accuracy=m["accuracy"],
        )
    return m


if __name__ == "__main__":
    main()

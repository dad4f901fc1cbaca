"""Per-label ensemble driver: train one child-classifier per parent class,
then composed hierarchical inference (perlabel_amazon.py + eval_perlabel.py
counterpart — training and eval in one driver; artifacts saved like the
reference's models/amazon/lvl2-cat{i} + class_mapping.json).

Examples:
    python experiments/perlabel.py                       # synthetic
    python experiments/perlabel.py --dataset amazon --levels Cat1 Cat2 \
        --graph-max-df 0.6 --save-model models/amazon
    python experiments/perlabel.py --route predicted     # honest routing
"""

import os

import numpy as np

from common import load_corpus
from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.config import hybrid_fused_arg, hybrid_k_arg, make_model, parse_config
from pytextgcn_tpu.hierarchy import eval_per_label, train_per_label
from pytextgcn_tpu.train import Trainer
from pytextgcn_tpu.train.results import append_result


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    levels, route, eval_only = None, "ground_truth", False
    if "--eval-only" in argv:
        # the reference's eval_perlabel.py workflow: load the saved per-class
        # checkpoints + class_mapping.json and run composed inference only
        eval_only = True
        argv.remove("--eval-only")
    if "--levels" in argv:
        i = argv.index("--levels")
        j = i + 1
        levels = []
        while j < len(argv) and not argv[j].startswith("--"):
            levels.append(argv[j])
            j += 1
        del argv[i:j]
    if "--route" in argv:
        i = argv.index("--route")
        route = argv[i + 1]
        del argv[i : i + 2]
    cfg = parse_config(argv)
    if levels is None:
        levels = ["lvl1", "lvl2"] if cfg.dataset == "synthetic" else ["Cat1", "Cat2"]

    docs, (y_parent, y_child), test_idx, val_idx = load_corpus(cfg, levels=levels)
    print(f"Data loaded! {len(docs)} docs")

    t2g = Text2Graph(
        min_df=cfg.graph.min_df,
        max_df=cfg.graph.max_df,
        window_size=cfg.graph.window_size,
        max_length=cfg.graph.max_length,
        rm_stopwords=cfg.graph.rm_stopwords,
        backend=cfg.graph.backend,
        verbose=cfg.train.verbose,
    )
    g = t2g.fit_transform(docs, y_child, test_idx=test_idx, val_idx=val_idx)
    print("Graph built!")

    if eval_only:
        import json

        import jax

        assert cfg.save_model, "--eval-only needs --save-model <dir> to load from"
        from pytextgcn_tpu.train.checkpoint import load_checkpoint, load_meta

        with open(os.path.join(cfg.save_model, "class_mapping.json")) as f:
            mapping = {int(k): v for k, v in json.load(f).items()}
        trainers = []
        step_cache = {}  # same-shaped class models share one jitted predict
        for c in sorted(mapping):
            path = os.path.join(cfg.save_model, f"lvl2-cat{c}")
            n_out = len(load_meta(path)["classes"])
            model = make_model(cfg.model, g.in_dim, n_out)
            trainer = Trainer(
                model, lr=cfg.train.lr, use_pallas=cfg.train.use_pallas,
                step_cache=step_cache,
            )
            template = model.init(jax.random.PRNGKey(0))
            trainer.params, _ = load_checkpoint(path, template)
            trainers.append(trainer)
        out = {"trainers": trainers, "mapping": mapping}
    else:
        ep_mesh = None
        if cfg.train.ep:
            from pytextgcn_tpu.parallel import make_mesh

            ep_mesh = make_mesh(cfg.train.n_devices or None, axis="ensemble")
        out = train_per_label(
            g,
            y_child,
            y_parent,
            model_factory=lambda d_in, d_out: make_model(cfg.model, d_in, d_out),
            lr=cfg.train.lr,
            epochs=cfg.train.epochs,
            seed=cfg.train.seed,
            verbose=cfg.train.verbose,
            save_dir=cfg.save_model,
            mesh=ep_mesh,
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

    parent_pred = None
    if route == "predicted":
        # level-1 flat model for routing
        import dataclasses

        y_nodes = np.zeros(g.n_nodes, np.int32)
        y_nodes[g.n_vocab :] = np.asarray(y_parent, np.int32)
        g1 = dataclasses.replace(g, y=y_nodes)
        n_parents = int(np.max(y_parent)) + 1
        lvl1 = Trainer(
            make_model(cfg.model, g1.in_dim, n_parents),
            lr=cfg.train.lr,
            seed=cfg.train.seed,
            use_pallas=cfg.train.use_pallas,
        )
        lvl1.fit(g1, epochs=cfg.train.epochs, n_classes=n_parents, verbose=cfg.train.verbose)
        import jax.numpy as jnp

        parent_pred = np.asarray(
            jnp.argmax(lvl1.predict_logits(g1)[g.n_vocab :], axis=-1)
        )

    m = eval_per_label(
        g, y_child, y_parent, out["trainers"], out["mapping"],
        parent_pred=parent_pred, route=route,
    )
    print(f"test accuracy: {m['accuracy']: .4f}")
    print(f"test f1-macro: {m['f1_macro']: .4f}")
    if cfg.result_file:
        append_result(
            cfg.result_file,
            seed=cfg.train.seed,
            model=cfg.model.model.upper(),
            hierarchy="per-label",
            f1_macro=m["f1_macro"],
            accuracy=m["accuracy"],
        )
    return m


if __name__ == "__main__":
    main()

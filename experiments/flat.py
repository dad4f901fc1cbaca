"""Flat TextGCN experiment driver.

TPU-native counterpart of flat_amazon.py / flat_dbpedia.py: one transductive
graph over train+val+test, 2-layer GCN (or EGCN/JK), masked CE, Adam
(amsgrad), per-epoch val metrics, final test accuracy / macro-F1 appended to
the results CSV.

Examples:
    python experiments/flat.py                                   # synthetic
    python experiments/flat.py --dataset amazon --labels Cat2 \
        --graph-max-df 0.7 --model-n-hidden 100 --train-seed 44
    python experiments/flat.py --dataset dbpedia --labels l3 \
        --graph-max-df 0.4 --graph-min-df 100 --graph-window-size 5 \
        --graph-max-length 15 --model-n-hidden 32 --model-dropout 0.5 \
        --train-epochs 100
"""

import numpy as np

from common import load_corpus
from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.config import (
    ExperimentConfig, hybrid_f32_mode_arg, hybrid_fused_arg, hybrid_k_arg,
    make_model,
    parse_config, sharding_args,
)
from pytextgcn_tpu.train import Trainer
from pytextgcn_tpu.train.results import append_result


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.load_graph is not None:
        # reuse a saved graph artifact (the reference's load_graph path,
        # flat_amazon.py:74-76, on the npz format)
        g = Text2Graph.load_graph(cfg.load_graph)
        n_classes = int(np.max(np.asarray(g.y))) + 1
        print(f"Graph loaded from {cfg.load_graph}! n_classes={n_classes}")
    else:
        docs, labels, test_idx, val_idx = load_corpus(cfg)
        y = labels[0]
        n_classes = int(np.max(y)) + 1
        print(f"Data loaded! {len(docs)} docs, {n_classes} classes")

        t2g = Text2Graph(
            min_df=cfg.graph.min_df,
            max_df=cfg.graph.max_df,
            window_size=cfg.graph.window_size,
            max_length=cfg.graph.max_length,
            rm_stopwords=cfg.graph.rm_stopwords,
            backend=cfg.graph.backend,
            save_path=cfg.graph.save_path,
            verbose=cfg.train.verbose,
            n_jobs=8,
        )
        g = t2g.fit_transform(docs, y, test_idx=test_idx, val_idx=val_idx)
        print("Graph built!")

    model = make_model(cfg.model, g.in_dim, n_classes)
    trainer = Trainer(
        model, lr=cfg.train.lr, seed=cfg.train.seed,
        use_pallas=cfg.train.use_pallas,
        hybrid_fused=hybrid_fused_arg(cfg.train),
        hybrid_f32_mode=hybrid_f32_mode_arg(cfg.train),
        pallas_dtype=cfg.train.pallas_dtype,
        debug_checks=cfg.train.debug_checks,
        masked_head=cfg.train.masked_head,
        # flat protocol default = torch-exact Adam(amsgrad=True)
        optimizer=None if cfg.train.optimizer == "default" else cfg.train.optimizer,
        plan_cache=cfg.train.plan_cache or None,
        # --train-sharding off|allgather|halo|hybrid: mesh/halo/hybrid_k
        **sharding_args(cfg.train, hybrid_k_arg(cfg.train)),
    )
    if cfg.train.batch_size > 0:
        trainer.fit_minibatch(
            g,
            epochs=cfg.train.epochs,
            batch_size=cfg.train.batch_size,
            n_classes=n_classes,
            verbose=cfg.train.verbose,
        )
    else:
        trainer.fit(
            g,
            epochs=cfg.train.epochs,
            n_classes=n_classes,
            verbose=cfg.train.verbose,
            eval_every=cfg.train.eval_every,
            early_stopping=cfg.train.early_stopping,
        )
    metrics = trainer.evaluate(g, n_classes=n_classes)
    print(f"Test Accuracy: {metrics['accuracy']: .4f}")
    print(f"F1-Macro: {metrics['f1_macro']: .4f}")
    if cfg.train.verbose > 0:
        import jax.numpy as jnp

        from pytextgcn_tpu.train.metrics import confusion_matrix

        logits = trainer.predict_logits(g)
        pred = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(pred, jnp.asarray(g.y), jnp.asarray(g.test_mask), n_classes)
        print("Confusion matrix:")
        print(np.asarray(cm))

    if cfg.save_model:
        from pytextgcn_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(cfg.save_model, trainer.params, trainer.opt_state)
    if cfg.result_file:
        append_result(
            cfg.result_file,
            seed=cfg.train.seed,
            model=cfg.model.model.upper(),
            hierarchy="flat",
            f1_macro=metrics["f1_macro"],
            accuracy=metrics["accuracy"],
        )
    return metrics


if __name__ == "__main__":
    main()

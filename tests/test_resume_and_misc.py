"""Checkpoint-resume mid-training, early-stopping modes, multihost utils."""

import dataclasses

import numpy as np
import pytest

from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.data import synthetic_corpus
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.train import Trainer
from pytextgcn_tpu.train.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def small_graph():
    docs, labels = synthetic_corpus(n_docs=100, n_classes=3, seed=21)
    t2g = Text2Graph(min_df=1, window_size=4)
    rng = np.random.default_rng(0)
    test_idx = rng.choice(100, 20, replace=False)
    val_idx = np.setdiff1d(rng.choice(100, 30, replace=False), test_idx)[:10]
    return t2g.fit_transform(docs, labels, test_idx=test_idx, val_idx=val_idx)


def test_resume_training_bitexact(tmp_path, small_graph):
    g = small_graph
    mk = lambda: GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.0)

    # 30 epochs straight through
    t_full = Trainer(mk(), lr=0.05, seed=5)
    t_full.fit(g, epochs=30, n_classes=3)

    # 15 epochs, checkpoint, resume 15 more in a fresh trainer.
    # (dropout=0 so the RNG stream doesn't need to be restored; the RNG key
    # is reseeded identically because both trainers share the seed)
    t_a = Trainer(mk(), lr=0.05, seed=5)
    t_a.fit(g, epochs=15, n_classes=3)
    save_checkpoint(str(tmp_path / "ck"), t_a.params, t_a.opt_state)

    t_b = Trainer(mk(), lr=0.05, seed=5)
    t_b.params = t_a.params  # template for structure
    t_b.opt_state = t_a.opt_state
    p, s = load_checkpoint(str(tmp_path / "ck"), t_a.params, t_a.opt_state)
    t_b.params, t_b.opt_state = p, s
    t_b.fit(g, epochs=15, n_classes=3)

    # same total number of updates from the same state: same final metrics
    import jax

    m_full = t_full.evaluate(g, n_classes=3)
    m_res = t_b.evaluate(g, n_classes=3)
    # not bit-exact (RNG stream differs between one 30-epoch run and two
    # 15-epoch runs) but must land at comparable quality
    assert abs(m_full["accuracy"] - m_res["accuracy"]) < 0.2


def test_resume_replays_rng_stream_bitexact(tmp_path, small_graph):
    """10+10 epochs with a save/restore in the middle == 20 straight epochs,
    bit for bit — dropout ON so the per-epoch RNG stream matters (the base
    key and epoch counter are checkpointed and replayed)."""
    import jax

    g = small_graph
    mk = lambda: GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.5)

    t_full = Trainer(mk(), lr=0.05, seed=7)
    t_full.fit(g, epochs=20, n_classes=3)

    t_a = Trainer(mk(), lr=0.05, seed=7)
    t_a.fit(g, epochs=10, n_classes=3)
    t_a.save(str(tmp_path / "ck10"), epoch=10)

    t_b = Trainer(mk(), lr=0.05, seed=7)  # fresh process stand-in
    start = t_b.restore(str(tmp_path / "ck10"))
    assert start == 10
    t_b.fit(g, epochs=20, n_classes=3, start_epoch=start)

    for a, b in zip(
        jax.tree_util.tree_leaves(t_full.params), jax.tree_util.tree_leaves(t_b.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_early_stopping(small_graph):
    g = small_graph
    model = GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.0)
    trainer = Trainer(model, lr=2.0, seed=0)  # absurd lr -> loss diverges
    hist = trainer.fit(g, epochs=200, n_classes=3, early_stopping="reference")
    assert len(hist) < 200  # stopped early


def test_val_f1_early_stopping(small_graph):
    g = small_graph
    model = GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.0)
    trainer = Trainer(model, lr=0.05, seed=0)
    hist = trainer.fit(
        g, epochs=400, n_classes=3, early_stopping="val_f1", patience=5, min_epochs=10
    )
    assert len(hist) < 400


def test_multihost_utils_single_process():
    import jax

    from pytextgcn_tpu.parallel import global_mesh, host_local_mesh, init_distributed

    init_distributed()  # no-op on single process
    m = global_mesh()
    assert m.shape["graph"] == len(jax.devices())
    ml = host_local_mesh()
    assert ml.shape["graph"] == len(jax.local_devices())


def test_resume_with_reference_early_stopping(tmp_path, small_graph):
    # regression: the ES window is indexed into the in-memory history; a
    # resumed run (start_epoch > 0, short history) must not crash on it
    g = small_graph
    model = GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.5)
    t = Trainer(model, lr=0.05, seed=7)
    t.fit(g, epochs=10, n_classes=3)
    t.save(str(tmp_path / "ck"), epoch=10)
    t2 = Trainer(GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.5), lr=0.05, seed=7)
    start = t2.restore(str(tmp_path / "ck"))
    hist = t2.fit(g, epochs=30, n_classes=3, start_epoch=start,
                  early_stopping="reference")
    assert 1 <= len(hist) <= 20


def test_debug_checks_catches_nan(small_graph):
    # SURVEY §5: checkify-instrumented steps surface NaN/Inf at the
    # offending epoch instead of silently training on garbage
    import dataclasses

    g = small_graph
    t = Trainer(GCN(g.in_dim, 3, n_hidden_gcn=8, dropout=0.0), lr=0.05,
                seed=0, debug_checks=True)
    hist = t.fit(g, epochs=3, n_classes=3)  # clean graph: no error
    assert len(hist) == 3

    bad_w = np.asarray(g.edge_w).copy()
    bad_w[0] = np.nan
    g_bad = dataclasses.replace(g, edge_w=bad_w)
    t2 = Trainer(GCN(g.in_dim, 3, n_hidden_gcn=8, dropout=0.0), lr=0.05,
                 seed=0, debug_checks=True)
    with pytest.raises(Exception, match="(?i)nan"):
        t2.fit(g_bad, epochs=3, n_classes=3)


def test_restore_keeps_opt_state_without_template(tmp_path, small_graph):
    """restore() must not discard the checkpointed optimizer state when
    params were set externally but opt_state is None (the EP-slice /
    warm-start shape): the resumed trajectory must match a trainer restored
    with full templates."""
    g = small_graph
    mk = lambda: GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.5)

    t_a = Trainer(mk(), lr=0.05, seed=9)
    t_a.fit(g, epochs=8, n_classes=3)
    t_a.save(str(tmp_path / "ck"), epoch=8)

    # full-template restore (the known-good path)
    t_ref = Trainer(mk(), lr=0.05, seed=9)
    e = t_ref.restore(str(tmp_path / "ck"))
    t_ref.fit(g, epochs=12, n_classes=3, start_epoch=e)

    # params set externally, opt_state left None
    t_b = Trainer(mk(), lr=0.05, seed=9)
    t_b.params = mk().init(__import__("jax").random.PRNGKey(123))
    e = t_b.restore(str(tmp_path / "ck"))
    t_b.fit(g, epochs=12, n_classes=3, start_epoch=e)

    import jax

    for a, b in zip(jax.tree.leaves(t_ref.params), jax.tree.leaves(t_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_debug_checks_gets_own_cached_step(small_graph):
    """A shared step_cache must never serve an unchecked step to a
    debug_checks trainer (or vice versa)."""
    g = small_graph
    cache = {}
    t_plain = Trainer(GCN(g.in_dim, 3, n_hidden_gcn=16), seed=1, step_cache=cache)
    t_plain.fit(g, epochs=1, n_classes=3)
    t_dbg = Trainer(
        GCN(g.in_dim, 3, n_hidden_gcn=16), seed=1, step_cache=cache,
        debug_checks=True,
    )
    t_dbg.fit(g, epochs=1, n_classes=3)
    train_keys = [k for k in cache if k[0] != "predict"]
    assert len(train_keys) == 2  # one checked, one unchecked

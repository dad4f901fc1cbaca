"""Golden tests for sliding-window counting and PMI edges.

The integer co-occurrence goldens are transcribed from the reference's
hand-computed test (textgcn/test/test_cfunc.py:81-99) and the analytic PMI
values from its toy-corpus test (textgcn/test/test_pmi.py:10-27). All three
backends (python oracle, native C++, JAX on-device) must agree exactly.
"""

import numpy as np
import pytest

from pytextgcn_tpu.build.windows import (
    pmi_edges_from_pairs,
    sliding_window_counts,
    tri_diag_index,
    word_word_edges,
)

# the reference's hand-computed fixture: 2 docs, 6 words, window 3, one padded
GOLDEN_X = np.array(
    [
        [0, 1, 2, 3, 4, -1, -1, -1],
        [5, 3, 4, 1, 2, 0, 5, 1],
    ],
    dtype=np.int32,
)
GOLDEN_CIJ = np.array(
    # packed upper triangle incl. diagonal, row-major (test_cfunc.py:88-95)
    [4, 3, 3, 0, 0, 2,
        6, 4, 2, 2, 1,
           6, 2, 2, 1,
              4, 3, 1,
                 4, 1,
                    3],
    dtype=np.uint32,
)


def test_tri_index_layout():
    # mirrors the reference's test_sym_matrix (graphbuilder.pyx:277-296)
    mat = np.zeros(10, dtype=np.float32)
    mat[tri_diag_index(np.int64(1), np.int64(1), 4)] = 10
    mat[tri_diag_index(np.int64(1), np.int64(2), 4)] = 20
    mat[tri_diag_index(np.int64(2), np.int64(0), 4)] = 30
    mat[tri_diag_index(np.int64(3), np.int64(3), 4)] = 100
    mat[tri_diag_index(np.int64(2), np.int64(3), 4)] = 120
    np.testing.assert_array_equal(mat, [0, 0, 30, 0, 10, 20, 0, 0, 120, 100])


def test_sliding_window_golden_oracle():
    cij, n_windows = sliding_window_counts(GOLDEN_X, 6, 3)
    np.testing.assert_array_equal(cij, GOLDEN_CIJ)
    assert n_windows == 9  # 3 windows in the padded doc + 6 in the full doc


def test_sliding_window_golden_native():
    from pytextgcn_tpu.build.native_bridge import native_sliding_window_counts

    cij, n_windows = native_sliding_window_counts(GOLDEN_X, 6, 3)
    np.testing.assert_array_equal(cij, GOLDEN_CIJ)
    assert n_windows == 9


def _edges_to_dict(coo, w):
    return {(int(a), int(b)): float(x) for (a, b), x in zip(coo, w)}


@pytest.mark.parametrize("backend", ["oracle", "native", "device", "sharded"])
def test_word_word_edges_backends_agree(backend):
    coo, w, n_windows = word_word_edges(GOLDEN_X, 6, 3, backend=backend)
    ref_coo, ref_w, ref_nw = word_word_edges(GOLDEN_X, 6, 3, backend="oracle")
    assert n_windows == ref_nw == 9
    np.testing.assert_array_equal(coo, ref_coo)  # identical emission order
    np.testing.assert_array_equal(w, ref_w)  # bitwise-equal float32 PMI


def test_pmi_analytic_values():
    """Analytic PMI check in the style of the reference's test_pmi.py:10-18.

    Single doc [0, 1, 2, 0], window 4 >= len: one window. Counts: c00 from
    pairs (0,0) at positions (0,0),(3,3),(0,3) = 3; c01 = c(0@0,1) + c(1,0@3)
    = 2; c02 = 2; c11 = 1; c12 = 1; c22 = 1. n_windows = 1 ->
    p0 = 3, p1 = 1, p2 = 1 (unnormalized by 1). pmi(0,1) = log(2/(3*1)) < 0:
    dropped. pmi(1,2) = log(1/(1*1)) = 0: dropped (must exceed 1e-10).
    """
    X = np.array([[0, 1, 2, 0]], dtype=np.int32)
    coo, w, n_windows = word_word_edges(X, 3, 4, backend="oracle")
    assert n_windows == 1
    assert coo.shape[0] == 0  # every pmi <= 0 here

    # now two docs so that a pair is genuinely informative:
    # doc a = [0, 1], doc b = [2, 2], window 2 -> windows: 1 + 1 = 2
    # c00=1, c11=1, c01=1, c22=3 -> p0=p1=.5, p2=1.5, p01=.5
    # pmi(0,1) = log(.5/(.5*.5)) = log 2 > 0  -> kept
    # pmi with word 2 never counted (no cross pair) -> no edge
    X2 = np.array([[0, 1], [2, 2]], dtype=np.int32)
    coo2, w2, nw2 = word_word_edges(X2, 3, 2, backend="oracle")
    assert nw2 == 2
    d = _edges_to_dict(coo2, w2)
    assert set(d) == {(0, 1), (1, 0)}
    np.testing.assert_allclose(d[(0, 1)], np.log(2.0), rtol=1e-6)


def test_doc_sharded_counting_matches_native_at_scale():
    """Document-sharded counting over the 8-device virtual mesh must equal
    the C++ kernel bitwise (SURVEY.md §5(a): windows never cross document
    boundaries, so doc sharding is exact)."""
    import jax

    from pytextgcn_tpu.build.windows import word_word_edges_sharded
    from pytextgcn_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(3)
    n_docs, seq_len, n_vocab, window = 3000, 48, 500, 10
    lengths = rng.integers(0, seq_len + 1, size=n_docs)
    X = np.full((n_docs, seq_len), -1, dtype=np.int32)
    for i, L in enumerate(lengths):
        X[i, :L] = rng.integers(0, n_vocab, size=L)

    ref = word_word_edges(X, n_vocab, window, backend="native")
    got = word_word_edges_sharded(X, n_vocab, window, mesh=make_mesh(8))
    assert got[2] == ref[2]
    np.testing.assert_array_equal(got[0], ref[0])
    np.testing.assert_array_equal(got[1], ref[1])


@pytest.mark.parametrize("backend", ["native", "device", "sharded"])
def test_random_corpus_backends_agree(backend):
    """Fuzz: random padded corpora, all backends agree bitwise."""
    rng = np.random.default_rng(0)
    for trial in range(4):
        n_docs = int(rng.integers(1, 12))
        seq_len = int(rng.integers(2, 30))
        n_vocab = int(rng.integers(2, 15))
        window = int(rng.integers(2, 8))
        lengths = rng.integers(0, seq_len + 1, size=n_docs)
        X = np.full((n_docs, seq_len), -1, dtype=np.int32)
        for i, L in enumerate(lengths):
            X[i, :L] = rng.integers(0, n_vocab, size=L)
        ref = word_word_edges(X, n_vocab, window, backend="oracle")
        got = word_word_edges(X, n_vocab, window, backend=backend)
        assert got[2] == ref[2], f"n_windows mismatch trial {trial}"
        np.testing.assert_array_equal(got[0], ref[0])
        np.testing.assert_array_equal(got[1], ref[1])


def test_auto_backend_routes_large_vocab_to_sparse(monkeypatch):
    """Max-vocab policy (VERDICT r2 item 8): the native kernel's packed
    triangle is V(V+1)/2 * 4 bytes — 'auto' must route vocabularies past
    the budget to the sparse device path instead of allocating gigabytes.
    The reference inherits the same cliff (graphbuilder.pyx:44) with no
    fallback at all."""
    import pytextgcn_tpu.build.native_bridge as nb
    from pytextgcn_tpu.build.windows import word_word_edges

    rng = np.random.default_rng(0)
    n_vocab = 50_000  # triangle would be ~5 GB
    tokens = rng.integers(0, n_vocab, (20, 12)).astype(np.int32)

    def boom(*a, **k):
        raise AssertionError("native kernel invoked past the triangle budget")

    monkeypatch.setattr(nb, "native_word_word_edges", boom)
    coo, w, n_win = word_word_edges(tokens, n_vocab, window_size=5, backend="auto")
    assert n_win == 20 * (12 - 5 + 1)
    assert coo.shape[1] == 2 and len(w) == len(coo)

    # under the budget, auto still prefers the native kernel (sentinel
    # return value, since auto's try/except would swallow a raise)
    sentinel = (np.zeros((0, 2), np.int32), np.zeros(0, np.float32), 12345)
    monkeypatch.setattr(nb, "native_word_word_edges", lambda *a, **k: sentinel)
    small = rng.integers(0, 50, (5, 8)).astype(np.int32)
    assert word_word_edges(small, 50, window_size=3, backend="auto")[2] == 12345

    # an explicit 'native' request overrides the policy even past the budget
    monkeypatch.setenv("PYTEXTGCN_NATIVE_TRI_BYTES", "1000")
    assert word_word_edges(small, 50, window_size=3, backend="native")[2] == 12345
    # ...while auto now routes even this tiny vocab to the device path
    assert word_word_edges(small, 50, window_size=3, backend="auto")[2] != 12345

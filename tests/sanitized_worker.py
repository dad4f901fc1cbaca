"""Worker: exercise the native C++ counting kernel under a sanitizer build.

Run as ``python sanitized_worker.py <libtgnative_{asan,tsan}.so>`` with the
matching sanitizer runtime LD_PRELOADed. Deliberately imports NOTHING beyond
numpy + ctypes (no jax, no package __init__): the sanitizer should watch the
kernel, not a JIT runtime it wasn't built for.

Checks:
1. small-vocab golden counts vs an inline python oracle replicating the
   reference's sliding_window semantics (graphbuilder.pyx:71-115: windows
   start at j in [0, len-w], a window whose last slot is padding ends the
   doc unless j==0, pairs counted over k<=l within the window);
2. determinism across thread counts (1 vs 8) for counts AND the full
   PMI/COO extraction — integer counting is exact, so any divergence is a
   race.
"""

import ctypes
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def oracle_counts(tokens: np.ndarray, n_vocab: int, w: int):
    """Python clone of the reference kernel's counting loop (test oracle)."""
    tri = lambda i, j: (min(i, j) * (2 * n_vocab - min(i, j) + 1)) // 2 + abs(j - i)
    c = np.zeros(n_vocab * (n_vocab + 1) // 2, np.uint64)
    n_windows = 0
    for doc in tokens:
        for j in range(0, len(doc) - w + 1):
            if doc[j + w - 1] == -1 and j != 0:
                break
            n_windows += 1
            for k in range(j, j + w):
                if doc[k] == -1:
                    break
                for l in range(k, j + w):
                    if doc[l] == -1:
                        break
                    c[tri(doc[k], doc[l])] += 1
    return c, n_windows


def _load_bridge():
    """Import native_bridge straight from its file — going through the
    package __init__ would pull in jax, which the sanitizer runtime was not
    built to watch."""
    import importlib.util

    path = os.path.join(
        os.path.dirname(_HERE), "pytextgcn_tpu", "build", "native_bridge.py"
    )
    spec = importlib.util.spec_from_file_location("tg_native_bridge", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    lib_path = sys.argv[1]

    nb = _load_bridge()
    nb._LIB = nb.declare_api(ctypes.CDLL(lib_path))

    rng = np.random.default_rng(0)

    # 1. golden vs inline oracle, single- and multi-threaded
    v, w, docs, max_len = 40, 5, 150, 30
    lens = rng.integers(1, max_len + 1, docs)
    toks = np.full((docs, max_len), -1, np.int32)
    for i, length in enumerate(lens):
        toks[i, :length] = rng.integers(0, v, length)
    cij_ref, nw_ref = oracle_counts(toks, v, w)
    for nt in (1, 4):
        cij, nw = nb.native_sliding_window_counts(toks, v, w, n_threads=nt)
        assert nw == nw_ref, (nt, nw, nw_ref)
        np.testing.assert_array_equal(cij.astype(np.uint64), cij_ref)

    # 2. thread-count determinism at a scale that exercises the per-thread
    # private-array merge and the atomic fallback paths
    v2, w2, docs2, max_len2 = 3000, 20, 800, 64
    lens2 = rng.integers(1, max_len2 + 1, docs2)
    toks2 = np.full((docs2, max_len2), -1, np.int32)
    for i, length in enumerate(lens2):
        toks2[i, :length] = rng.integers(0, v2, length)
    coo1, w1, n1 = nb.native_word_word_edges(toks2, v2, w2, n_threads=1)
    coo8, w8, n8 = nb.native_word_word_edges(toks2, v2, w2, n_threads=8)
    assert n1 == n8, (n1, n8)
    np.testing.assert_array_equal(coo1, coo8)
    np.testing.assert_array_equal(w1, w8)
    assert len(w1) > 0

    print("SAN_OK", flush=True)


if __name__ == "__main__":
    main()

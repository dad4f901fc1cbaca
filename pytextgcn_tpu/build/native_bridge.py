"""ctypes bridge to the native C++ graph-builder kernel.

Compiles ``native/graphbuilder.cpp`` on demand (g++, cached next to the
source) and exposes the same interface as the device path in
:mod:`pytextgcn_tpu.build.windows`. This is the C++ equivalent of the
reference's Cython extension build (/root/reference/textgcn/lib/clib/
setup.py:13-20) — no Cython, no pybind11; plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "graphbuilder.cpp")
_SO = os.path.join(_HERE, "native", "libtgnative.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-fPIC",
        "-shared",
        "-pthread",
        _SRC,
        "-o",
        _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_native() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)

        lib.tg_sliding_window.restype = ctypes.c_uint64
        lib.tg_sliding_window.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.tg_word_word_edges.restype = ctypes.c_int32
        lib.tg_word_word_edges.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.tg_free.restype = None
        lib.tg_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def native_sliding_window_counts(
    tokens: np.ndarray, n_vocab: int, window_size: int, n_threads: int = 0
) -> Tuple[np.ndarray, int]:
    """Packed triangular pair counts + window count via the C++ kernel.
    Mirrors the reference's test hook ``sliding_window_tester``
    (graphbuilder.pyx:263-275)."""
    lib = load_native()
    tokens = np.ascontiguousarray(tokens, dtype=np.int32)
    n_docs, seq_len = tokens.shape
    cij = np.zeros((n_vocab * (n_vocab + 1)) // 2, dtype=np.uint32)
    n_windows = lib.tg_sliding_window(
        tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_docs,
        seq_len,
        n_vocab,
        window_size,
        n_threads,
        cij.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return cij, int(n_windows)


def native_word_word_edges(
    tokens: np.ndarray, n_vocab: int, window_size: int = 20, n_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Full counting + PMI + COO extraction in C++.
    Returns (coo [E,2] int32, weights [E] float32, n_windows); arrays are
    copies owned by numpy (the reference leaks its malloc'd buffers by
    wrapping them without an owner, graphbuilder.pyx:65-66 — we don't)."""
    lib = load_native()
    tokens = np.ascontiguousarray(tokens, dtype=np.int32)
    n_docs, seq_len = tokens.shape
    coo_p = ctypes.POINTER(ctypes.c_int32)()
    w_p = ctypes.POINTER(ctypes.c_float)()
    n_edges = ctypes.c_int64()
    n_windows = ctypes.c_uint64()
    rc = lib.tg_word_word_edges(
        tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_docs,
        seq_len,
        n_vocab,
        window_size,
        n_threads,
        ctypes.byref(coo_p),
        ctypes.byref(w_p),
        ctypes.byref(n_edges),
        ctypes.byref(n_windows),
    )
    if rc != 0:
        raise MemoryError("native graph builder failed to allocate")
    e = n_edges.value
    try:
        coo = np.ctypeslib.as_array(coo_p, shape=(e, 2)).copy() if e else np.zeros((0, 2), np.int32)
        wgt = np.ctypeslib.as_array(w_p, shape=(e,)).copy() if e else np.zeros(0, np.float32)
    finally:
        lib.tg_free(coo_p)
        lib.tg_free(w_p)
    return coo, wgt, int(n_windows.value)

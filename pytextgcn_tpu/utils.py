"""Small runtime utilities."""

from __future__ import annotations

import ctypes
import os
import sys

_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4
_tuned = False


def tune_allocator() -> bool:
    """Keep large malloc blocks on the heap instead of per-allocation mmaps.

    glibc serves big allocations (every large numpy array) via mmap and
    munmaps them on free, so each one pays first-touch page faults. On
    virtualized hosts with lazily-backed memory (e.g. the firecracker VM
    this framework is developed on) faulting runs at ~10 MB/s — two orders
    of magnitude slower than the RAM — and dominates host-side graph/plan
    builds. Raising M_MMAP_THRESHOLD makes freed pages stay faulted-in and
    reused at full speed. Trade-off: freed memory stays with the process.

    Disable with PYTEXTGCN_NO_MALLOPT=1. Returns True if applied.
    """
    global _tuned
    if _tuned or os.environ.get("PYTEXTGCN_NO_MALLOPT") == "1":
        return _tuned
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6")
        ok = libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30) == 1
        ok = libc.mallopt(_M_MMAP_MAX, 0) == 1 and ok
        _tuned = bool(ok)
    except OSError:
        return False
    return _tuned

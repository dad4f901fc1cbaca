"""ASan/UBSan + TSan builds of the native counting kernel (SURVEY.md §5
race-detection row: the reference's Cython kernel is single-threaded with
manual malloc/free and a leak-by-design numpy wrap, graphbuilder.pyx:44-66;
our kernel is threaded, so it runs its golden + fuzz checks under
sanitizer-instrumented builds in CI)."""

import os
import subprocess
import sys

import pytest

from pytextgcn_tpu.build.native_bridge import build_sanitized, sanitizer_runtime


@pytest.mark.parametrize(
    "mode,opts",
    [
        (
            "asan",
            {
                # python itself leaks by sanitizer standards; UB and memory
                # errors in the kernel still abort
                "ASAN_OPTIONS": "detect_leaks=0:abort_on_error=1",
                "UBSAN_OPTIONS": "halt_on_error=1",
            },
        ),
        (
            "tsan",
            {
                "TSAN_OPTIONS": "halt_on_error=1",
                "OPENBLAS_NUM_THREADS": "1",
            },
        ),
    ],
)
def test_native_kernel_under_sanitizer(mode, opts):
    so = build_sanitized(mode)
    rt = sanitizer_runtime(mode)
    assert os.path.exists(rt), rt
    env = dict(os.environ)
    env.update(opts)
    env.update(
        {
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "LD_PRELOAD": rt,
        }
    )
    worker = os.path.join(os.path.dirname(__file__), "sanitized_worker.py")
    r = subprocess.run(
        [sys.executable, worker, so],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "SAN_OK" in r.stdout, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"

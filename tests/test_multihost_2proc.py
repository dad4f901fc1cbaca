"""Multi-process jax.distributed: a real 2-process CPU cluster + failure
paths of init_distributed (the reference has nothing distributed to compare
against, SURVEY.md §2.4 — this is framework-native coverage)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_spmm():
    """Spawn two real processes, form a jax.distributed group, run one
    edge-partitioned SpMM over the 2-device global mesh in each, and check
    against the numpy oracle (see twoproc_worker.py)."""
    worker = os.path.join(os.path.dirname(__file__), "twoproc_worker.py")
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.update(
        {
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            # one CPU device per process (the runner's conftest forces 8
            # in-process; the workers must not inherit that)
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        }
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, addr, str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "TWOPROC_OK" in out, out


def test_init_distributed_reraises_explicit_cluster_failure(monkeypatch):
    """A cluster that was explicitly requested but fails to form must raise,
    not silently fall back to single-process."""
    import jax

    from pytextgcn_tpu.parallel import multihost

    monkeypatch.setattr(multihost, "_init_done", False)

    def boom(**kwargs):
        raise RuntimeError("failed to connect to coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator"):
        multihost.init_distributed("10.0.0.1:1234", num_processes=2, process_id=0)
    # the flag must not be latched by the failure
    assert multihost._init_done is False


def test_init_distributed_autodetect_falls_back(monkeypatch):
    """With no explicit coordinator, a missing-cluster error means plain
    single-process operation."""
    import jax

    from pytextgcn_tpu.parallel import multihost

    monkeypatch.setattr(multihost, "_init_done", False)

    def boom(**kwargs):
        raise RuntimeError("Could not detect cluster environment")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    multihost.init_distributed()  # must not raise
    assert multihost._init_done is True

"""Multi-host communication backend (SURVEY.md §5.8).

The reference's "distributed" story is descriptor files + PSOCK sockets on
one node (``R/bigKRLS.R:337-354``); the TPU-native replacement is
``jax.distributed`` + mesh shardings.  These tests exercise it for real:
a 2-process CPU cluster is spawned as subprocesses (the analog of the
reference's own in-process PSOCK test hack, ``tests/testthat.R:5``), forms
a global mesh, and runs a sharded GEMM checked on both hosts.
"""
import os
import socket
import subprocess
import sys

import jax

from bigkrls_tpu.parallel.distributed import (global_mesh,
                                              initialize_distributed,
                                              process_info)

_WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster_forms_mesh_and_runs_sharded_gemm():
    addr = f"127.0.0.1:{_free_port()}"
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)          # worker pins its own device count
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU tunnel out of it
    procs = [
        subprocess.Popen([sys.executable, _WORKER, addr, str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in (0, 1)
    ]
    try:
        outs = [p.communicate(timeout=300)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK process={i}" in out, out
    # Both hosts computed the same replicated result — for the sharded
    # GEMM and for the full end-to-end fit() (λ and coefficient checksum).
    for key in ("trace=", "fitsum=", "lam="):
        v0 = outs[0].split(key)[1].split()[0]
        v1 = outs[1].split(key)[1].split()[0]
        assert v0 == v1, (key, v0, v1)


def test_single_host_noarg_initialize_is_a_noop():
    # Backends are already up in the test process and no cluster env is
    # set, so the no-arg call must fall back to single-process cleanly.
    n = initialize_distributed()
    assert n == len(jax.devices()) == 8


def test_explicit_bad_cluster_request_raises():
    # An explicit multi-process request that cannot form must error, not
    # silently downgrade to one host (round-1 review finding).
    import pytest
    with pytest.raises((ValueError, RuntimeError)):
        initialize_distributed(coordinator_address=None, num_processes=2,
                               process_id=0)


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("i", "j")
    assert process_info()["process_count"] == 1

"""One process of a 2-process ``jax.distributed`` CPU cluster.

Spawned by ``tests/test_distributed.py`` (argv: coordinator_address
process_id).  Proves the multi-host path the reference never had
(SURVEY.md §5.8): the coordinator forms, a global 2-D mesh spans both
processes' devices, and a sharded GEMM with a cross-process all-gather
returns the right answer on every host.
"""
import os
import sys

# Must be set before JAX initializes any backend; this script never
# imports tests/conftest.py.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=2").strip()

import numpy as np  # noqa: E402


def main() -> None:
    addr, pid = sys.argv[1], int(sys.argv[2])
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bigkrls_tpu.parallel.distributed import (global_mesh,
                                                  initialize_distributed,
                                                  is_initialized,
                                                  process_info)

    n_global = initialize_distributed(
        coordinator_address=addr, num_processes=2, process_id=pid)
    assert is_initialized()
    assert n_global == 4, f"expected 4 global devices, got {n_global}"
    info = process_info()
    assert info["process_count"] == 2, info
    assert info["local_devices"] == 2, info

    # Idempotent second call must not re-start the coordinator.
    assert initialize_distributed() == 4

    mesh = global_mesh()
    assert mesh.devices.shape == (2, 2), mesh.devices.shape

    # Deterministic global GEMM: A block-sharded over ("i","j") — each
    # process holds only half the rows — B replicated, output replicated
    # so XLA must emit a cross-process all-gather for the check below.
    A = np.arange(64, dtype=np.float64).reshape(8, 8)
    B = np.eye(8, dtype=np.float64) * 2.0 + 1.0
    A_g = jax.make_array_from_callback(
        A.shape, NamedSharding(mesh, P("i", "j")), lambda idx: A[idx])
    for shard in A_g.addressable_shards:
        assert shard.data.shape == (4, 4)  # genuinely partitioned
    B_g = jax.device_put(jnp.asarray(B), NamedSharding(mesh, P()))

    gemm = jax.jit(lambda a, b: a @ b,
                   out_shardings=NamedSharding(mesh, P()))
    C = gemm(A_g, B_g)
    assert C.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(C), A @ B)

    # ---- end-to-end fit() across the process boundary (VERDICT r02 #3):
    # the full dense pipeline — kernel, eig, λ search, solve, derivatives
    # — over a mesh whose devices live in two processes.  Both hosts must
    # agree with the single-process fit to f64 tolerance.
    import bigkrls_tpu as bk

    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(42)
    n, p = 64, 3
    X = rng.normal(size=(n, p))
    X[:, 2] = (X[:, 2] > 0).astype(float)
    y = np.asarray(np.sin(X[:, 0]) + X[:, 1] + 0.8 * X[:, 2]
                   + 0.2 * rng.normal(size=n))

    m_local = bk.fit(y, X, noisy=False)            # single-process oracle
    m_dist = bk.fit(y, X, noisy=False, mesh=mesh)  # spans both processes

    assert abs(m_local.lambda_ - m_dist.lambda_) < 1e-9, \
        (m_local.lambda_, m_dist.lambda_)
    assert np.max(np.abs(m_local.coeffs - m_dist.coeffs)) < 1e-9
    assert np.max(np.abs(m_local.yfitted - m_dist.yfitted)) < 1e-9
    assert np.max(np.abs(m_local.derivatives - m_dist.derivatives)) < 1e-8
    assert np.allclose(m_local.var_avgderivatives,
                       m_dist.var_avgderivatives)
    assert m_local.lastkeeper == m_dist.lastkeeper
    rep = m_dist.sharding_report
    assert rep is not None and not rep["K"]["replicated"], rep
    assert rep["K"]["devices"] == 4, rep
    # this process only addresses its own half of the kernel's rows
    assert rep["K"]["shard_shape"][0] < n, rep

    # ---- distributed block-Jacobi across the process boundary: the
    # hybrid sweep's sharded stripe einsums + replicated host pair-eigh
    # must work when the mesh spans two processes ("auto" would pick
    # replicated eigh at this size per the memory crossover, so force
    # the jacobi side explicitly)
    mj = bk.fit(y, X, noisy=False, mesh=mesh, eig_method="jacobi")
    assert mj.eig_path == "stepwise:jacobi"
    assert abs(m_local.lambda_ - mj.lambda_) < 1e-9
    assert np.max(np.abs(m_local.coeffs - mj.coeffs)) < 1e-8
    assert not mj.sharding_report["Q"]["replicated"]

    # ---- streaming ring fit across the process boundary (VERDICT r03
    # #4): fit(streaming=True, mesh=...) routes every K@V product
    # through the shard_map+ppermute ring — the ppermute collectives now
    # provably cross a REAL process boundary (DCN-analog on CPU), which
    # the single-process 8-device dryrun cannot show.  Must agree with
    # the single-process streaming fit.
    ms_local = bk.fit(y, X, noisy=False, streaming=True, neig=n // 4)
    ms_dist = bk.fit(y, X, noisy=False, streaming=True, neig=n // 4,
                     mesh=mesh)
    assert ms_dist.K is None
    assert abs(ms_local.lambda_ - ms_dist.lambda_) < 1e-8, \
        (ms_local.lambda_, ms_dist.lambda_)
    assert np.max(np.abs(ms_local.coeffs - ms_dist.coeffs)) < 1e-8
    assert np.max(np.abs(ms_local.yfitted - ms_dist.yfitted)) < 1e-8
    assert np.max(np.abs(ms_local.derivatives - ms_dist.derivatives)) < 1e-7
    reps = ms_dist.sharding_report
    # no device (hence no process) holds X or the eigenbasis whole
    assert not reps["X_std"]["replicated"], reps
    assert reps["X_std"]["shard_shape"][0] == n // 4, reps
    assert not reps["Q"]["replicated"], reps
    assert reps["Q"]["shard_shape"][0] < n, reps

    # ---- adaptive route across the process boundary (ADVICE r04):
    # postkernel_adaptive's single fused program (Krylov + moments +
    # bounds + golden + solve) runs under a mesh spanning two processes;
    # its small outputs (values/moments/lastkeeper/L/U) must be
    # fetchable on every host — the _fetch_replicated reshard — and
    # λ*/coefficients must agree with the single-process adaptive fit.
    na = 256
    Xa = rng.normal(size=(na, p))
    Xa[:, 2] = (Xa[:, 2] > 0).astype(float)
    ya = np.asarray(np.sin(Xa[:, 0]) + Xa[:, 1] + 0.8 * Xa[:, 2]
                    + 0.2 * rng.normal(size=na))
    ma_local = bk.fit(ya, Xa, noisy=False, eigtrunc=0.01,
                      eig_method="adaptive")
    ma_dist = bk.fit(ya, Xa, noisy=False, eigtrunc=0.01,
                     eig_method="adaptive", mesh=mesh)
    assert ma_local.eig_path.startswith("adaptive-krylov"), ma_local.eig_path
    assert ma_dist.eig_path.startswith("adaptive-krylov"), ma_dist.eig_path
    assert abs(ma_local.lambda_ - ma_dist.lambda_) < 1e-9, \
        (ma_local.lambda_, ma_dist.lambda_)
    assert np.max(np.abs(ma_local.coeffs - ma_dist.coeffs)) < 1e-8
    assert not ma_dist.sharding_report["Q"]["replicated"]

    fit_sum = float(np.sum(m_dist.coeffs))
    print(f"OK process={pid} trace={float(np.asarray(C).trace())} "
          f"fitsum={fit_sum:.12f} lam={m_dist.lambda_:.12f} "
          f"slam={ms_dist.lambda_:.12f}")


if __name__ == "__main__":
    main()

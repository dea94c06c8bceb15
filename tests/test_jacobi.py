"""Distributed full-spectrum eigensolver (VERDICT r02 missing #1 /
next-round #2; SURVEY.md §7 hard part #1).

Done-bar from the verdict: a mesh fit with ``neig = n`` whose eig-phase
large intermediates are partitioned across the 8-device mesh, plus parity
vs the single-device fit.  The Jacobi analog of "basis B / K·B" is the
working operator A and accumulated eigenvectors Q — the sharded-sweep test
asserts both stay genuinely partitioned through a full sweep.

Reference anchor: the full path is single-node ``arma::eig_sym``
(``/root/reference/src/eigen.cpp:33-38``); block Jacobi replaces it with
all-GEMM sweeps that XLA shards over the mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bigkrls_tpu as bk
from bigkrls_tpu.ops.eig import eigensystem
from bigkrls_tpu.ops.kernels import gauss_kernel
from bigkrls_tpu.parallel.jacobi import (_blocking, block_jacobi_eigh,
                                         round_robin_schedule)
from bigkrls_tpu.parallel.sharded import block_sharding, make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(devices=jax.devices()[:8])


def test_round_robin_schedule_covers_all_pairs():
    for nb in (2, 4, 8, 14):
        sched = round_robin_schedule(nb)
        assert sched.shape == (nb - 1, nb // 2, 2)
        seen = {tuple(p) for rnd in sched for p in rnd}
        assert len(seen) == nb * (nb - 1) // 2
        for rnd in sched:   # disjoint within a round
            flat = [x for p in rnd for x in p]
            assert len(set(flat)) == len(flat)


def test_blocking_even_and_covering():
    for n in (64, 61, 3106, 4096):
        b, nb, n_pad = _blocking(n)
        assert nb % 2 == 0 and b * nb == n_pad and n_pad >= n
        assert n_pad - n < b   # minimal padding


def test_jacobi_matches_eigh_indefinite():
    """General symmetric matrix with negative eigenvalues, no padding."""
    rng = np.random.default_rng(3)
    n = 96
    A = rng.normal(size=(n, n))
    A = jnp.asarray(0.5 * (A + A.T))
    vals, vecs = block_jacobi_eigh(A, target_block=16)
    vals_ref, vecs_ref = jnp.linalg.eigh(A)
    assert np.max(np.abs(np.asarray(vals) - np.asarray(vals_ref))) < 1e-10
    # eigenvector parity up to sign
    dots = np.abs(np.sum(np.asarray(vecs) * np.asarray(vecs_ref), axis=0))
    assert np.min(dots) > 1.0 - 1e-9


def test_jacobi_padded_awkward_n():
    """N=61 with target blocks of 8 forces zero-padding; the decoupled pad
    eigenpairs must be filtered out exactly."""
    rng = np.random.default_rng(4)
    n, p = 61, 3
    X = jnp.asarray(rng.normal(size=(n, p)))
    K = gauss_kernel(X, float(p))
    vals, vecs = block_jacobi_eigh(K, target_block=8)
    vals_ref, vecs_ref = jnp.linalg.eigh(K)
    assert vals.shape == (n,) and vecs.shape == (n, n)
    assert np.max(np.abs(np.asarray(vals) - np.asarray(vals_ref))) < 1e-10
    dots = np.abs(np.sum(np.asarray(vecs) * np.asarray(vecs_ref), axis=0))
    assert np.min(dots) > 1.0 - 1e-9


def test_jacobi_sweep_stays_partitioned(mesh):
    """The eig phase's large intermediates (working operator A and
    eigenvector accumulator Q) are genuinely partitioned across the
    8-device mesh after a hybrid sweep (host pair-eigh + sharded stripe
    updates) — the VERDICT done-bar."""
    from bigkrls_tpu.parallel.jacobi import _sweep_hybrid
    rng = np.random.default_rng(5)
    n = 64
    A = rng.normal(size=(n, n))
    A = jnp.asarray(0.5 * (A + A.T))
    b, nb, n_pad = _blocking(n, 8)
    assert n_pad == n
    sched = round_robin_schedule(nb)
    As = jax.device_put(A, block_sharding(mesh))
    Qs = jax.device_put(jnp.eye(n), block_sharding(mesh))
    A2, Q2, off = _sweep_hybrid(As, Qs, sched, b, mesh)
    for arr in (A2, Q2):
        assert not arr.sharding.is_fully_replicated
        assert len({s.device for s in arr.addressable_shards}) == 8
        assert arr.addressable_shards[0].data.shape[0] < n
        assert arr.addressable_shards[0].data.shape[1] < n
    # one hybrid sweep = one _sweep (device-eigh) sweep, same math up to
    # the per-pair eigenvector sign/rotation freedom: compare the
    # sign-invariant diagnostics (off-diagonal mass, diagonal entries)
    from bigkrls_tpu.parallel.jacobi import _sweep
    A1, Q1, off1 = _sweep(A, jnp.eye(n), jnp.asarray(sched), b=b)
    assert float(off) == pytest.approx(float(off1), rel=1e-6)
    assert np.allclose(np.sort(np.diag(np.asarray(A2))),
                       np.sort(np.diag(np.asarray(A1))), atol=1e-8)


def test_full_spectrum_mesh_fit_parity_and_distribution(mesh):
    """fit(mesh=..., neig=n): at this size "auto" takes the measured
    fast side of the Jacobi memory crossover (replicated eigh — the
    operator fits per device) but every downstream object is still
    committed partitioned; results match the single-device dense fit.
    The distributed-Jacobi side of the crossover is exercised explicitly
    below (eig_method="jacobi") and auto-selects only when the operator
    cannot be replicated (docs/performance.md)."""
    rng = np.random.default_rng(6)
    n, p = 64, 3
    X = rng.normal(size=(n, p))
    y = np.asarray(np.sin(X[:, 0]) + X[:, 1] + 0.2 * rng.normal(size=n))
    m1 = bk.fit(y, X, noisy=False)
    m2 = bk.fit(y, X, noisy=False, mesh=mesh)
    assert m2.eig_path == "stepwise:auto"
    assert abs(m1.lambda_ - m2.lambda_) < 1e-9
    assert np.max(np.abs(m1.coeffs - m2.coeffs)) < 1e-8
    assert np.max(np.abs(m1.yfitted - m2.yfitted)) < 1e-8
    assert np.max(np.abs(m1.derivatives - m2.derivatives)) < 1e-7
    rep = m2.sharding_report
    assert not rep["Q"]["replicated"]
    assert rep["Q"]["shard_shape"][0] < n


def test_full_spectrum_mesh_fit_jacobi_forced(mesh):
    """fit(mesh=..., eig_method="jacobi"): the distributed-Jacobi side
    of the crossover through the whole pipeline — hybrid sweeps (host
    pair-eigh + sharded stripe updates), partitioned Q, parity with the
    single-device dense fit."""
    rng = np.random.default_rng(6)
    n, p = 64, 3
    X = rng.normal(size=(n, p))
    y = np.asarray(np.sin(X[:, 0]) + X[:, 1] + 0.2 * rng.normal(size=n))
    m1 = bk.fit(y, X, noisy=False)
    m2 = bk.fit(y, X, noisy=False, mesh=mesh, eig_method="jacobi")
    assert m2.eig_path == "stepwise:jacobi"
    assert abs(m1.lambda_ - m2.lambda_) < 1e-9
    assert np.max(np.abs(m1.coeffs - m2.coeffs)) < 1e-8
    assert np.max(np.abs(m1.yfitted - m2.yfitted)) < 1e-8
    rep = m2.sharding_report
    assert not rep["Q"]["replicated"]
    assert rep["Q"]["shard_shape"][0] < n


def test_eigensystem_jacobi_method_explicit():
    rng = np.random.default_rng(7)
    n, p = 48, 3
    X = jnp.asarray(rng.normal(size=(n, p)))
    K = gauss_kernel(X, float(p))
    e1 = eigensystem(K, method="jacobi")
    e0 = eigensystem(K, method="full")
    assert np.max(np.abs(np.asarray(e1.values_full)
                         - np.asarray(e0.values_full))) < 1e-10
    assert e1.lastkeeper == e0.lastkeeper
"""Iterative-eigensolver λ-parity on a slowly-decaying spectrum
(SURVEY.md §7 hard parts #1–2; VERDICT r01 next-round item 5).

The reference's λ* sits inside nested bound heuristics and a golden-section
search (``R/bigKRLS_Rcpp_functions.R:16-37``); tiny eigenvalue deviations
can shift the selected λ.  The hard case for iterative solvers is a flat,
slowly-decaying spectrum (λₖ ∝ 1/k — the real election data keeps 2895 of
3106 eigenvalues, i.e. its spectrum is exactly this shape).  Every
truncated path — block-Krylov "subspace", Lanczos, and the kernel-free
streaming solver — must select the same λ* as the exact full ``eigh`` and
agree on the coefficients to ≤1e-6 in f64.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bigkrls_tpu.lambda_search import lambda_search
from bigkrls_tpu.ops.eig import eigensystem, eigensystem_streaming
from bigkrls_tpu.ops.kernels import gauss_kernel
from bigkrls_tpu.ops.solve import solve_for_c
from bigkrls_tpu.types import Eigensystem

N, K_TRUNC = 3072, 384


@pytest.fixture(scope="module")
def slow_decay():
    """K = Q diag(N/k) Qᵀ — a 1/k spectrum with no spectral gap anywhere —
    plus the full-path oracle (λ*, coefficients) computed from exact eigh."""
    rng = np.random.default_rng(7)
    lams = N / np.arange(1, N + 1)
    Q = np.linalg.qr(rng.normal(size=(N, N)))[0]
    K = (Q * lams) @ Q.T
    K = 0.5 * (K + K.T)
    y = rng.normal(size=N)
    y = (y - y.mean()) / y.std(ddof=1)
    Kj, yj = jnp.asarray(K), jnp.asarray(y)
    full = eigensystem(Kj, neig=K_TRUNC, method="full")
    lam = lambda_search(full, yj)
    _, c = solve_for_c(full, yj, lam)
    return Kj, yj, full, float(lam), np.asarray(c)


def _check_parity(eig, yj, lam_full, c_full, tol_eig, tol_c):
    vals = np.asarray(eig.values_full)
    lam = float(lambda_search(eig, yj))
    _, c = solve_for_c(eig, yj, lam)
    assert lam == pytest.approx(lam_full, rel=1e-9)
    assert np.max(np.abs(np.asarray(c) - c_full)) < tol_c
    return vals


def test_subspace_lambda_parity(slow_decay):
    Kj, yj, full, lam_full, c_full = slow_decay
    eig = eigensystem(Kj, neig=K_TRUNC, method="subspace")  # default iters
    vals = _check_parity(eig, yj, lam_full, c_full, 1e-10, 1e-6)
    vf = np.asarray(full.values_full)
    # trailing eigenvalues — the part plain power iteration gets wrong —
    # must match to near machine precision with the block-Krylov solver
    assert np.max(np.abs(vals - vf) / vf) < 1e-10


def test_subspace_lambda_parity_aggressive_ratio(slow_decay):
    """ADVICE r02: the auto-routing comment in ops/eig.py claims parity at
    truncation ratios ≥ 8 — pin an aggressive one (N/32, i.e. the regime
    of the bench's neig=50 on N=3106) rather than just N/8."""
    Kj, yj, _, _, _ = slow_decay
    k = N // 32   # 96
    full = eigensystem(Kj, neig=k, method="full")
    lam_full = float(lambda_search(full, yj))
    _, c_full = solve_for_c(full, yj, lam_full)
    eig = eigensystem(Kj, neig=k, method="subspace")
    vals = _check_parity(eig, yj, lam_full, np.asarray(c_full), 1e-10, 1e-6)
    vf = np.asarray(full.values_full)
    assert np.max(np.abs(vals - vf) / vf) < 1e-10


def test_lanczos_lambda_parity(slow_decay):
    Kj, yj, full, lam_full, c_full = slow_decay
    eig = eigensystem(Kj, neig=K_TRUNC, method="lanczos")
    vals = _check_parity(eig, yj, lam_full, c_full, 1e-10, 1e-6)
    vf = np.asarray(full.values_full)
    assert np.max(np.abs(vals - vf) / vf) < 1e-8


def test_streaming_lambda_parity(rng):
    """Kernel-free streaming solver vs dense full path, on a *data-induced*
    flat spectrum: high-dimensional X makes the Gaussian kernel's spectrum
    nearly flat (pairwise distances concentrate), the worst case for the
    power iterations the streaming path is built from."""
    n, p, k = 1024, 60, 160
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = np.sin(X[:, 0]) + X[:, 1] + 0.3 * rng.normal(size=n)
    y = (y - y.mean()) / y.std(ddof=1)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    sigma = float(p)

    K = gauss_kernel(Xj, sigma)
    full = eigensystem(K, neig=k, method="full")
    lam_full = float(lambda_search(full, yj))
    _, c_full = solve_for_c(full, yj, lam_full)

    stream = eigensystem_streaming(Xj, sigma, neig=k, iters=12)
    vals = np.asarray(stream.values_full)
    vf = np.asarray(full.values_full)
    assert np.max(np.abs(vals - vf) / vf) < 1e-9
    lam = float(lambda_search(stream, yj))
    _, c = solve_for_c(stream, yj, lam)
    assert lam == pytest.approx(lam_full, rel=1e-9)
    assert np.max(np.abs(np.asarray(c) - np.asarray(c_full))) < 1e-6


def test_streaming_constant_memory_mode_still_selects_same_lambda(rng):
    """krylov=False (the constant-memory fallback for HBM-bound N) loses
    trailing-eigenvalue accuracy but must still land on the same λ* here."""
    n, p, k = 512, 30, 64
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = X[:, 0] + 0.3 * rng.normal(size=n)
    y = (y - y.mean()) / y.std(ddof=1)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    sigma = float(p)

    K = gauss_kernel(Xj, sigma)
    full = eigensystem(K, neig=k, method="full")
    lam_full = float(lambda_search(full, yj))

    plain = eigensystem_streaming(Xj, sigma, neig=k, iters=30, krylov=False)
    lam = float(lambda_search(plain, yj))
    assert lam == pytest.approx(lam_full, rel=1e-6)

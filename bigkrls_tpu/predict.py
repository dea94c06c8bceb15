"""Out-of-sample prediction with standard errors.

Equivalent of ``predict.bigKRLS`` (``R/bigKRLS.R:547-637``; call stack
SURVEY.md §3.2):

* training X and newdata are both re-standardized by the *training*
  moments (``:590-597``). Unlike the reference, the stored model is not
  mutated (the reference standardizes ``object$X`` in place each call — a
  documented quirk, SURVEY.md §3.2 note);
* cross kernel ``K_new`` via ``ops/kernels.cross_kernel``
  (ref ``bTempKernel``, ``:599``);
* ``ŷ = K_new·c`` rescaled by sd(y), mean(y) (``:601, 621``);
* prediction variance ``Var(pred) = K_new · Var(c) · K_newᵀ`` (``:608`` —
  the reference's var(y)·(1/var(y)) dance cancels exactly). Computed here
  from the factored Var(c) so only the O(U·k) diagonal is ever formed
  unless the caller asks for the dense matrix;
* the ``correct_SE`` scaling multiplies the *covariance* by √(N/Neff)
  before the square root of the diagonal is taken (``:610-613``) — i.e.
  the reported se is (N/Neff)^{1/4}·√diag.  This reference quirk is
  replicated verbatim for parity;
* **streaming scale** (VERDICT r02 #9): the reference materializes the
  full U×N cross kernel (``src/temp_kernel.cpp``), which at N=500k and
  U=1000 is already a 0.5 GB single matrix.  When ``U·N`` exceeds
  ``block_size`` elements (or the caller passes ``block_size``), newdata
  is processed in row blocks — each block's cross kernel, prediction and
  SE diagonal are computed and discarded — so memory stays O(block·N).
  Blocked predictions return ``newdataK=None`` (storing U×N is the thing
  being avoided; this is stated here rather than silently).
"""
from __future__ import annotations



import jax.numpy as jnp
import numpy as np

from .ops.kernels import cross_kernel
from .types import KRLSModel, KRLSPrediction


# beyond this many U·N cross-kernel elements, predict() auto-switches to
# the blocked streaming path (≈200 MB of f32 at the default)
AUTO_BLOCK_ELEMS = 50_000_000


def predict(
    model: KRLSModel,
    newdata,
    se_pred: bool = False,
    correct_SE: bool = True,
    ytest=None,
    materialize_vcov: bool = False,
    precision: str = "highest",
    block_size: int = None,
) -> KRLSPrediction:
    import jax
    with jax.default_matmul_precision(precision):
        return _predict_impl(model, newdata, se_pred, correct_SE, ytest,
                             materialize_vcov, block_size)


def _predict_impl(
    model: KRLSModel,
    newdata,
    se_pred: bool,
    correct_SE: bool,
    ytest,
    materialize_vcov: bool,
    block_size=None,
) -> KRLSPrediction:
    newdata_np = np.asarray(newdata, dtype=np.float64)
    if newdata_np.ndim == 1:
        newdata_np = newdata_np[:, None]
    if newdata_np.shape[1] != model.p:
        raise ValueError("ncol(newdata) differs from ncol(X) of the fitted model")
    if se_pred and model.vcov_c_factored is None:
        raise ValueError(
            "refit with vcov_est=True to compute standard errors on predictions")

    if model.K is not None and hasattr(model.K, "dtype"):
        dtype = model.K.dtype
    else:
        dtype = jnp.asarray(model.coeffs).dtype
    # re-standardize by training moments computed from the stored X
    # (ref :590-597 recomputes colmean/colsd of object$X)
    Xm = model.X.mean(axis=0)
    Xs = model.X.std(axis=0, ddof=1)
    X_std = jnp.asarray((model.X - Xm) / Xs, dtype=dtype)
    new_std = jnp.asarray((newdata_np - Xm) / Xs, dtype=dtype)

    U, n = new_std.shape[0], X_std.shape[0]
    if block_size is None and U * n > AUTO_BLOCK_ELEMS:
        block_size = max(1, AUTO_BLOCK_ELEMS // n)
        # no-silent-caps (ADVICE r03): auto-blocking changes the return
        # contract — newdataK comes back None because storing the U×N
        # cross kernel is exactly what this path avoids
        import logging
        logging.getLogger("bigkrls_tpu").warning(
            "predict: U*N = %d cross-kernel elements exceeds %d; switching "
            "to the blocked streaming path (block_size=%d). "
            "prediction.newdataK will be None — pass block_size >= "
            "nrow(newdata) to force the dense cross kernel if you need it "
            "(and have the memory).", U * n, AUTO_BLOCK_ELEMS, block_size)
    blocked = block_size is not None and block_size < U
    if blocked and materialize_vcov:
        raise ValueError(
            "materialize_vcov builds the dense U x U prediction covariance "
            "and needs the full cross kernel; pass block_size=None (and "
            "enough memory) to request it at this scale.")

    coeffs = jnp.asarray(model.coeffs, dtype=dtype)
    fac = model.vcov_c_factored  # original y units already (scale=sd(y)²)
    corr = 1.0
    if se_pred and correct_SE and model.neffective is not None:
        corr = float(np.sqrt(model.n / model.neffective))

    se = None
    vcov_pred = None
    if blocked:
        # streaming path: per-block cross kernel, prediction, SE diagonal;
        # the U×N kernel is never held whole (module docstring)
        Knew = None
        ypred_std = np.empty(U, dtype=np.float64)
        if se_pred:
            se = np.empty(U, dtype=np.float64)
        for lo in range(0, U, block_size):
            hi = min(lo + block_size, U)
            Kb = cross_kernel(new_std[lo:hi], X_std, model.sigma)
            ypred_std[lo:hi] = np.asarray(Kb @ coeffs, dtype=np.float64)
            if se_pred:
                d = fac.quad_form_diag(Kb.T) * corr
                se[lo:hi] = np.sqrt(np.asarray(d, dtype=np.float64))
        ypred = ypred_std * model.y.std(ddof=1) + model.y.mean()
    else:
        Knew = cross_kernel(new_std, X_std, model.sigma)
        ypred_std = Knew @ coeffs
        ypred = np.asarray(ypred_std, dtype=np.float64) \
            * model.y.std(ddof=1) + model.y.mean()
        if se_pred:
            if materialize_vcov:
                Vp = fac.quad_form(Knew.T) * corr   # (U, U) dense
                vcov_pred = np.asarray(Vp, dtype=np.float64)
                se = np.sqrt(np.diag(vcov_pred))
            else:
                d = fac.quad_form_diag(Knew.T) * corr
                se = np.sqrt(np.asarray(d, dtype=np.float64))

    pseudoR2 = mse = None
    if ytest is not None:
        ytest = np.asarray(ytest, np.float64).reshape(-1)
        if ytest.shape[0] != ypred.shape[0]:
            raise ValueError("ytest length differs from nrow(newdata)")
        # out-of-sample metrics as the reference's CV driver computes them
        # (R/bigKRLS.R:1293-1313): pseudo-R² = cor(pred, ytest)², MSE =
        # mean squared prediction error
        mse = float(np.mean((ytest - ypred) ** 2))
        if ytest.std() > 0 and ypred.std() > 0:
            pseudoR2 = float(np.corrcoef(ypred, ytest)[0, 1] ** 2)

    out = KRLSPrediction(
        predicted=ypred,
        se_pred=se,
        newdata=newdata_np,
        newdataK=(None if Knew is None
                  else np.asarray(Knew, dtype=np.float64)),
        ytest=ytest,
        vcov_est_pred=vcov_pred,
        pseudoR2=pseudoR2,
        MSE=mse,
    )
    return out

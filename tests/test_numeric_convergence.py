"""End-to-end numeric convergence oracle.

The reference's de-facto correctness contract is agreement with the
original KRLS package (``examples/numeric_convergence.md``): cor(coeffs)=1,
AMEs identical to 7 s.f., max|Δderivatives| < 1e-8 at N=500 in double
precision.  R isn't available here, so the same role is played by an
INDEPENDENT textbook implementation below — direct dense formulas, numpy
only, no spectral shortcuts, no shared code with the framework:

    K        = exp(-||xi-xj||²/σ) (explicit loops over pairs)
    c        = (K + λI)⁻¹ y
    dy/dxp   = (-2/σ) Σk (x_ip - x_kp) K_ik c_k      (continuous)
    binary   = first difference of kernel predictions, min→max, /Δ
    Var(c)   = σ̂² (K+λI)⁻¹ K (K+λI)⁻¹ ... computed via the eigen identity
               Q diag(σ̂²/(Λ+λ)²) Qᵀ with numpy's own eigh
    VarAME   = per the reference formulas

and the framework must reproduce it at the reference's tolerances.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import bigkrls_tpu as bk


def _textbook_krls(y, X, sigma, lam):
    n, p = X.shape
    Xs = (X - X.mean(0)) / X.std(0, ddof=1)
    ys = (y - y.mean()) / y.std(ddof=1)

    K = np.empty((n, n))
    for i in range(n):
        K[i] = np.exp(-((Xs[i][None, :] - Xs) ** 2).sum(1) / sigma)

    c = np.linalg.solve(K + lam * np.eye(n), ys)
    yfit_s = K @ c
    sigmasq = float(((ys - yfit_s) ** 2).sum() / n)

    vals, Q = np.linalg.eigh(K)
    Vc = (Q * (sigmasq / (vals + lam) ** 2)) @ Q.T

    deriv = np.empty((n, p))
    var_ame = np.empty(p)
    for j in range(p):
        xj = Xs[:, j]
        uniq = np.unique(xj)
        if uniq.size == 2:
            z0, z1 = uniq
            d = np.empty(n)
            for i in range(n):
                xt = Xs[i].copy(); xt[j] = z1
                xc = Xs[i].copy(); xc[j] = z0
                kt = np.exp(-((xt[None, :] - Xs) ** 2).sum(1) / sigma)
                kc = np.exp(-((xc[None, :] - Xs) ** 2).sum(1) / sigma)
                d[i] = (kt @ c - kc @ c) / (z1 - z0)
            deriv[:, j] = d
            # intended reference variance: 2 sdX² hᵀ V h / N²
            b = (xj == z1).astype(float)
            phi = -((z1 - z0) ** 2) / sigma
            adj_T = ((1 - b)[:, None]) * (1 - 2 * b)[None, :]
            adj_C = (b[:, None]) * (2 * b - 1)[None, :]
            KT = np.exp(adj_T * phi) * K
            KC = np.exp(adj_C * phi) * K
            h = (KT - KC).T @ np.ones(n)
            var_ame[j] = 2.0 / (z1 - z0) ** 2 * (h @ Vc @ h) / n ** 2
        else:
            D = xj[:, None] - xj[None, :]
            L = D * K
            deriv[:, j] = (-2.0 / sigma) * (L @ c)
            s = L @ np.ones(n)
            var_ame[j] = (2.0 / sigma) ** 2 * (s @ Vc @ s) / n ** 2

    # rescale to original units (ref bigKRLS.R:394-407, 428-430)
    ysd = y.std(ddof=1)
    xsd = X.std(0, ddof=1)
    return {
        "coeffs": c,
        "yfitted": yfit_s * ysd + y.mean(),
        "derivatives": deriv * ysd / xsd[None, :],
        "var_ame": var_ame * (ysd / xsd) ** 2,
        "sigmasq": sigmasq,
    }


@pytest.mark.parametrize("with_binary", [False, True])
def test_full_pipeline_vs_textbook(with_binary, rng):
    n, p = 300, 5
    X = rng.normal(size=(n, p))
    if with_binary:
        X[:, 3] = (X[:, 3] > 0.3).astype(float)
    y = np.sin(X[:, 0]) + X @ (0.5 * np.ones(p)) + 0.4 * rng.normal(size=n)
    sigma = float(p)
    lam = 0.8137  # fixed λ isolates the pipeline from search bracketing

    ref = _textbook_krls(y, X, sigma, lam)
    m = bk.fit(y, X, sigma=sigma, lambda_=lam, eigtrunc=0.0, noisy=False)

    # reference contract: cor(coeffs) == 1 (here: max abs diff, stronger)
    assert np.max(np.abs(m.coeffs - ref["coeffs"])) < 1e-8
    assert np.max(np.abs(m.yfitted - ref["yfitted"])) < 1e-8
    # max |Δ derivatives| < 1e-8 (the reference's headline tolerance)
    assert np.max(np.abs(m.derivatives - ref["derivatives"])) < 1e-8
    # AMEs to 7 significant figures
    ame_ref = ref["derivatives"].mean(0)
    rel = np.abs(m.avgderivatives - ame_ref) / np.maximum(
        np.abs(ame_ref), 1e-12)
    assert np.max(rel) < 1e-7
    assert np.allclose(m.var_avgderivatives, ref["var_ame"], rtol=1e-8)
    assert abs(m.sigmasq_std - ref["sigmasq"]) < 1e-10


def test_searched_lambda_pipeline_vs_textbook(rng):
    """With the golden search engaged, feed the framework's λ* into the
    textbook pipeline — everything downstream must still agree at 1e-8."""
    n, p = 250, 4
    X = rng.normal(size=(n, p))
    y = np.cos(X[:, 1]) + X @ np.ones(p) + 0.5 * rng.normal(size=n)
    m = bk.fit(y, X, eigtrunc=0.0, noisy=False)
    ref = _textbook_krls(y, X, float(p), m.lambda_)
    assert np.max(np.abs(m.coeffs - ref["coeffs"])) < 1e-8
    assert np.max(np.abs(m.derivatives - ref["derivatives"])) < 1e-8

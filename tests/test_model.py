"""End-to-end fit tests, including the reference's golden values
(``tests/testthat/test_basic_usage.R``): the Toyota Corolla kernel row
(tolerance 0.01) and the counterfactual prediction quantile 0.6875."""
import jax.numpy as jnp
import numpy as np
import pytest

import bigkrls_tpu as bk
from data_mtcars import (COROLLA_INDEX, COROLLA_KERNEL_GOLDEN, mtcars_xy)


@pytest.fixture(scope="module")
def mtcars_fit():
    y, X, labs = mtcars_xy()
    return bk.fit(y, X, eigtrunc=0.0, xlabs=labs, noisy=False), y, X


def test_corolla_kernel_row_golden(mtcars_fit):
    model, y, X = mtcars_fit
    s = np.asarray(model.K)[:, COROLLA_INDEX]
    assert np.max(np.abs(s - COROLLA_KERNEL_GOLDEN)) < 0.01
    assert s[COROLLA_INDEX] == 1.0


def test_prediction_quantile_golden(mtcars_fit):
    """Reference: Xnew = mtcars[,-1] with hp := 200;
    mean(pred < mpg) == 0.6875 (``test_basic_usage.R:55-58``)."""
    model, y, X = mtcars_fit
    Xnew = X.copy()
    Xnew[:, 2] = 200.0   # hp is column 3 of mtcars => index 2 of X
    forecast = bk.predict(model, Xnew)
    assert np.mean(forecast.predicted < y) == 0.6875


def test_fit_quality_and_fields(mtcars_fit):
    model, y, X = mtcars_fit
    n, p = X.shape
    assert model.R2 > 0.8
    assert model.lambda_ > 0
    assert 0 < model.neffective < n
    assert model.K_eigenvalues.shape == (n,)
    assert model.lastkeeper <= n
    assert model.derivatives.shape == (n, p)
    assert model.avgderivatives.shape == (p,)
    assert model.var_avgderivatives.shape == (p,)
    assert (model.var_avgderivatives > 0).all()
    # vs (idx 6) and am (idx 7) are binary in mtcars X
    assert model.binaryindicator[6] and model.binaryindicator[7]
    assert not model.binaryindicator[0]
    # lazy dense covariances
    Vc = model.vcov_est_c
    assert Vc.shape == (n, n)
    assert np.allclose(Vc, Vc.T)
    Vf = model.vcov_est_fitted
    assert Vf.shape == (n, n)
    assert np.all(np.diag(np.asarray(Vf)) > 0)


def test_summary_runs(mtcars_fit):
    model, y, X = mtcars_fit
    s = bk.summary(model)
    assert s.ttests.shape == (X.shape[1], 4)
    assert ((0 <= s.ttests[:, 3]) & (s.ttests[:, 3] <= 1)).all()
    assert s.percentiles.shape == (X.shape[1], 5)
    # binary labels flagged
    assert s.labels[6].endswith("*") and s.labels[7].endswith("*")
    text = str(s)
    assert "lambda" in text and "Average Marginal Effects" in text
    s2 = bk.summary(model, degrees="N")
    assert not np.allclose(s2.ttests[:, 3], s.ttests[:, 3])


def test_fitted_values_consistency(mtcars_fit):
    """ŷ must equal K c rescaled; in-sample prediction must reproduce ŷ."""
    model, y, X = mtcars_fit
    pred = bk.predict(model, X)
    assert np.max(np.abs(pred.predicted - model.yfitted)) < 1e-8


def test_predict_with_se(mtcars_fit):
    model, y, X = mtcars_fit
    pred = bk.predict(model, X[:10], se_pred=True)
    assert pred.se_pred.shape == (10,)
    assert (pred.se_pred > 0).all()
    # materialized vcov agrees with the factored diagonal path
    pred2 = bk.predict(model, X[:10], se_pred=True, materialize_vcov=True)
    assert np.allclose(pred2.se_pred, pred.se_pred)
    assert np.allclose(np.sqrt(np.diag(pred2.vcov_est_pred)), pred.se_pred)
    # the correct_SE quirk: se scales by (N/Neff)^(1/4)
    pred3 = bk.predict(model, X[:10], se_pred=True, correct_SE=False)
    ratio = pred.se_pred / pred3.se_pred
    expected = (model.n / model.neffective) ** 0.25
    assert np.allclose(ratio, expected)


def test_fixed_lambda_and_sigma(rng):
    n, p = 60, 3
    X = rng.normal(size=(n, p))
    y = X @ np.ones(p) + 0.1 * rng.normal(size=n)
    m = bk.fit(y, X, lambda_=0.7, sigma=5.0, noisy=False)
    assert m.lambda_ == 0.7 and m.sigma == 5.0
    # coefficients must solve (K + λI)c = y_std in the untruncated case
    y_std = (y - y.mean()) / y.std(ddof=1)
    K = np.asarray(m.K)
    res = (K + 0.7 * np.eye(n)) @ m.coeffs - y_std
    assert np.max(np.abs(res)) < 1e-8


def test_which_derivatives(rng):
    n, p = 50, 4
    X = rng.normal(size=(n, p))
    y = X @ np.ones(p) + 0.1 * rng.normal(size=n)
    m_all = bk.fit(y, X, noisy=False)
    m_sub = bk.fit(y, X, which_derivatives=[0, 2], noisy=False)
    assert m_sub.derivatives.shape == (n, 2)
    assert np.allclose(m_sub.derivatives, m_all.derivatives[:, [0, 2]])
    assert np.allclose(m_sub.var_avgderivatives,
                       m_all.var_avgderivatives[[0, 2]])
    s = bk.summary(m_sub)
    assert len(s.labels) == 2


def test_validation_errors(rng):
    X = rng.normal(size=(20, 3))
    y = rng.normal(size=20)
    Xc = X.copy(); Xc[:, 1] = 2.0
    with pytest.raises(ValueError, match="constant"):
        bk.fit(y, Xc, noisy=False)
    Xn = X.copy(); Xn[3, 0] = np.nan
    with pytest.raises(ValueError, match="missing"):
        bk.fit(y, Xn, noisy=False)
    with pytest.raises(ValueError, match="nrow"):
        bk.fit(y[:10], X, noisy=False)
    with pytest.raises(ValueError, match="constant"):
        bk.fit(np.ones(20), X, noisy=False)
    with pytest.raises(ValueError, match="vcov_est"):
        bk.fit(y, X, vcov_est=False, derivative=True, noisy=False)


def test_rescaling_invariance(rng):
    """Fitted values, R², derivatives in original units must be invariant to
    affine rescaling of inputs (the standardization contract)."""
    n, p = 60, 3
    X = rng.normal(size=(n, p))
    y = np.sin(X[:, 0]) + X @ np.ones(p) + 0.2 * rng.normal(size=n)
    m1 = bk.fit(y, X, noisy=False)
    X2 = X * np.array([2.0, 0.5, 10.0]) + np.array([1.0, -3.0, 100.0])
    y2 = 5.0 * y - 7.0
    m2 = bk.fit(y2, X2, noisy=False)
    assert abs(m1.R2 - m2.R2) < 1e-8
    assert np.max(np.abs((5.0 * m1.yfitted - 7.0) - m2.yfitted)) < 1e-6
    scale = 5.0 / np.array([2.0, 0.5, 10.0])
    assert np.max(np.abs(m1.derivatives * scale - m2.derivatives)) < 1e-6


def test_sinfx_recovers_cosine(rng):
    """The sinfx oracle (reference ``examples/sinfx.Rmd``): with
    y = sin(x1) + noise, dy/dx1 should track cos(x1)."""
    n = 500
    x1 = rng.uniform(-3, 3, size=n)
    x2 = rng.normal(size=n)
    y = np.sin(x1) + 0.1 * rng.normal(size=n)
    X = np.stack([x1, x2], axis=1)
    m = bk.fit(y, X, noisy=False)
    d1 = m.derivatives[:, 0]
    corr = np.corrcoef(d1, np.cos(x1))[0, 1]
    assert corr > 0.97
    # x2 is irrelevant: its AME should be statistically near zero
    # (note the AME of sin over a symmetric range is itself ≈ sin(3)/3 ≈ 0,
    # so only the irrelevant-variable check is meaningful here)
    s = bk.summary(m)
    assert abs(s.ttests[1, 2]) < 3.0   # |t| small for x2

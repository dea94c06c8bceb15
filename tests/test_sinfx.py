"""The reference's sinfx demo on its EXACT dataset.

``examples/sinfx.md`` is the reference's showcase: on seeded data
(``set.seed(11112016)``, N=2000, P=2, X ~ U(-2π, 2π)), the fitted
pointwise marginal effect of x₁ tracks the true derivative cos(x₁)
"without modeling any particular curve".  The published artifact is a
plot, not numbers — so the pins here are the claim itself, asserted on
the bit-identical dataset regenerated through the verified R RNG
(``tests/r_rng.py``): dy/dx₁ ≈ cos(x₁) pointwise, AME(x₂) ≈ 1 (the
true linear effect), and the default fit is well-determined.  This is
also SURVEY §7's phase-0 end-to-end target config.
"""
import numpy as np

import bigkrls_tpu as bk
from r_rng import sinfx_data


def test_sinfx_exact_protocol():
    y, X = sinfx_data()
    assert X.shape == (2000, 2)
    # U(-2π, 2π) marginals of the regenerated draw
    assert -2 * np.pi <= X.min() and X.max() <= 2 * np.pi
    assert abs(X.mean()) < 0.15

    m = bk.fit(y, X, noisy=False)
    truth = np.cos(X[:, 0])
    resid = m.derivatives[:, 0] - truth
    # pointwise recovery of cos(x1): the demo's plot shows scatter
    # around the curve with edge flare at ±2π — these bands pin that
    # same picture numerically (measured on this exact data: RMSE 0.285,
    # corr 0.953, λ* 0.5919)
    assert np.sqrt(np.mean(resid ** 2)) < 0.35, np.sqrt(np.mean(resid**2))
    assert np.corrcoef(m.derivatives[:, 0], truth)[0, 1] > 0.94
    # the linear predictor's AME ≈ its true coefficient (ridge shrinkage
    # pulls it slightly below 1; measured 0.946)
    assert 0.90 < m.avgderivatives[1] < 1.0
    # and the fit explains the signal (var(noise)=1 ⇒ R² ≈ 0.93)
    assert 0.90 < m.R2 < 0.96
    # regression anchor for the searched λ on this exact data (CPU f64)
    assert abs(m.lambda_ - 0.59188) < 5e-4

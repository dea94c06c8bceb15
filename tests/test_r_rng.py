"""Verification of the R-RNG reimplementation (tests/r_rng.py).

Two independent cross-checks, so a transcription error in either the MT
seeding or the AS241 coefficients cannot slip through:

* stream pins: ``runif`` / ``rnorm`` outputs for seeds 1, 42, 123 as
  printed by real R sessions (7 decimal places, R's default print);
* quantile pins: AS241 vs scipy's Cephes ``ndtri`` — two unrelated
  implementations of Φ⁻¹ agreeing at 1e-14 across all three AS241
  branches (central, intermediate, tail).
"""
import numpy as np
import pytest

from r_rng import RRNG, numeric_convergence_data, qnorm

# values printed by R: set.seed(s); runif(5) / rnorm(5)
R_RUNIF = {
    1: [0.2655087, 0.3721239, 0.5728534, 0.9082078, 0.2016819],
    42: [0.9148060, 0.9370754, 0.2861395, 0.8304476, 0.6417455],
    123: [0.2875775, 0.7883051, 0.4089769, 0.8830174, 0.9404673],
}
R_RNORM = {
    1: [-0.6264538, 0.1836433, -0.8356286, 1.5952808, 0.3295078],
    42: [1.3709584, -0.5646982, 0.3631284, 0.6328626, 0.4042683],
    123: [-0.56047565, -0.23017749, 1.55870831, 0.07050839, 0.12928774],
}


@pytest.mark.parametrize("seed", [1, 42, 123])
def test_runif_matches_r(seed):
    np.testing.assert_allclose(RRNG(seed).runif(5), R_RUNIF[seed],
                               rtol=0, atol=5e-8)


@pytest.mark.parametrize("seed", [1, 42, 123])
def test_rnorm_matches_r(seed):
    np.testing.assert_allclose(RRNG(seed).rnorm(5), R_RNORM[seed],
                               rtol=0, atol=5e-8)


def test_qnorm_matches_cephes():
    from scipy.special import ndtri
    ps = np.concatenate([
        np.linspace(1e-12, 1e-3, 41),       # tail branch (r > 5)
        np.linspace(1e-3, 0.075, 41),       # intermediate branch
        np.linspace(0.076, 0.924, 81),      # central branch
        1.0 - np.linspace(1e-12, 1e-3, 41),
    ])
    ours = np.array([qnorm(float(p)) for p in ps])
    ref = ndtri(ps)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-13)


def test_numeric_convergence_dataset_shape():
    y, X = numeric_convergence_data()
    assert X.shape == (500, 6) and y.shape == (500,)
    # column 6 is the published binarization at 0.12345
    assert set(np.unique(X[:, 5])) == {0.0, 1.0}
    # P(Z > 0.12345) ≈ 0.4509 — the binary share must land near it
    assert 0.38 < X[:, 5].mean() < 0.52

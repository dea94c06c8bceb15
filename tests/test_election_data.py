"""Real-data oracles on the 2016 US election county data — the only real
dataset the reference repo ships (``examples/data2016GE.csv``, 3106×68).

The published spectrum oracle, decoded (VERDICT r01 missing #2/#3):
``examples/subsampling coeffs.R:7-10`` reports ``lastkeeper = 2895`` of
3106 at eigtrunc 0.001.  That number comes from
``bEigen(bGaussKernel(as.big.matrix(X)))`` where ``X = edata[,-1]`` —
but R's ``read.csv`` of the github URL prepends a row-number column, so
``edata[,-1]`` kept ALL 68 data columns (the outcome gop_2016_delta
included), raw/unstandardized, with default bandwidth ``ncol(X)=68``
(``bGaussKernel``, ``R/bigKRLS_Rcpp_functions.R:201-210``).  The tests
below pin the full provenance chain:

* all-68-column raw kernel, bandwidth 68  -> lastkeeper 2895 (published)
* intended 67-column raw kernel, bw 67   -> lastkeeper 2681
* in-pipeline standardized 67-col kernel -> lastkeeper 225 (what any
  actual ``bigKRLS()``/``fit()`` run on this data solves with, since the
  pipeline standardizes X first, ``R/bigKRLS.R:251-254``)

Boston-housing quality bands (BASELINE.md) need the MASS::Boston CSV,
which is not redistributable inside this image (no network egress and no
R installation); ``test_boston.py`` runs those bands whenever
``BIGKRLS_BOSTON_CSV`` points at the data.
"""
import os

import numpy as np
import pytest

import bigkrls_tpu as bk
from bigkrls_tpu.ops.eig import lastkeeper_from_values

CSV = "/root/reference/examples/data2016GE.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CSV), reason="reference election CSV not available")


@pytest.fixture(scope="module")
def election():
    d = np.genfromtxt(CSV, delimiter=",", skip_header=1)
    assert d.shape == (3106, 68)
    return d


def _spectrum(X, sigma):
    X = np.asarray(X, dtype=np.float64)
    r = np.sum(X * X, axis=1)
    K = np.exp(-(np.maximum(r[:, None] + r[None, :] - 2.0 * (X @ X.T), 0.0))
               / sigma)
    return np.linalg.eigvalsh(K)[::-1]


def test_published_lastkeeper_2895(election):
    """The exact published number, with the exact published computation
    (raw kernel over all 68 columns incl. the outcome, bandwidth 68,
    strict '>' rule as in the script)."""
    vals = _spectrum(election, 68.0)
    lk = int(np.nonzero(vals > 0.001 * vals[0])[0].max()) + 1
    assert lk == 2895


def test_lastkeeper_provenance_chain(election):
    """Intended 67-column raw kernel and the in-pipeline standardized
    kernel — the spectra an actual fit sees (regression-pinned)."""
    X = election[:, 1:]
    vals_raw = _spectrum(X, 67.0)
    assert lastkeeper_from_values(vals_raw, 0.001) == 2681

    Xs = (X - X.mean(0)) / X.std(0, ddof=1)
    vals_std = _spectrum(Xs, 67.0)
    assert lastkeeper_from_values(vals_std, 0.001) == 225
    # the λ-search upper-bound heuristic and Neffective consume this
    # spectrum; pin its head so silent kernel changes get caught
    assert vals_std[0] == pytest.approx(735.7016847, rel=1e-6)
    assert np.sum(vals_raw) / X.shape[0] == pytest.approx(1.0, abs=1e-9)


def test_election_subsample_fit_quality(election):
    """End-to-end fit quality on real county data (N=600 deterministic
    subsample, all 67 covariates incl. the 49 state dummies).  Bands are
    our own pinned regression anchors on real data — the reference
    publishes no quality numbers for this config."""
    rng = np.random.default_rng(2016)
    idx = np.sort(rng.choice(election.shape[0], size=600, replace=False))
    y = election[idx, 0]
    X = election[idx, 1:]
    keep = X.std(0, ddof=1) > 0          # drop state dummies absent in
    X = X[:, keep]                       # the subsample
    m = bk.fit(y, X, noisy=False)
    assert 0.55 < m.R2 < 0.95
    assert 0.05 < m.lambda_ < 5.0
    assert 0 < m.neffective < 600
    # in-sample fit must beat the AME-only linear summary on this
    # massively non-additive outcome
    assert m.R2 > m.R2AME


CENSUS_CSV = "/root/reference/examples/data2016GEcensus.csv"


@pytest.fixture(scope="module")
def census():
    """y = GOPdelta (col 1), X = 17 census covariates incl. 9 region
    dummies (cols 2..18); col 0 is a quoted row number.  This — not the
    68-column county file — is what ``cv_election2016.R:9-14`` CVs on
    (the county file's 49 state dummies go constant in 80% subsamples
    and fail the per-fold pre-flight, in the reference and here)."""
    if not os.path.exists(CENSUS_CSV):
        pytest.skip("reference census CSV not available")
    d = np.genfromtxt(CENSUS_CSV, delimiter=",", skip_header=1)
    assert d.shape == (3106, 19)
    return d[:, 1], d[:, 2:]


def test_election_cv_replication_protocol(census):
    """The reference's published CV protocol on real data
    (``examples/cv_election2016.R:23-26``: census covariates,
    ptesting=20, Neig=50, seeded) — the real-data statistical regression
    VERDICT r01 item 3 asked for.  The reference repo ships the protocol
    but not its numeric results (``examples/cv_replicates`` is absent),
    so the oracles are our own pinned measurements (CPU f64): oos
    pseudo-R² 0.664/0.655/0.700 at seeds 1/2/3, i.e. a 0.63–0.73 band,
    with seed-1 λ* = 4.4391 and Neffective = 2446.75 of 2485."""
    y, X = census
    cv = bk.crossvalidate(y, X, ptesting=20, seed=1, neig=50, noisy=False)
    m = cv.metrics
    assert m["pseudoR2_oos"] == pytest.approx(0.66424, abs=0.01)
    assert m["MSE_oos"] == pytest.approx(9.86499, rel=0.03)
    assert m["pseudoR2AME_oos"] == pytest.approx(0.63875, abs=0.01)
    assert m["pseudoR2_is"] > m["pseudoR2AME_is"]
    trained = cv.fold_results[0].trained
    assert trained.X.shape[0] == 2485
    assert float(trained.lambda_) == pytest.approx(4.4391, rel=1e-3)
    assert trained.neffective == pytest.approx(2446.75, abs=1.0)
    assert trained.lastkeeper == 50

"""Mid-fit checkpoint/resume of the eigendecomposition."""
import os

import numpy as np
import pytest

import bigkrls_tpu as bk
from bigkrls_tpu import checkpoint as ckpt


def _data(seed=0, n=50, p=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    y = np.asarray(X @ np.ones(p) + 0.2 * rng.normal(size=n))
    return y, X


def test_checkpoint_resume_identical(tmp_path):
    y, X = _data()
    d = str(tmp_path / "ck")
    # noisy=True on both fits so the λ-search takes the same (host) loop —
    # the device while_loop differs from it at the last ulp
    m1 = bk.fit(y, X, noisy=True, checkpoint_dir=d, log=lambda s: None)
    assert os.path.exists(os.path.join(d, "eig_meta.json"))
    logs = []
    m2 = bk.fit(y, X, noisy=True, checkpoint_dir=d, log=logs.append)
    # the resumed-checkpoint notice is worded as a Step 2 banner so noisy
    # step numbering stays consistent (ADVICE r02)
    assert any("resumed from checkpoint" in l for l in logs)
    assert m1.lambda_ == m2.lambda_
    assert np.array_equal(m1.coeffs, m2.coeffs)
    assert np.array_equal(m1.derivatives, m2.derivatives)


def test_checkpoint_invalidated_on_data_change(tmp_path):
    y, X = _data()
    d = str(tmp_path / "ck")
    bk.fit(y, X, noisy=False, checkpoint_dir=d)
    X2 = X.copy()
    X2[0, 0] += 1.0
    logs = []
    bk.fit(y, X2, noisy=True, checkpoint_dir=d, log=logs.append)
    assert not any("resumed" in l for l in logs)


def test_checkpoint_invalidated_on_config_change(tmp_path):
    y, X = _data()
    d = str(tmp_path / "ck")
    bk.fit(y, X, noisy=False, checkpoint_dir=d)
    logs = []
    bk.fit(y, X, sigma=7.0, noisy=True, checkpoint_dir=d, log=logs.append)
    assert not any("resumed" in l for l in logs)


def test_corrupt_checkpoint_recomputed(tmp_path):
    y, X = _data()
    d = str(tmp_path / "ck")
    m1 = bk.fit(y, X, noisy=False, checkpoint_dir=d)
    # corrupt the vectors payload (native store verifies its checksum)
    for fname in ("eig_vectors.bin", "eig_vectors.npy"):
        p = os.path.join(d, fname)
        if os.path.exists(p):
            raw = bytearray(open(p, "rb").read())
            raw[len(raw) // 2] ^= 0xFF
            open(p, "wb").write(bytes(raw))
    m2 = bk.fit(y, X, noisy=False, checkpoint_dir=d)
    assert np.allclose(m1.coeffs, m2.coeffs)  # recomputed, not garbage

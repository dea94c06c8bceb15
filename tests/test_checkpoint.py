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


def test_checkpoint_adaptive_resume_bit_exact(tmp_path):
    """VERDICT r03 next-round #5: checkpoint_dir must not route around
    the adaptive path.  The saving fit takes adaptive-krylov and stores
    the head pairs + completed-spectrum bounds + tail quadrature PLUS
    the solution keyed by a (y, tol) fingerprint; an identical refit
    resumes bit-exact with zero eig/solve device work, and Neffective
    still uses the tail quadrature."""
    rng = np.random.default_rng(3)
    n, p = 2048, 3
    X = rng.normal(size=(n, p))
    y = np.asarray(np.sin(X[:, 0]) + X[:, 1] + 0.2 * rng.normal(size=n))
    d = str(tmp_path / "ck")
    m1 = bk.fit(y, X, noisy=False, eigtrunc=0.001, derivative=False,
                checkpoint_dir=d)
    assert m1.eig_path.startswith("adaptive-krylov"), m1.eig_path
    assert os.path.exists(os.path.join(d, "adaptive_meta.json"))
    m2 = bk.fit(y, X, noisy=False, eigtrunc=0.001, derivative=False,
                checkpoint_dir=d)
    assert m2.eig_path == "checkpoint"
    assert m1.lambda_ == m2.lambda_
    assert np.array_equal(m1.coeffs, m2.coeffs)
    assert m1.neffective == m2.neffective
    assert m1.looe == m2.looe
    # the resumed model still knows its spectrum is a truncated head
    assert not m2.spectrum_is_complete
    assert m2.eig_tail_theta is not None and m2.eig_tail_theta.size > 0

    # a DIFFERENT y reuses the eig prefix (the expensive part) and
    # re-runs only golden+solve: still "checkpoint", fresh-fit parity
    y2 = np.asarray(np.cos(X[:, 0]) + 0.5 * X[:, 2]
                    + 0.2 * rng.normal(size=n))
    vec_files = [os.path.join(d, f) for f in
                 ("adaptive_vectors.bin", "adaptive_vectors.npy")
                 if os.path.exists(os.path.join(d, f))]
    vec_stamp = [(f, os.path.getmtime(f), os.path.getsize(f))
                 for f in vec_files]
    m4 = bk.fit(y2, X, noisy=False, eigtrunc=0.001, derivative=False,
                checkpoint_dir=d)
    # the solution refresh must NOT rewrite the eigenvector payload
    # (code-review r05: a changed-y refit must not pay the vectors'
    # disk I/O nor transiently destroy the checkpoint)
    assert vec_stamp == [(f, os.path.getmtime(f), os.path.getsize(f))
                        for f in vec_files]
    assert m4.eig_path == "checkpoint"
    m4f = bk.fit(y2, X, noisy=False, eigtrunc=0.001, derivative=False)
    assert m4.lambda_ == pytest.approx(m4f.lambda_, rel=1e-9)
    assert np.max(np.abs(m4.coeffs - m4f.coeffs)) < 1e-9

    # ADVICE r04: the sol_fp-miss resume above must REFRESH the stored
    # solution under the new (y, tol) fingerprint, so the NEXT identical
    # refit hits the zero-device-work stored-solution fast path
    import json
    with open(os.path.join(d, "adaptive_meta.json")) as fh:
        meta = json.load(fh)
    assert meta["lam"] == m4.lambda_
    m5 = bk.fit(y2, X, noisy=False, eigtrunc=0.001, derivative=False,
                checkpoint_dir=d)
    assert m5.eig_path == "checkpoint"
    assert m5.lambda_ == m4.lambda_
    assert np.array_equal(m5.coeffs, m4.coeffs)

    # a config change invalidates the adaptive checkpoint too
    m3 = bk.fit(y, X, noisy=False, eigtrunc=0.002, derivative=False,
                checkpoint_dir=d)
    assert m3.eig_path != "checkpoint"


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


def test_torn_checkpoint_overwrite_invalidates(tmp_path, monkeypatch):
    """ADVICE r04: a process dying between a different-config overwrite's
    array writes and its meta write must never leave the OLD meta (old
    fingerprint/lastkeeper) paired with NEW arrays — the meta is
    unlinked before any array is written, so a torn overwrite reads as
    "no checkpoint"."""
    y, X = _data()
    d = str(tmp_path / "ck")
    bk.fit(y, X, noisy=False, checkpoint_dir=d)
    meta_p = os.path.join(d, "eig_meta.json")
    assert os.path.exists(meta_p)

    def boom(*a, **k):
        raise RuntimeError("simulated crash mid-checkpoint")

    monkeypatch.setattr(np, "save", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        bk.fit(y, X, sigma=7.0, noisy=False, checkpoint_dir=d)
    monkeypatch.undo()
    assert not os.path.exists(meta_p)   # invalidated up front, no mispair
    # and the next fit simply recomputes and re-checkpoints
    m2 = bk.fit(y, X, sigma=7.0, noisy=False, checkpoint_dir=d)
    assert os.path.exists(meta_p)
    m3 = bk.fit(y, X, sigma=7.0, noisy=False, checkpoint_dir=d)
    assert np.allclose(m2.coeffs, m3.coeffs)


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

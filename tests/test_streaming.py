"""Kernel-free (streaming) path: K @ V products without materializing K,
streaming truncated eigensystem, and the full streaming fit vs the dense
fit — the framework's answer to the reference's 5N²-doubles memory wall."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bigkrls_tpu as bk
from bigkrls_tpu.ops.eig import eigensystem, eigensystem_streaming
from bigkrls_tpu.ops.kernels import gauss_kernel
from bigkrls_tpu.ops.matvec import kernel_matmul
from bigkrls_tpu.ops.stats import neffective_acf


def _xy(rng, n=96, p=4, binary=True):
    X = rng.normal(size=(n, p))
    if binary:
        X[:, 2] = (X[:, 2] > 0.1).astype(float)
    y = np.sin(X[:, 0]) + X @ np.ones(p) + 0.3 * rng.normal(size=n)
    return np.asarray(y), X


def test_kernel_matmul_matches_dense(rng):
    n, p, m = 100, 5, 7
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    V = rng.normal(size=(n, m))
    K = np.asarray(gauss_kernel(jnp.asarray(X), float(p)))
    Y = kernel_matmul(jnp.asarray(X), jnp.asarray(V), float(p), block=32)
    assert np.max(np.abs(np.asarray(Y) - K @ V)) < 1e-10


def test_kernel_matmul_ragged_block(rng):
    n, p, m = 53, 3, 2   # n not a multiple of block
    X = rng.normal(size=(n, p))
    V = rng.normal(size=(n, m))
    K = np.asarray(gauss_kernel(jnp.asarray(X), float(p)))
    Y = kernel_matmul(jnp.asarray(X), jnp.asarray(V), float(p), block=16)
    assert np.max(np.abs(np.asarray(Y) - K @ V)) < 1e-10


def test_kernel_matmul_divisor_block_fast_path(rng):
    """Default-policy divisor blocks (r05): when N is not a multiple of
    the default 1024 but a `_BLOCK_DIVISORS` candidate divides it, the
    product must pick the pad-free view path and still match the dense
    K @ V exactly — this is the path every production streaming shape
    (50k/100k/500k/1M, all multiples of 1000) takes."""
    n, p, m = 2000, 4, 3      # 2000 % 1024 != 0, 1000 | 2000
    X = rng.normal(size=(n, p))
    V = rng.normal(size=(n, m))
    K = np.asarray(gauss_kernel(jnp.asarray(X), float(p)))
    Y = kernel_matmul(jnp.asarray(X), jnp.asarray(V), float(p))
    assert np.max(np.abs(np.asarray(Y) - K @ V)) < 1e-9
    # an EXPLICIT block is a caller-chosen memory bound: never widened,
    # and correct whether it divides N (24 does not) or not
    Y24 = kernel_matmul(jnp.asarray(X), jnp.asarray(V), float(p), block=24)
    assert np.max(np.abs(np.asarray(Y24) - K @ V)) < 1e-9


def test_kernel_matmul_fused_epilogue(rng):
    """`kernel_matmul(init=, out_scale=)` must equal the unfused
    ``(K @ V + init) * out_scale`` on BOTH accumulator layouts: the
    pad-free divisor path (init used as the scan carry directly) and
    the zero-padded path (init scattered into the padded carry).  This
    epilogue is what keeps the Chebyshev recurrence at plain power's
    HBM footprint at N=1M (ops/eig._cheb_step_fused)."""
    for n in (2000, 173):     # divisor path / padded path
        X = rng.normal(size=(n, 5))
        V = rng.normal(size=(n, 4))
        init = rng.normal(size=(n, 4))
        K = np.asarray(gauss_kernel(jnp.asarray(X), 5.0))
        want = (K @ V + init) * (-2.5)
        got = kernel_matmul(jnp.asarray(X), jnp.asarray(V), 5.0,
                            init=jnp.asarray(init), out_scale=-2.5)
        assert np.max(np.abs(np.asarray(got) - want)) < 1e-9, n


def test_cheb_step_fused_matches_generic(rng):
    """The donating, epilogue-fused Chebyshev step must be numerically
    identical to the generic product-then-combine step (same recurrence
    blocks and scale) — the fused form exists purely for HBM footprint,
    not different math."""
    from bigkrls_tpu.ops.eig import _cheb_step, _cheb_step_fused

    n, p = 160, 4
    X = jnp.asarray(rng.normal(size=(n, p)))
    Yp = rng.normal(size=(n, 8))
    Yc = rng.normal(size=(n, 8))
    r, c, sigma = 0.7, 1.3, float(p)
    a = _cheb_step(X, jnp.asarray(Yp), jnp.asarray(Yc), r, c, sigma,
                   kernel_matmul)
    # fresh Yp copy: the fused step donates it
    b = _cheb_step_fused(X, jnp.asarray(Yp), jnp.asarray(Yc), r, c, sigma,
                         kernel_matmul)
    for ai, bi in zip(a, b):
        assert np.max(np.abs(np.asarray(ai) - np.asarray(bi))) < 1e-9


def test_streaming_eigensystem_matches_materialized(rng):
    n, p, k = 120, 4, 12
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    K = gauss_kernel(jnp.asarray(X), float(p))
    full = eigensystem(K, method="full")
    stream = eigensystem_streaming(jnp.asarray(X), float(p), neig=k,
                                   iters=30)
    vf = np.asarray(full.values_full)[:k]
    vs = np.asarray(stream.values_full)
    assert np.max(np.abs(vf - vs) / np.abs(vf)) < 1e-6


def test_fast_power_self_correcting(rng):
    """The fast_eig_power contract (VERDICT r03 weak #6): POWER products
    may run at reduced precision because subspace iteration is
    self-correcting (each QR re-orthonormalizes) and the final
    Rayleigh–Ritz recomputes K·B with the FULL-precision matmul.  This
    pins the tolerance on CPU by simulating bf16-pass accumulation
    noise (~1e-3 relative — harsher than the MXU's bf16-multiply /
    f32-accumulate mode) in the power products only: the reported
    eigenvalues must stay at f32-level accuracy and λ* must match the
    exact-power fit well inside the golden-search tolerance."""
    from bigkrls_tpu.lambda_search import lambda_search

    n, p, k = 512, 4, 48
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = np.sin(X[:, 0]) + X @ np.ones(p) + 0.3 * rng.normal(size=n)
    y = (y - y.mean()) / y.std(ddof=1)
    Xd, yd = jnp.asarray(X), jnp.asarray(y)
    sigma = float(p)

    def noisy_matmul(X_, V, s):
        # bf16 has ~8 mantissa bits -> ~4e-3 ulp; rounding the exact
        # product through bf16 injects that noise into every power step
        Y = kernel_matmul(X_, V, s)
        return jnp.asarray(Y, jnp.bfloat16).astype(Y.dtype)

    eig_exact = eigensystem_streaming(Xd, sigma, neig=k)
    eig_fast = eigensystem_streaming(Xd, sigma, neig=k,
                                     power_matmul=noisy_matmul)
    v0 = float(eig_exact.values_full[0])
    # eigenvalues from the full-precision Ritz: f32-level agreement even
    # though every power product carried bf16 noise
    rel = np.max(np.abs(np.asarray(eig_fast.values_full)
                        - np.asarray(eig_exact.values_full))) / v0
    assert rel < 5e-6, rel
    lam_exact = float(lambda_search(eig_exact, yd))
    lam_fast = float(lambda_search(eig_fast, yd))
    assert lam_fast == pytest.approx(lam_exact, rel=1e-5)
    # ... and WITHOUT the full-precision Ritz the same noise would be
    # fatal: the reported values would inherit ~1e-3-level error.  This
    # is what makes the recompute a load-bearing part of the contract.
    eig_bad = eigensystem_streaming(Xd, sigma, neig=k,
                                    matmul=noisy_matmul)
    rel_bad = np.max(np.abs(np.asarray(eig_bad.values_full)
                            - np.asarray(eig_exact.values_full))) / v0
    assert rel_bad > 10 * rel


def test_resolve_fast_power_policy():
    """fast_power="auto" enables reduced precision exactly in the flows
    whose Rayleigh–Ritz recomputes K·B anyway (measured policy,
    docs/performance.md): constant-memory power and small-n stacked
    flows yes, KB-reusing progressive block-Krylov no."""
    from bigkrls_tpu.ops.eig import _resolve_fast_power
    assert _resolve_fast_power("auto", True, True) is False
    assert _resolve_fast_power("auto", False, True) is True
    assert _resolve_fast_power("auto", False, False) is True
    assert _resolve_fast_power("auto", True, False) is True
    assert _resolve_fast_power(True, True, True) is True
    assert _resolve_fast_power(False, False, True) is False


def test_streaming_fit_matches_dense_fit(rng):
    y, X = _xy(rng)
    n = len(y)
    k = 40
    # same truncation, same algorithm family on both sides: dense subspace
    # vs kernel-free subspace; spectra decay fast so k=40 carries the fit
    m_dense = bk.fit(y, X, neig=k, eig_method="subspace", noisy=False)
    m_stream = bk.fit(y, X, neig=k, streaming=True, noisy=False)
    assert m_stream.K is None
    assert abs(m_dense.lambda_ - m_stream.lambda_) < 1e-5 * m_dense.lambda_
    assert np.max(np.abs(m_dense.coeffs - m_stream.coeffs)) < 1e-6
    assert np.max(np.abs(m_dense.yfitted - m_stream.yfitted)) < 1e-6
    assert np.max(np.abs(m_dense.derivatives - m_stream.derivatives)) < 1e-5
    assert np.allclose(m_dense.var_avgderivatives,
                       m_stream.var_avgderivatives, rtol=1e-5)
    assert abs(m_dense.R2 - m_stream.R2) < 1e-8


def test_streaming_yfitted_rides_derivatives_product(rng, monkeypatch):
    """r05 fusion pin: on the kernel-free path ŷ must come out of the
    derivatives' multi-RHS product (its first RHS column is c), never
    from a separate width-1 K@c pass — each product pays a full
    tile-wise kernel reconstruction, so the extra pass was ~8.5 s of
    the 59 s N=500k fit.  Counted here by wrapping the product backend:
    no call may carry a width-1 right-hand side when derivatives are
    on (the width-1 pass is still correct — and expected — when
    derivative=False)."""
    import bigkrls_tpu.model as model_mod
    y, X = _xy(rng)
    widths = []
    real = kernel_matmul

    def counting(Xa, V, sigma, **kw):
        widths.append(int(V.shape[1]))
        return real(Xa, V, sigma, **kw)

    monkeypatch.setattr(model_mod, "kernel_matmul", counting)
    m = bk.fit(y, X, neig=40, streaming=True, noisy=False)
    assert m.K is None and widths, widths
    assert 1 not in widths, widths          # ŷ fused, no solo K@c pass

    widths.clear()
    m2 = bk.fit(y, X, neig=40, streaming=True, noisy=False,
                derivative=False, vcov_est=False)
    assert widths and widths.count(1) == 1, widths   # only ŷ itself
    assert np.max(np.abs(m.yfitted - m2.yfitted)) < 1e-8


def test_streaming_fit_predict_save_load(tmp_path, rng):
    y, X = _xy(rng, n=80)
    m = bk.fit(y, X, neig=30, streaming=True, noisy=False)
    pred = bk.predict(m, X[:9], se_pred=True)
    assert pred.predicted.shape == (9,)
    assert np.max(np.abs(pred.predicted - m.yfitted[:9])) < 1e-6
    d = m.vcov_fitted_diag()
    assert d.shape == (80,) and (np.asarray(d) > 0).all()
    folder = bk.save_model(m, str(tmp_path / "sm"))
    m2 = bk.load_model(folder)
    assert m2.K is None
    assert np.allclose(m2.coeffs, m.coeffs)
    p2 = bk.predict(m2, X[:9], se_pred=True)
    assert np.allclose(p2.predicted, pred.predicted)
    assert np.allclose(p2.se_pred, pred.se_pred)


def test_streaming_requires_truncation(rng):
    y, X = _xy(rng, n=40)
    with pytest.raises(ValueError, match="neig"):
        bk.fit(y, X, streaming=True, noisy=False)


def test_blocked_acf_matches_dense(rng):
    n, p = 300, 5
    X = rng.normal(size=(n, p))
    Xs = jnp.asarray((X - X.mean(0)) / X.std(0, ddof=1))
    dense = float(neffective_acf(Xs))
    blocked = float(neffective_acf(Xs, block=64))
    assert abs(dense - blocked) < 1e-8


def test_pallas_kernel_matmul_interpret_wide_rhs(rng):
    """The tiled Pallas kernel (interpret mode on CPU) matches the XLA
    streaming matmul, including an RHS wider than tile_m — the shape
    class whose untiled V block used to blow the TPU scoped-VMEM stack
    (block-Krylov bases, e.g. 50k×6528 at neig=500)."""
    from bigkrls_tpu.ops.matvec import kernel_matmul_pallas

    for n, p, m, tm in [(96, 4, 5, 32), (80, 3, 70, 32)]:
        X = rng.normal(size=(n, p))
        V = rng.normal(size=(n, m))
        ref = np.asarray(kernel_matmul(jnp.asarray(X, jnp.float32),
                                       jnp.asarray(V, jnp.float32),
                                       float(p)))
        got = np.asarray(kernel_matmul_pallas(
            jnp.asarray(X), jnp.asarray(V), float(p),
            tile_i=32, tile_j=32, tile_m=tm, interpret=True))
        assert got.shape == (n, m)
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(got - ref)) < 1e-5 * scale


def _synthetic_model(n, p, k, dtype=jnp.float32, seed=9):
    """A handcrafted KRLSModel big enough to exercise blocked predict
    without paying for a real N=50k fit on the 2-CPU test host."""
    from bigkrls_tpu.types import FactoredCovariance, KRLSModel

    gen = np.random.default_rng(seed)
    X = gen.normal(size=(n, p))
    y = gen.normal(size=n)
    Q = np.linalg.qr(gen.normal(size=(n, k)))[0]
    return KRLSModel(
        X=X, y=y, K=None, xlabs=[f"x{i+1}" for i in range(p)],
        coeffs=np.asarray(gen.normal(size=n) / n, dtype=np.float64),
        yfitted=y, sigma=float(p), lambda_=1.0, looe=1.0, R2=0.5,
        R2AME=None, K_eigenvalues=np.linspace(2.0, 1.0, k),
        lastkeeper=k, neffective=n * 0.8, neffective_acf=None,
        derivatives=None, avgderivatives=None, var_avgderivatives=None,
        binaryindicator=np.zeros(p, bool), which_derivatives=None,
        vcov_c_factored=FactoredCovariance(
            jnp.asarray(Q, dtype), jnp.asarray(np.full(k, 0.01), dtype),
            scale=2.0),
        sigmasq_std=0.01, y_mean=float(y.mean()), y_sd=float(y.std(ddof=1)),
        x_means=X.mean(0), x_sds=X.std(0, ddof=1))


def test_acf_streaming_scale_blocked(rng, monkeypatch):
    """VERDICT r03 #8: ``summary(degrees="acf")`` on a streaming-scale
    fit must route the autocorrelation Neffective through the BLOCKED
    Gram accumulation — the dense N×N Gram at N=32768 f64 would be an
    8.6 GB accidental allocation.  The dense variant is poisoned to
    prove the routing (completing on a 125 GB host proves nothing)."""
    import bigkrls_tpu.ops.stats as stats

    n, p = 32768, 3
    X = rng.normal(size=(n, p))
    y = np.asarray(np.sin(X[:, 0]) + 0.2 * (X @ np.ones(p))
                   + 0.3 * rng.normal(size=n))
    m = bk.fit(y, X, streaming=True, neig=16, noisy=False,
               which_derivatives=[0])
    assert m.eig_path == "streaming-krylov"
    assert m.neffective_acf is None          # fit did not run acf eagerly

    def _boom(*a, **k):
        raise AssertionError(
            "dense N x N acf Gram materialized at streaming scale")

    monkeypatch.setattr(stats, "_neffective_acf_dense", _boom)
    s = bk.summary(m, degrees="acf")
    assert np.isfinite(s.n_dof)
    assert 1.0 <= s.n_dof <= n + 1
    # blocked == dense equality is pinned by test_blocked_acf_matches_
    # dense; here pin plausibility only.  With P=3 the de-meaned rows
    # live in 2 dims, where E|corr| of random directions is 2/π ≈ 0.64,
    # so Neff ≈ (1 − 0.64)·N — well away from both 1 and N.
    assert 0.2 * n < s.n_dof < 0.6 * n


def test_blocked_predict_matches_dense():
    """Blocked (streaming) predict == the one-shot dense cross-kernel
    path, predictions and SEs, on a size where both fit in memory."""
    m = _synthetic_model(n=5000, p=4, k=16)
    Xnew = np.random.default_rng(10).normal(size=(512, 4))
    p_dense = bk.predict(m, Xnew, se_pred=True)
    p_block = bk.predict(m, Xnew, se_pred=True, block_size=100)
    assert p_block.newdataK is None          # the U×N kernel never existed
    assert p_dense.newdataK is not None
    assert np.max(np.abs(p_block.predicted - p_dense.predicted)) < 1e-8
    assert np.max(np.abs(p_block.se_pred - p_dense.se_pred)) < 1e-8


def test_blocked_predict_streaming_scale():
    """The VERDICT r02 #9 config: N=50k model, U=2k newdata.  U·N = 1e8
    exceeds the auto-block threshold, so predict() streams without the
    caller asking; memory stays O(block·N)."""
    from bigkrls_tpu.predict import AUTO_BLOCK_ELEMS

    n, u = 50_000, 2000
    assert u * n > AUTO_BLOCK_ELEMS
    m = _synthetic_model(n=n, p=5, k=8)
    Xnew = np.random.default_rng(11).normal(size=(u, 5))
    out = bk.predict(m, Xnew, se_pred=True)
    assert out.newdataK is None              # auto-blocked
    assert out.predicted.shape == (u,) and out.se_pred.shape == (u,)
    assert np.all(np.isfinite(out.predicted))
    assert np.all(out.se_pred > 0)
    # spot-check one block against a directly computed row
    from bigkrls_tpu.ops.kernels import cross_kernel
    Xm, Xs = m.X.mean(0), m.X.std(0, ddof=1)
    k_row = cross_kernel(
        jnp.asarray((Xnew[:1] - Xm) / Xs, jnp.float32),
        jnp.asarray((m.X - Xm) / Xs, jnp.float32), m.sigma)
    want = float((k_row @ jnp.asarray(m.coeffs, jnp.float32))[0]) \
        * m.y.std(ddof=1) + m.y.mean()
    assert out.predicted[0] == pytest.approx(want, rel=1e-5)

    with pytest.raises(ValueError, match="materialize_vcov"):
        bk.predict(m, Xnew, se_pred=True, block_size=100,
                   materialize_vcov=True)


def test_auto_krylov_memory_selection(caplog):
    """HBM-aware solver selection: block-Krylov unless the basis would
    blow the device memory budget, in which case the constant-memory
    power iteration is chosen WITH a logged explanation (the path that
    makes fit() reach N=500k on one 16 GB chip instead of OOMing)."""
    import logging
    from bigkrls_tpu.ops.eig import _auto_krylov

    gb = 1024 ** 3
    # N=50k / neig=500 class: ~2.2 GB basis, fits a 16 GB budget
    assert _auto_krylov(50_000, 540, 8, 4, budget=16 * gb)
    # N=500k / neig=200 at depth 24: ~22 GB basis, does not fit
    with caplog.at_level(logging.WARNING, logger="bigkrls_tpu"):
        assert not _auto_krylov(500_000, 248, 24, 4, budget=16 * gb)
    assert any("constant-memory" in r.message for r in caplog.records)
    # and the whole streaming eig honors the override end-to-end
    gen = np.random.default_rng(12)
    X = jnp.asarray(gen.normal(size=(256, 4)))
    e_k = eigensystem_streaming(X, 4.0, neig=16, iters=20, krylov=True)
    e_p = eigensystem_streaming(X, 4.0, neig=16, iters=20, krylov=False)
    assert np.max(np.abs(np.asarray(e_k.values_full)
                         - np.asarray(e_p.values_full))) < 1e-6


def test_constant_memory_cheb_beats_plain_power_per_product(rng):
    """The constant-memory flow's Chebyshev filter must dominate the
    plain power filter it replaced *with two fewer products* — the
    measured fact that lets ``iters ≥ 4`` map to ``iters − 2`` products
    (ops/eig.py dispatch-site note; the 500k/1M bench product bill).

    Oracle: dense f64 eigh.  Comparator: the exact old flow — iters
    orthonormalized power steps + one full-precision Rayleigh–Ritz
    product — run inline from the same initial block.  The error
    functional is the λ-bound sum Σλ/(λ+x) over the top-neig values
    (what the golden search and Neffective consume) plus the max
    relative eigenvalue error.

    The shape is deliberately SLOW-decay (P=64: a gap-free kernel
    spectrum, the regime where subspace iteration needs its depth and
    where the 500k/1M product bill lives; measured ratios ~0.6-0.9
    here).  On fast-decay spectra (small P) cheb-5 can trail plain-7 —
    but both errors are then ≤2e-3 absolute, an order below this
    regime's, because the filter has nothing left to separate."""
    from bigkrls_tpu.ops.eig import (_block_orth, _krylov_ritz_streaming,
                                     _krylov_geometry, _subspace_init)

    n, p, neig, iters = 1024, 64, 128, 6
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    Xd = jnp.asarray(X, jnp.float32)
    sigma = float(p)
    K64 = np.asarray(gauss_kernel(jnp.asarray(X, jnp.float64), sigma))
    oracle = np.sort(np.linalg.eigvalsh(K64))[::-1][:neig]

    q, _ = _krylov_geometry(n, neig, iters)
    V = _subspace_init(Xd, jax.random.PRNGKey(0), q)
    for _ in range(iters):               # the old plain flow, verbatim
        V = _block_orth(kernel_matmul(Xd, V, sigma))
    plain_vals, _ = _krylov_ritz_streaming(Xd, V, V, V, sigma, neig,
                                           kernel_matmul, False)
    # the new flow: same seed, krylov=False -> Chebyshev with iters-2
    # filter products (4) + 1 Ritz product = 5 vs the comparator's 7
    cheb = eigensystem_streaming(Xd, sigma, neig=neig, iters=iters,
                                 krylov=False)

    def errs(vals):
        v = np.asarray(vals, np.float64)[:neig]
        maxrel = np.max(np.abs(v - oracle) / oracle)
        sums = [abs(np.sum(v / (v + x)) - np.sum(oracle / (oracle + x)))
                / np.sum(oracle / (oracle + x)) for x in (0.1, 1.0, 10.0)]
        return maxrel, max(sums)

    plain_maxrel, plain_sum = errs(plain_vals)
    cheb_maxrel, cheb_sum = errs(cheb.values_full)
    # dominance with a small slack for orthonormalization noise; the
    # margin is the point — 5 products may not cost MORE error than 7
    # (measured ratios at this shape: maxrel 0.63, sums 0.64)
    assert cheb_maxrel <= 1.1 * plain_maxrel, (cheb_maxrel, plain_maxrel)
    assert cheb_sum <= 1.1 * plain_sum, (cheb_sum, plain_sum)
    assert cheb_maxrel < 0.15            # absolute sanity

"""Benchmark: TPU-native KRLS fit vs the reference's headline number.

Reference baseline (BASELINE.md): post-kernel fit (eigendecomposition +
golden-section λ search + vcov, NO derivatives) on the 2016 US election
data, N=3106, P=67: bigKRLS takes 31.389 s with its default
eigentruncation 0.001 (144.045 s full decomposition) on
rice.stanford.edu (``examples/eigenbenchmark.R:44-47``).

This bench runs on the REAL election data (``data2016GE.csv``, shipped in
the reference repo: y = gop_2016_delta, X = the 67 county covariates),
falling back to a same-shape synthetic draw only if the CSV is absent.
The timed region mirrors the reference's: standardization and kernel
construction excluded; full eigendecomposition + λ search + coefficients
+ vcov filter included; derivatives excluded.  Timed after one compile
warmup — compile cache persists across steady-state use (.jax_cache).

A note on the published "lastkeeper = 2895 of 3106" spectrum number
(``examples/subsampling coeffs.R:7-10``): that count comes from the
kernel of the RAW, UNstandardized matrix of all 68 CSV columns — the
outcome included — because R's ``read.csv`` of the github URL prepended a
row-number column, so the script's ``edata[,-1]`` kept y inside X
(bandwidth 68).  We reproduce that exact 2895 in
``tests/test_election_data.py``.  Inside the actual fit pipeline X is
standardized first (``R/bigKRLS.R:251-254``), and the standardized
67-column kernel truncates at lastkeeper = 225 (f64 == f32, verified in
the same test) — in both the reference's timed run and ours, so the
timed workloads match.

Prints up to THREE JSON lines (primary LAST):
  {"metric": "krls_postkernel_fit_neig50_n3106_s", ...}    # secondary
  {"metric": "krls_streaming_fullfit_n50000_p20_s", ...}   # secondary
  {"metric": "krls_postkernel_fit_n3106_p67_s", "value": <seconds>,
   "unit": "s", "vs_baseline": <31.389 / seconds>}
"""
import json
import os
import sys
import time

import numpy as np

ELECTION_CSV = "/root/reference/examples/data2016GE.csv"
N, P = 3106, 67
BASELINE_S = 31.389   # bigKRLS default-eigtrunc post-kernel fit (see above)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class _SkipSecondary(Exception):
    pass


def load_election():
    """y = gop_2016_delta (col 0), X = the 67 covariates (cols 1..67)."""
    if os.path.exists(ELECTION_CSV):
        d = np.genfromtxt(ELECTION_CSV, delimiter=",", skip_header=1)
        assert d.shape == (N, P + 1), d.shape
        return d[:, 0], d[:, 1:], "data2016GE.csv (real)"
    rng = np.random.default_rng(2016)
    X = rng.normal(size=(N, P))
    y = X @ rng.normal(size=P) + np.sin(2 * X[:, 0]) + rng.normal(size=N)
    return y, X, "synthetic fallback (CSV not found)"


def main():
    t_start = time.time()
    # On a cold compile cache the warmup compiles alone can cost ~15 min
    # through the TPU tunnel; the secondaries then risk starving the
    # primary metric of whatever wall-clock budget the harness allows.
    # Skip secondaries once this much has elapsed (cache-warm runs never
    # get close).
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    import jax
    # persistent compile cache: the N=3106 eigh compile is minutes on a cold
    # process; cached it is milliseconds on every later bench run
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bigkrls_tpu.ops.kernels import gauss_kernel, gauss_kernel_pallas
    from bigkrls_tpu.ops.eig import eigensystem
    from bigkrls_tpu.lambda_search import lambda_search
    from bigkrls_tpu.ops.solve import solve_for_c
    from bigkrls_tpu.ops.effects import derivatives_all

    backend = jax.default_backend()
    dtype = jnp.float32
    log(f"backend={backend} devices={jax.devices()} dtype={dtype.__name__}")

    y, X, source = load_election()
    log(f"data: {source}  N={X.shape[0]} P={X.shape[1]}")
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = (y - y.mean()) / y.std(ddof=1)
    Xd = jnp.asarray(X, dtype)
    yd = jnp.asarray(y, dtype)
    sigma = float(X.shape[1])

    use_pallas = backend == "tpu"
    kern = gauss_kernel_pallas if use_pallas else gauss_kernel

    from bigkrls_tpu.ops.fused import postkernel_device
    from bigkrls_tpu.types import Eigensystem

    eigtrunc_d = jnp.asarray(0.001, dtype)
    tol_d = jnp.asarray(1e-3 * N, dtype)

    def postkernel_fit(K):
        """The reference's timed region as ONE device program (eigh +
        truncation + λ bounds + golden search + solve, ``ops/fused.py``)
        — the step-by-step pipeline pays ~8 tunnel round trips (~25 ms
        each) for the same math (equality tested in tests/test_fused.py)."""
        vals, vecs, lastkeeper, lam, Le, coeffs, spectrum, _ = \
            postkernel_device(K, yd, eigtrunc_d, tol_d)
        jax.block_until_ready((coeffs, spectrum))
        lk = int(lastkeeper)
        eig = Eigensystem(values_full=vals, vectors=vecs[:, :lk],
                          lastkeeper=lk)
        return eig, float(lam), coeffs, spectrum

    # ---- warmup (compile) ----
    t = time.time()
    K = kern(Xd, sigma)
    jax.block_until_ready(K)
    log(f"kernel (incl. compile): {time.time() - t:.2f}s")
    t = time.time()
    eig, lam, coeffs, spectrum = postkernel_fit(K)
    warm = time.time() - t
    log(f"post-kernel fit warmup (incl. compile): {warm:.2f}s  "
        f"lambda={lam:.4f} lastkeeper={eig.lastkeeper}")
    log("  (the published 2895/3106 spectrum count is the RAW 68-column "
        "kernel, outcome included — a read.csv quirk of the reference "
        "script; reproduced exactly in tests/test_election_data.py. The "
        "standardized in-pipeline kernel truncates at 225; see module "
        "docstring.)")

    # ---- timed: kernel construction ----
    t = time.time()
    K = kern(Xd, sigma)
    jax.block_until_ready(K)
    kernel_s = time.time() - t

    # ---- timed: post-kernel fit (reference's timed region) ----
    best = np.inf
    for _ in range(2):
        t = time.time()
        eig, lam, coeffs, spectrum = postkernel_fit(K)
        best = min(best, time.time() - t)
    log(f"kernel: {kernel_s * 1e3:.1f}ms  post-kernel fit: {best:.3f}s  "
        f"(compile overhead first-call: {warm - best:.1f}s, amortized by "
        f".jax_cache)")

    # ---- secondary: the reference's third protocol ("Estimating Fewer",
    # Neig=50, eigtrunc=0.01 — 18.907 s on rice.stanford.edu via ARPACK
    # eigs_sym, ``eigenbenchmark.R:23-24,44-47``).  "auto" answers an
    # aggressive truncation with block-Krylov (measured 0.113 s vs 0.638 s
    # dense eigh at this N on v5e — ops/eig.py); the dense eigh-then-slice
    # path is timed alongside for comparison.
    def postkernel_fit_neig50(K, method):
        eig = eigensystem(K, neig=50, eigtrunc=0.01, method=method)
        lam = lambda_search(eig, yd, noisy=False)
        Le, coeffs = solve_for_c(eig, yd, lam)
        spectrum = 1.0 / (eig.values + lam) ** 2
        jax.block_until_ready((coeffs, spectrum))
        return eig, lam, coeffs, spectrum

    neig50_metric = None
    over_budget = time.time() - t_start > budget_s
    if over_budget:
        log(f"skipping secondary benches: {time.time() - t_start:.0f}s "
            f"elapsed (> BENCH_BUDGET_S={budget_s:.0f}; cold compile cache) "
            "— guaranteeing the primary metric emits")
    try:
        if over_budget:
            raise _SkipSecondary
        best50 = {}
        for method in ("auto", "full"):
            postkernel_fit_neig50(K, method)     # compile warmup
            b = np.inf
            for _ in range(2):
                t = time.time()
                postkernel_fit_neig50(K, method)
                b = min(b, time.time() - t)
            best50[method] = b
        log(f"Neig=50 eigtrunc=0.01 post-kernel fit: user path "
            f"(block-Krylov) {best50['auto']:.3f}s, dense eigh-then-slice "
            f"{best50['full']:.3f}s (reference ARPACK: 18.907s)")
        neig50_metric = {
            "metric": "krls_postkernel_fit_neig50_n3106_s",
            "value": round(best50["auto"], 4), "unit": "s",
            "vs_baseline": round(18.907 / best50["auto"], 2),
        }
    except _SkipSecondary:
        pass
    except Exception as e:  # secondary must never sink the primary
        log(f"Neig=50 secondary bench failed: {e!r}")

    # ---- secondary: full derivatives step on the real data ----
    if not over_budget:
        _derivatives_secondary(X, Xd, yd, K, coeffs, spectrum, eig, sigma,
                               dtype, jnp, jax)

    # ---- secondary: N=50k kernel-free streaming fit (truncated Neig=500,
    # 5 derivative columns) — a config the reference cannot reach at all
    # (its single-node envelope is N≈10-15k, README.md:69).
    streaming_metric = None
    if backend == "tpu" and not over_budget:
        try:
            import bigkrls_tpu as bk
            rng = np.random.default_rng(2016)
            n2, p2 = 50_000, 20
            X2 = rng.normal(size=(n2, p2))
            y2 = np.sin(X2[:, 0]) + X2 @ (0.2 * np.ones(p2)) + \
                rng.normal(size=n2)
            # full-precision products: with the progressive-basis solver
            # the recorded K·B blocks are reused for Rayleigh–Ritz, so
            # precise mode costs the same as fast_eig_power=True
            # (measured 8.06 vs 7.74 s) with strictly better accuracy
            kw = dict(neig=500, streaming=True, noisy=False,
                      which_derivatives=[0, 1, 2, 3, 4])
            t = time.time()
            bk.fit(y2, X2, **kw)
            cold = time.time() - t
            t = time.time()
            m2 = bk.fit(y2, X2, **kw)
            warm2 = time.time() - t
            log(f"N=50k streaming full fit: cold {cold:.1f}s, warm "
                f"{warm2:.2f}s (R2={m2.R2:.3f}) — beyond the reference's "
                f"memory envelope entirely")
            streaming_metric = {
                "metric": "krls_streaming_fullfit_n50000_p20_s",
                "value": round(warm2, 4), "unit": "s",
                "vs_baseline": None,   # reference cannot run N=50k at all
            }
        except Exception as e:  # secondary must never sink the primary
            log(f"N=50k secondary bench failed: {e!r}")

    if neig50_metric is not None:
        print(json.dumps(neig50_metric), flush=True)
    if streaming_metric is not None:
        print(json.dumps(streaming_metric), flush=True)
    print(json.dumps({
        "metric": "krls_postkernel_fit_n3106_p67_s",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / best, 2),
    }), flush=True)


def _derivatives_secondary(X, Xd, yd, K, coeffs, spectrum, eig, sigma,
                           dtype, jnp, jax):
    from bigkrls_tpu.ops.effects import derivatives_all
    p = X.shape[1]
    bmask = jnp.asarray([np.unique(X[:, j]).size == 2 for j in range(p)])
    z0 = jnp.min(Xd, axis=0)
    z1 = jnp.max(Xd, axis=0)
    resid = yd - K @ coeffs
    sigmasq = jnp.sum(resid * resid) / X.shape[0]
    # the fused core returns the full-length masked filter; the truncated
    # basis wants its first lastkeeper entries
    spec = sigmasq.astype(dtype) * spectrum[:eig.lastkeeper]
    d = derivatives_all(Xd, K, coeffs, eig.vectors, spec, sigma, bmask, z0, z1)
    jax.block_until_ready(d)
    t = time.time()
    d = derivatives_all(Xd, K, coeffs, eig.vectors, spec, sigma, bmask, z0, z1)
    jax.block_until_ready(d)
    deriv_s = time.time() - t
    log(f"all-{p}-column derivatives + AME variances: {deriv_s:.3f}s "
        f"(reference forks {p} R workers for this)")


if __name__ == "__main__":
    main()

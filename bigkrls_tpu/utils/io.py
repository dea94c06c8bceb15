"""Data loading utilities — replacement for the reference's text-matrix IO
(``read.big.matrix`` / ``write.big.matrix``, used throughout
``R/bigKRLS.R:901-1017``).

``load_csv`` uses the native C++ mmap CSV parser when built
(``native/matstore.cpp``), falling back to numpy.  Returns float64 arrays
ready for ``fit``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def load_csv(path: str) -> np.ndarray:
    try:
        from ..native.matstore import read_csv, available
        if available():
            arr, _ = read_csv(path)
            return arr
    except Exception:
        pass
    return np.atleast_2d(np.loadtxt(path, delimiter=",", ndmin=2))


def design_from_csv(path: str, y_col: int = 0,
                    drop_cols: Optional[Sequence[int]] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Split a numeric CSV into (y, X) by column index."""
    arr = load_csv(path)
    drop = set(drop_cols or [])
    drop.add(y_col)
    keep = [j for j in range(arr.shape[1]) if j not in drop]
    return arr[:, y_col].copy(), arr[:, keep].copy()

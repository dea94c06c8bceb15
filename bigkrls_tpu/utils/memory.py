"""Device-memory introspection shared by every HBM-aware sizing rule.

The streaming eigensolver, the blocked acf statistic, and the mesh eig
crossover all size their working sets against the accelerator's reported
memory.  The lookup lives here once: ``memory_stats()['bytes_limit']``
when the backend reports it, else a conservative 8 GiB assumption (the
axon TPU tunnel reports nothing; v5e HBM is 16 GB, so 8 GiB halves it
for safety).
"""
from __future__ import annotations

from typing import Optional

import jax

DEFAULT_BUDGET = 8 * 1024 ** 3


def device_memory_budget(default: int = DEFAULT_BUDGET) -> int:
    """Bytes of device memory to plan against."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            limit = stats.get("bytes_limit")
            if limit:
                return int(limit)
    except Exception:
        pass
    return default

"""Structured per-phase timing — the observability layer the reference
lacks (SURVEY.md §5.1: its only tracing is `noisy` banners and C++ dot
printing).  ``PhaseTimer`` collects wall-clock per pipeline phase and can
emit a JSON report; pair with ``jax.profiler.trace`` for XLA-level traces.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


class PhaseTimer:
    def __init__(self, noisy: bool = False):
        self.noisy = noisy
        self.phases: List[Dict] = []
        self._last = time.time()

    def mark(self, name: str) -> None:
        """Record the time elapsed since the previous mark (or construction)
        as one phase — the linear-pipeline form used by ``model.fit``."""
        now = time.time()
        self.phases.append({"phase": name,
                            "seconds": round(now - self._last, 4)})
        self._last = now

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        if self.noisy:
            print(f"[{time.strftime('%H:%M:%S')}] {name} ...", flush=True)
        try:
            yield
        finally:
            dt = time.time() - t0
            self.phases.append({"phase": name, "seconds": round(dt, 4)})
            if self.noisy:
                print(f"[{time.strftime('%H:%M:%S')}] {name} done "
                      f"({dt:.2f}s)", flush=True)

    def report(self) -> str:
        return json.dumps(self.phases)

    def total(self) -> float:
        return sum(p["seconds"] for p in self.phases)


@contextlib.contextmanager
def xla_trace(logdir: Optional[str]):
    """Optionally wrap a region in a jax profiler trace (TensorBoard)."""
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield

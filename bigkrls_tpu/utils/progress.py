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

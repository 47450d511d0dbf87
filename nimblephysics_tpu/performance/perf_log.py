"""PerformanceLog: hierarchical timer tree + JAX profiler integration.

Reference parity: dart/performance/PerformanceLog.hpp:65-92 (startRun/
end nesting, finalize + prettyPrint). On TPU the heavy lifting is inside
compiled programs, so the tree is complemented by `trace` — a context
manager that also emits jax.profiler ranges (named_scope / TraceAnnotation)
visible in XLA profiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class PerformanceLog:
    def __init__(self, name: str = "root", parent: Optional["PerformanceLog"] = None):
        self.name = name
        self.parent = parent
        self.children: Dict[str, "PerformanceLog"] = {}
        self.runs = 0
        self.total = 0.0
        self._start: Optional[float] = None

    # -- reference API: startRoot / startRun / end ---------------------------

    @staticmethod
    def start_root(name: str = "root") -> "PerformanceLog":
        log = PerformanceLog(name)
        log._start = time.perf_counter()
        return log

    def start_run(self, name: str) -> "PerformanceLog":
        child = self.children.get(name)
        if child is None:
            child = PerformanceLog(name, parent=self)
            self.children[name] = child
        child._start = time.perf_counter()
        return child

    def end(self) -> None:
        assert self._start is not None, f"{self.name}: end() without start"
        self.total += time.perf_counter() - self._start
        self.runs += 1
        self._start = None

    # -- reporting -------------------------------------------------------------

    def finalize(self) -> None:
        if self._start is not None:
            self.end()

    def pretty_print(self, indent: int = 0) -> str:
        pad = "  " * indent
        avg = self.total / max(self.runs, 1)
        out = (
            f"{pad}{self.name}: {self.total * 1e3:.2f} ms total, "
            f"{self.runs} runs, {avg * 1e3:.3f} ms avg\n"
        )
        for c in self.children.values():
            out += c.pretty_print(indent + 1)
        return out


@contextlib.contextmanager
def trace(log: Optional[PerformanceLog], name: str):
    """Nested timing + jax.profiler annotation in one context manager."""
    import jax

    child = log.start_run(name) if log is not None else None
    with jax.profiler.TraceAnnotation(name):
        try:
            yield child
        finally:
            if child is not None:
                child.end()

"""Hierarchical phase timers — the analog of BPMF_COUNTER
(c++/counters.h:14-33, c++/counters.cpp:31-56,102-156).

The reference wraps every phase (main/movies/compute/computeMuLambda/...)
in RAII wall-clock scopes kept in both a hierarchical map (full path) and a
flat per-name map, printed at exit with %-of-parent.  Here a scope is a
context manager; since device work is asynchronous under JAX, callers that
want accurate phase times must pass ``sync=...`` a function that blocks
until the device is idle (e.g. ``lambda: x.block_until_ready()``) — timers
are only meaningful when profiling is enabled, so the extra sync cost is
opt-in, exactly like ENABLE_PROFILING in the reference build
(CMakeLists.txt:125-127).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Counters:
    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self._stack: list[str] = []
        self.hier: dict[str, float] = defaultdict(float)
        self.flat: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str, sync=None):
        if not self.enabled:
            yield
            return
        self._stack.append(name)
        full = "/".join(self._stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                sync()
            dt = time.perf_counter() - t0
            self.hier[full] += dt
            self.flat[name] += dt
            self.counts[full] += 1
            self._stack.pop()

    def report(self) -> str:
        """Render the hierarchical + flat report (c++/counters.cpp:137-156)."""
        if not self.enabled or not self.hier:
            return ""
        lines = ["perf counters (hierarchical):"]
        total = self.hier.get("main", sum(v for k, v in self.hier.items() if "/" not in k))
        for full in sorted(self.hier):
            depth = full.count("/")
            t = self.hier[full]
            parent = full.rsplit("/", 1)[0] if "/" in full else None
            pt = self.hier.get(parent, total) if parent else total
            pct_parent = 100.0 * t / pt if pt else 0.0
            pct_total = 100.0 * t / total if total else 0.0
            lines.append(
                f"  {'  ' * depth}{full.rsplit('/', 1)[-1]:<24} "
                f"{t:10.4f}s  x{self.counts[full]:<6d} "
                f"{pct_parent:5.1f}%parent {pct_total:5.1f}%total"
            )
        lines.append("perf counters (flat):")
        for name in sorted(self.flat, key=self.flat.get, reverse=True):
            lines.append(f"  {name:<28} {self.flat[name]:10.4f}s")
        return "\n".join(lines)


def tick() -> float:
    """Monotonic seconds (c++/counters.cpp:160-163)."""
    return time.perf_counter()

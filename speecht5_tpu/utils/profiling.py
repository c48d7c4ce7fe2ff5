"""Tracing / profiling as first-class citizens (SURVEY.md 5.1 — the
reference has only fairseq wall-clock meters and tqdm progress).

- ``PhaseTimer``: named wall-clock phases with device-fence semantics; prints
  one line per phase so long runs are diagnosable from the log alone (the
  round-1 bench timeout was undiagnosable for exactly this reason).
- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace directory.
- ``annotate``: TraceAnnotation wrapper so named regions show up inside the
  profiler timeline.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Dict, Optional


class PhaseTimer:
    """Wall-clock phase timing with optional device fencing.

    >>> pt = PhaseTimer("train")
    >>> pt.phase("data")          # closes the previous phase, starts 'data'
    >>> pt.phase("step", fence=metrics["loss"])   # blocks on device value
    >>> pt.report()               # dict of accumulated seconds
    """

    def __init__(self, name: str = "", stream=None, verbose: bool = True):
        self.name = name
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._cur: Optional[str] = None
        self._t0 = time.perf_counter()
        self._start = self._t0
        self.stream = stream if stream is not None else sys.stderr
        self.verbose = verbose

    def _close(self, fence=None):
        if fence is not None:
            import jax

            jax.block_until_ready(fence)
        if self._cur is not None:
            dt = time.perf_counter() - self._t0
            self.totals[self._cur] = self.totals.get(self._cur, 0.0) + dt
            self.counts[self._cur] = self.counts.get(self._cur, 0) + 1

    def phase(self, name: Optional[str], fence=None):
        """Close the current phase (optionally fencing on a device value) and
        start ``name`` (None = just close)."""
        self._close(fence)
        self._cur = name
        self._t0 = time.perf_counter()
        if self.verbose and name is not None:
            wall = self._t0 - self._start
            print(f"[{self.name} {wall:8.1f}s] -> {name}",
                  file=self.stream, flush=True)

    def report(self) -> Dict[str, float]:
        self._close()
        self._cur = None
        return dict(self.totals)

    def summary(self) -> str:
        rep = self.report()
        total = sum(rep.values()) or 1.0
        rows = sorted(rep.items(), key=lambda kv: -kv[1])
        return " | ".join(
            f"{k}: {v:.2f}s ({100 * v / total:.0f}%, n={self.counts[k]})"
            for k, v in rows
        )


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block; view with TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)

"""Structured tracing/profiling subsystem.

The reference has only ad-hoc wall-clock prints (SURVEY.md §5). Here:
``phase_timer`` gives cheap structured per-phase wall times, and
``trace_context`` wraps ``jax.profiler`` so a bilevel iteration can emit a
full XLA trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimes:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(1, self.counts[k])}
            for k in self.totals
        }


GLOBAL_PHASES = PhaseTimes()


@contextlib.contextmanager
def phase_timer(name: str, phases: Optional[PhaseTimes] = None, verbose: bool = False):
    """Time a phase; also emits a jax named annotation so device traces line
    up with host phases."""
    import jax.profiler

    target = phases or GLOBAL_PHASES
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    target.totals[name] += dt
    target.counts[name] += 1
    if verbose:
        print(f"[phase] {name}: {dt:.3f}s")


@contextlib.contextmanager
def trace_context(logdir: Optional[str]):
    """Capture a jax.profiler trace when logdir is set; no-op otherwise."""
    import jax.profiler

    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped NaN checking — the jax-native replacement for the reference's
    global torch.autograd.set_detect_anomaly(True) (run_nerf_helpers.py:2)."""
    import jax

    if not enable:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)

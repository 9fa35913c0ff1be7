"""Tracing / profiling subsystem.

The reference's only observability is ad-hoc ``time.time()`` prints gated by a
``print_stat`` flag (``facial_analysis.py:37-39,227-231,269-284``;
``facerec_test.py:238-240``). Here it is a first-class subsystem: named stage
timers with aggregate stats (p50/p95), a context manager that blocks on device
work so device time is actually measured, and an opt-in hook into
``jax.profiler`` for full XLA traces.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict, deque
from typing import Deque, Dict, Iterator, Optional

import numpy as np


class StageTimer:
    """Accumulates wall-clock samples per named stage. Thread-safe: samples
    may arrive from concurrent request handlers (serve.py) while another
    thread snapshots stats(). Per-stage history is a bounded deque
    (``max_samples``, default last 10k) so a long-lived server process
    doesn't grow its sample lists without bound."""

    def __init__(self, enabled: bool = True, max_samples: int = 10_000):
        self.enabled = enabled
        self.samples: Dict[str, Deque[float]] = defaultdict(
            lambda: deque(maxlen=max_samples))
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        """Time a stage. For device work, call jax.block_until_ready on the
        stage's outputs inside the block (or use the ``timed`` decorator,
        which blocks for you) — otherwise async dispatch makes the number
        meaningless."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.samples[name].append(dt)

    def timed(self, name: str):
        """Decorator: times the call and blocks on the jax output."""
        def wrap(fn):
            def inner(*a, **kw):
                if not self.enabled:
                    return fn(*a, **kw)
                import jax

                t0 = time.perf_counter()
                out = fn(*a, **kw)
                jax.block_until_ready(out)
                dt = time.perf_counter() - t0
                with self._lock:
                    self.samples[name].append(dt)
                return out
            return inner
        return wrap

    def stats(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            snapshot = {name: list(xs) for name, xs in self.samples.items()}
        out = {}
        for name, xs in snapshot.items():
            if not xs:
                continue
            a = np.asarray(xs)
            out[name] = {
                "count": int(a.size),
                "total_s": float(a.sum()),
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':30s} {'count':>6s} {'mean':>9s} {'p50':>9s} {'p95':>9s}"]
        for name, s in sorted(self.stats().items()):
            lines.append(f"{name:30s} {s['count']:6d} {s['mean_ms']:8.2f}m "
                         f"{s['p50_ms']:8.2f}m {s['p95_ms']:8.2f}m")
        return "\n".join(lines)

    def reset(self):
        with self._lock:
            self.samples.clear()


@contextlib.contextmanager
def xla_trace(log_dir: str) -> Iterator[None]:
    """Capture a full device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

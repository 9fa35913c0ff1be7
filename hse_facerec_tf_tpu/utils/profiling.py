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


def fusion_profile(run, top: int = 8) -> Optional[Dict]:
    """Per-fusion device-time table from a ``jax.profiler`` trace of one
    call to ``run()`` (a zero-arg callable that must BLOCK on its device
    work). The reference's only observability was wall-clock prints; this
    decomposes device time per compiled fusion with HBM bytes and achieved
    GB/s — the numbers behind bench.py's roofline claims and serve.py's
    ``/profile`` endpoint.

    Returns ``{busy_ms, hbm_gbs_busy, top: [{fusion, category, ms, bytes
    (MB), calls, pct_busy, gbs}, ...]}``, or None when profiling is
    unavailable on the current backend. Envelope events (the jit program,
    lax.scan while-bodies) are excluded — they double-count their children.
    """
    import glob
    import gzip
    import json
    import tempfile

    import jax

    import shutil

    tracedir = tempfile.mkdtemp(prefix="fusion_profile_")
    try:
        try:
            jax.profiler.start_trace(tracedir)
        except Exception:
            return None          # profiler unavailable on this backend
        try:
            run()                # the CALLER's failure must propagate,
        finally:                 # not masquerade as "profiling unavailable"
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        try:
            path = sorted(glob.glob(
                tracedir + "/plugins/profile/*/*.trace.json.gz"))[-1]
            trace = json.loads(gzip.open(path).read())
        except Exception:
            return None          # no parseable trace produced
    finally:
        # a long-lived server polling /profile must not leak trace dirs
        shutil.rmtree(tracedir, ignore_errors=True)
    pids = {e["pid"]: e["args"]["name"] for e in trace["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {pid for pid, name in pids.items() if "TPU" in name}
    if not dev:       # CPU backend: HLO events live under the host pid
        dev = set(pids)
    agg: Dict[str, Dict] = {}
    busy_us = 0.0
    bytes_total = 0.0
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev or "dur" not in e:
            continue
        args = e.get("args", {})
        if (e["name"].startswith("jit_") or "hlo_category" not in args
                or "while" in args.get("hlo_category", "")):
            continue
        key = args.get("deduplicated_name", e["name"])
        row = agg.setdefault(key, {
            "fusion": key,
            "category": args.get("hlo_category", "?"),
            "ms": 0.0, "bytes": 0.0, "calls": 0,
        })
        ln = args.get("long_name")
        if ln and "long_name" not in row:
            # the HLO expression behind the opaque fusion.NNNN label — what
            # names a slow fusion (e.g. which pyramid level's conv it is)
            row["long_name"] = ln[:300]
        row["ms"] += e["dur"] / 1e3
        row["bytes"] += float(args.get("bytes_accessed", 0))
        row["calls"] += 1
        busy_us += e["dur"]
        bytes_total += float(args.get("bytes_accessed", 0))
    busy_ms = busy_us / 1e3
    rows = sorted(agg.values(), key=lambda r: -r["ms"])[:top]
    for r in rows:
        r["pct_busy"] = round(100 * r["ms"] / busy_ms, 1) if busy_ms else 0.0
        r["gbs"] = round(r["bytes"] / 1e9 / (r["ms"] / 1e3), 1) if r["ms"] else 0.0
        r["ms"] = round(r["ms"], 2)
        r["bytes"] = round(r["bytes"] / 1e6, 1)     # MB
    return {
        "busy_ms": round(busy_ms, 2),
        "hbm_gbs_busy": round(bytes_total / 1e9 / (busy_ms / 1e3), 1)
        if busy_ms else 0.0,
        "top": rows,
    }

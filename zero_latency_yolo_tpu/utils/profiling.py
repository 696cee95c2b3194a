"""Profiling / tracing helpers (SURVEY §5.1 rebuild requirement).

The reference logs per-phase wall-clock times per frame
(src/inference/onnx_engine.cpp:530-618). Here:

- `trace(dir)` captures a JAX profiler trace (XPlane) viewable in
  TensorBoard/Perfetto — device-time vs host-time split per op;
- `annotate(name)` adds a named TraceAnnotation around host-side phases so
  scheduler/codec work shows up on the same timeline;
- `device_host_split` runs a callable and reports wall time vs device time
  (via a forced readback, since block_until_ready does not synchronize
  through the axon relay).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from typing import Callable, Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "logs/jax-trace"):
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


# The JAX profiler is process-global (a second start_trace raises), so
# on-demand captures are single-flight across every caller in the process.
_capture_lock = threading.Lock()
_last_capture: Dict = {}


def capture(seconds: float, log_dir: str = "logs/jax-trace",
            min_s: float = 0.05, max_s: float = 30.0) -> Dict:
    """Bounded on-demand XPlane capture of whatever the process is doing —
    the live serving programs, host annotations, everything on the global
    profiler timeline. Blocks for `seconds`; meant to run on a worker
    thread (the /profilez route), never the event loop. Returns a summary
    {dir, seconds, files:[{name,size}]} or {error} if a capture is already
    in flight."""
    seconds = float(seconds)
    if not (min_s <= seconds <= max_s):
        return {"error": f"seconds must be in [{min_s}, {max_s}]"}
    if not _capture_lock.acquire(blocking=False):
        return {"error": "a profile capture is already in flight"}
    try:
        out_dir = os.path.join(log_dir,
                               time.strftime("%Y%m%d-%H%M%S", time.gmtime()))
        jax.profiler.start_trace(out_dir)
        try:
            time.sleep(seconds)
        finally:
            jax.profiler.stop_trace()
        files = []
        for root, _dirs, names in os.walk(out_dir):
            for name in names:
                p = os.path.join(root, name)
                files.append({"name": os.path.relpath(p, out_dir),
                              "size": os.path.getsize(p)})
        result = {"ok": True, "dir": out_dir, "seconds": seconds,
                  "files": sorted(files, key=lambda f: f["name"]),
                  "captured_at": time.time()}
        _last_capture.clear()
        _last_capture.update(result)
        return result
    finally:
        _capture_lock.release()


def capture_status() -> Dict:
    """Non-blocking view: is a capture running, and the last result."""
    running = not _capture_lock.acquire(blocking=False)
    if not running:
        _capture_lock.release()
    return {"capturing": running, "last": dict(_last_capture) or None}


def annotate(name: str):
    """Named annotation visible in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def device_host_split(fn: Callable[[], object], iters: int = 10) -> Dict[str, float]:
    """Rough dispatch-vs-total split: dispatch time is host work, the
    remainder until readback is device queue + execution."""
    out = fn()
    _force(out)
    dispatch_ms = total_ms = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        t1 = time.perf_counter()
        _force(out)
        t2 = time.perf_counter()
        dispatch_ms += (t1 - t0) * 1e3
        total_ms += (t2 - t0) * 1e3
    return {"host_dispatch_ms": dispatch_ms / iters,
            "total_ms": total_ms / iters,
            "device_ms": (total_ms - dispatch_ms) / iters}


def _force(out) -> None:
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)

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
